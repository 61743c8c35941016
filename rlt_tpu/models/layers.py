"""Shared neural layers with torch-matching semantics, built TPU-first.

The reference composes every model from three blocks (SURVEY §2.2): a stacked
bidirectional LSTM encoder (torch cuDNN LSTM), a torch TransformerEncoder
(post-LayerNorm, ReLU FF of width 2048), and tiny Linear+Softmax/Sigmoid
towers. Here:

* the LSTM is a `jax.lax.scan` whose input projection for *all* timesteps is
  hoisted into one big MXU matmul before the scan (the per-step work is just
  the (B, H) @ (H, 4H) recurrent matmul + elementwise gates),
* attention runs through `rlt_tpu.ops.multi_head_attention` (Pallas fused
  kernel on the no-dropout path),
* initializers reproduce the torch distributions the reference trains from
  (nn.LSTM / nn.Linear kaiming-uniform bounds, MHA xavier in_proj, randn
  gates/positional encodings) because with 4 gradient steps per epoch the init
  *is* part of the training dynamics.

Weight layouts intentionally match torch (LSTM weight_ih: (4H, F) with i,f,g,o
gate order; Linear weight: (out, in)) so parity tests can copy torch state
dicts directly.
"""

from __future__ import annotations

import math
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rlt_tpu.ops.attention import multi_head_attention
from rlt_tpu.ops.lstm import fused_lstm, fused_lstm_bidir


# ---------------------------------------------------------------------------
# torch-matching initializers
# ---------------------------------------------------------------------------

def uniform_bound(bound: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def kaiming_uniform_linear(fan_in: int) -> Callable:
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    return uniform_bound(1.0 / math.sqrt(fan_in))


def xavier_uniform() -> Callable:
    def init(key, shape, dtype=jnp.float32):
        fan_out, fan_in = shape[0], shape[1]
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def randn_init() -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)
    return init


# ---------------------------------------------------------------------------
# Dropout that admits a traced rate (population training)
# ---------------------------------------------------------------------------

def dropout_keep_mask(rng, shape, keep):
    """The framework's ONE dropout bitstream: 16 random bits per unit against
    an integer threshold on the 2^-16 grid. Shared by `Dropout` and
    `ReluDropout` so the bit-generation scheme cannot silently diverge between
    them — checkpoint/population reproducibility relies on both consuming the
    identical stream for a given rng (advisor r4). `keep` may be traced
    (population training); the clamp keeps a traced rate of exactly 0
    meaningful (P(keep) = 65535/65536 — static-0 short-circuits in callers)."""
    bits = jax.random.bits(rng, shape, jnp.uint16)
    thresh = jnp.minimum(jnp.round(keep * 65536.0), 65535.0)
    return bits < thresh.astype(jnp.uint16)


class Dropout(nn.Module):
    """nn.Dropout whose rate may be overridden at call time by a TRACED
    scalar. flax's nn.Dropout python-branches on ``rate == 0.0``, which fails
    when each vmapped population member (rlt_tpu/population.py) carries its
    own dropout rate as a tracer. The class is deliberately named ``Dropout``
    so flax auto-names instances ``Dropout_N`` exactly like the nn.Dropout
    they replace (same "dropout" rng fold path).

    Mask generation is TPU-lean: 16 random bits per unit compared against an
    integer threshold, instead of `jax.random.bernoulli`'s 32 bits -> f32
    uniform -> compare. Profiling showed dropout-mask generation for the
    MMOE expert FFNs (63x300x2048 per expert per step) as the single largest
    non-matmul term of the train step (RESULTS.md "whole-model time
    breakdown"); halving the generated bits halves that HBM-bound cost. The
    keep probability is quantized to the 2^-16 grid — bernoulli itself
    quantizes to f32's 2^-23 grid, and every dropout rate in the framework
    (0.05-0.5) sits ~1e-5 from its quantized value, far below seed noise."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        r = self.rate if rate is None else rate
        if deterministic or (not isinstance(r, jax.Array) and r == 0.0):
            return x
        keep = 1.0 - r
        mask = dropout_keep_mask(self.make_rng("dropout"), x.shape, keep)
        return jax.lax.select(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# relu+dropout with an output-residual custom vjp (FFN hot path)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _relu_dropout(x, mask, keep):
    return jnp.where(mask, jax.nn.relu(x) / keep, jnp.zeros((), x.dtype))


def _relu_dropout_fwd(x, mask, keep):
    h = _relu_dropout(x, mask, keep)
    return h, (h, keep)


def _relu_dropout_bwd(res, g):
    h, keep = res
    # d/dx [relu(x)·mask/keep] = (x>0 AND kept)/keep = (h>0)/keep exactly:
    # kept positives give h = x/keep > 0, dropped or negative give h = 0.
    dx = jnp.where(h > 0, g / keep, jnp.zeros((), g.dtype))
    # keep is BY DESIGN non-differentiable here (zero cotangent): gradients
    # are only ever taken wrt params. If the traced dropout rate ever becomes
    # a differentiated hyperparameter, this must return the true -h/keep term
    # for kept units instead of zeros (advisor r4).
    return dx, np.zeros(h.shape, dtype=jax.dtypes.float0), jnp.zeros_like(keep)


_relu_dropout.defvjp(_relu_dropout_fwd, _relu_dropout_bwd)


class ReluDropout(nn.Module):
    """relu followed by Dropout (same bitstream), with a custom vjp whose only
    residual is the OUTPUT h — which XLA must keep anyway as the next
    matmul's forward operand.

    Why: the round-4 per-op roofline of the mmoecut bf16 epoch
    (scripts/roofline.py, RESULTS.md) showed XLA stashing TWO packed u8 mask
    tensors per expert-FFN activation for the backward — the (63,300,2048)
    relu sign masks and the dropout keep masks, 2.9 ms/epoch of pure
    bit-packing traffic on a 44 ms epoch. Both stashes are redundant given h:
    dx = g·(h>0)/keep reproduces autodiff's g·mask/keep·(x>0) bit-for-bit
    (kept positives have h = x/keep > 0; dropped or negative have h = 0, and
    relu' at 0 is 0 on both paths). Reference FFN site: torch
    TransformerEncoderLayer relu+dropout, used by every attention model
    (AttnCut.py:10-11, MMOECut.py:6-14, Choopy.py:12)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate=None):
        r = self.rate if rate is None else rate
        if deterministic or (not isinstance(r, jax.Array) and r == 0.0):
            return nn.relu(x)
        keep = 1.0 - r
        mask = dropout_keep_mask(self.make_rng("dropout"), x.shape, keep)
        return _relu_dropout(x, mask, keep)


# ---------------------------------------------------------------------------
# Linear with torch layout (weight: (out, in))
# ---------------------------------------------------------------------------

class TorchLinear(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        weight = self.param("weight", kaiming_uniform_linear(fan_in), (self.features, fan_in))
        y = x @ weight.T
        if self.use_bias:
            bias = self.param("bias", kaiming_uniform_linear(fan_in), (self.features,))
            y = y + bias
        return y


# ---------------------------------------------------------------------------
# LSTM (torch nn.LSTM semantics: stacked, bidirectional, batch_first)
# ---------------------------------------------------------------------------

def _default_unroll() -> int:
    """LSTM scan unroll, overridable via RLT_LSTM_UNROLL.

    Measured on the TPU (MMOECut epoch program, RESULTS.md): unroll=1 compiles
    in 72 s and streams 0.70 ms epochs; unroll=8 compiles in ~15 min for 0.88
    ms epochs — the recurrent matmuls are too small for unrolling to help, so
    1 is strictly better on both axes (and CPU compile explodes above 1)."""
    import os

    override = os.environ.get("RLT_LSTM_UNROLL")
    if not override:
        return 1
    try:
        value = int(override)
    except ValueError as e:
        raise ValueError(f"RLT_LSTM_UNROLL must be a positive int, got {override!r}") from e
    if value < 1:
        raise ValueError(f"RLT_LSTM_UNROLL must be >= 1, got {value}")
    return value


def _gate_inputs(x, w_ih, b_ih, b_hh, reverse: bool):
    """Hoisted input projection: (B, L, F) -> time-major (L, B, 4H) gate
    inputs, time-flipped for the reverse direction so the recurrence always
    runs in kernel time order."""
    xw = jnp.einsum("blf,gf->blg", x, w_ih) + b_ih + b_hh  # (B, L, 4H)
    xw = jnp.swapaxes(xw, 0, 1)  # time-major (L, B, 4H)
    return jnp.flip(xw, axis=0) if reverse else xw


def _lstm_scan(x, w_ih, w_hh, b_ih, b_hh, reverse: bool,
               unroll: int | None = None, use_pallas: bool = False):
    """Single-direction LSTM over (B, L, F) -> (B, L, H).

    The input projection for every timestep is one (B*L, F) @ (F, 4H) matmul
    hoisted out of the scan; the recurrence is either the Pallas fused kernel
    (rlt_tpu.ops.lstm — h/c/W_hh resident in VMEM for all L steps) or a
    `lax.scan` whose body is the recurrent matmul + gates. Gate order
    i, f, g, o matches torch.
    """
    batch = x.shape[0]
    hidden = w_hh.shape[1]
    xw = _gate_inputs(x, w_ih, b_ih, b_hh, reverse)

    # the fused kernel needs lane-aligned H; every model here uses H = 128
    if use_pallas and hidden % 128 == 0:
        ys = fused_lstm(xw, w_hh.T)
    else:
        w_hh_t = w_hh.T  # (H, 4H)

        def step(carry, x_t):
            h, c = carry
            gates = x_t + h @ w_hh_t
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        init = (
            jnp.zeros((batch, hidden), x.dtype),
            jnp.zeros((batch, hidden), x.dtype),
        )
        _, ys = jax.lax.scan(step, init, xw,
                             unroll=_default_unroll() if unroll is None else unroll)
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return jnp.swapaxes(ys, 0, 1)  # (B, L, H)


class LSTM(nn.Module):
    """Stacked (bi)directional LSTM matching torch nn.LSTM output semantics:
    returns the top layer's per-step hidden states, directions concatenated."""

    hidden_size: int = 128
    num_layers: int = 2
    bidirectional: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        init = uniform_bound(1.0 / math.sqrt(self.hidden_size))
        for layer in range(self.num_layers):
            in_features = x.shape[-1]
            directions = (False, True) if self.bidirectional else (False,)
            params = []
            for reverse in directions:
                suffix = f"l{layer}" + ("_reverse" if reverse else "")
                w_ih = self.param(f"weight_ih_{suffix}", init, (4 * self.hidden_size, in_features))
                w_hh = self.param(f"weight_hh_{suffix}", init, (4 * self.hidden_size, self.hidden_size))
                b_ih = self.param(f"bias_ih_{suffix}", init, (4 * self.hidden_size,))
                b_hh = self.param(f"bias_hh_{suffix}", init, (4 * self.hidden_size,))
                params.append((w_ih, w_hh, b_ih, b_hh))

            # MEASURED NEGATIVE RESULT (RESULTS.md "Fused bidirectional
            # LSTM"): sharing one kernel's serial chain across both
            # directions is ~2x SLOWER than two sequential launches at
            # robust04 shapes — per-step cost is work-proportional, not
            # latency-bound, in both layouts tried (leading direction axis
            # and direction-folded-into-sublane). Whole-model epochs regress
            # (bicut 8.7->17.0 ms). Default OFF; RLT_LSTM_FUSE_BIDIR=1
            # re-enables for measurement.
            fuse_bidir = (self.use_pallas and self.bidirectional
                          and self.hidden_size % 128 == 0
                          and os.environ.get("RLT_LSTM_FUSE_BIDIR", "0") == "1")
            if fuse_bidir:
                # one kernel launch per layer: both directions share the
                # L-step serial chain (ops/lstm.fused_lstm_bidir)
                (wf_ih, wf_hh, bf_ih, bf_hh), (wr_ih, wr_hh, br_ih, br_hh) = params
                xw_f = _gate_inputs(x, wf_ih, bf_ih, bf_hh, reverse=False)
                xw_r = _gate_inputs(x, wr_ih, br_ih, br_hh, reverse=True)
                hs_f, hs_r = fused_lstm_bidir(xw_f, xw_r, wf_hh.T, wr_hh.T)
                hs_r = jnp.flip(hs_r, axis=0)  # back to sequence time order
                x = jnp.concatenate(
                    [jnp.swapaxes(hs_f, 0, 1), jnp.swapaxes(hs_r, 0, 1)],
                    axis=-1)
            else:
                outs = [
                    _lstm_scan(x, w_ih, w_hh, b_ih, b_hh, reverse,
                               use_pallas=self.use_pallas)
                    for reverse, (w_ih, w_hh, b_ih, b_hh)
                    in zip(directions, params)
                ]
                x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        return x


# ---------------------------------------------------------------------------
# Multi-head self-attention (torch nn.MultiheadAttention semantics)
# ---------------------------------------------------------------------------

class SelfAttention(nn.Module):
    d_model: int
    n_head: int
    dropout: float = 0.0
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        d = self.d_model
        in_proj_w = self.param("in_proj_weight", xavier_uniform(), (3 * d, d))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        head_dim = d // self.n_head

        rng = None
        rate = self.dropout if dropout_rate is None else dropout_rate
        if not deterministic and (isinstance(rate, jax.Array) or rate > 0.0):
            rng = self.make_rng("dropout")
        out_w = self.param("out_proj_weight", kaiming_uniform_linear(d), (d, d))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (d,))

        from rlt_tpu.ops.attention import (PALLAS_MIN_SEQ_LEN,
                                           fused_attention_packed,
                                           packed_group_size,
                                           xla_wins_bf16_eval)

        # EVAL-ONLY measured exception: bf16 + wide heads routes the
        # deterministic forward to XLA (see xla_wins_bf16_eval docstring;
        # the training path stays on the fused kernels even at dropout=0 —
        # moecut whole-model evidence). RLT_ATTN_XLA_EVAL=0 disables for
        # controlled A/B (same convention as RLT_ATTN_PACKED): without a
        # gate, re-running the kernel A/Bs could never reconstruct the
        # pre-routing program.
        route_xla_eval = (deterministic and x.shape[1] >= PALLAS_MIN_SEQ_LEN
                          and xla_wins_bf16_eval(x.dtype, head_dim)
                          and os.environ.get("RLT_ATTN_XLA_EVAL", "1") == "1")

        pack = packed_group_size(d, self.n_head)
        if (self.use_pallas and pack is not None
                and x.shape[1] >= PALLAS_MIN_SEQ_LEN
                and not isinstance(rate, jax.Array)
                and not route_xla_eval
                # RLT_ATTN_PACKED=0 falls back to the per-slice kernel
                # (controlled A/B re-measurement, like RLT_LSTM_FUSE_BIDIR)
                and os.environ.get("RLT_ATTN_PACKED", "1") == "1"):
            # Head-packed path for thin heads (pack*dh = 128: Choopy's
            # 8 x dh=16 as one group, AttnCut/MMOECut's 4 x dh=64 as two
            # 2-head groups): torch's in_proj rows are head-major, so the RAW
            # projection output (B, L, D) is already the packed layout —
            # no head split at all, and the packed kernel runs each group's
            # scores as one full-depth matmul (dh=16 measured 1.15-1.6x over
            # the per-slice kernel at L=300, RESULTS_attention_packed.json;
            # dh=64 measured round 5, RESULTS.md "Head-packed attention").
            qp = jnp.einsum("bld,ed->ble", x, in_proj_w[:d]) + in_proj_b[:d]
            kp = (jnp.einsum("bld,ed->ble", x, in_proj_w[d:2 * d])
                  + in_proj_b[d:2 * d])
            vp = (jnp.einsum("bld,ed->ble", x, in_proj_w[2 * d:])
                  + in_proj_b[2 * d:])
            eff_rate = 0.0 if deterministic else rate
            seed = None
            if eff_rate > 0.0:
                seed = jax.random.randint(
                    rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            attn_p = fused_attention_packed(
                qp, kp, vp, heads=self.n_head, dropout_rate=eff_rate,
                seed=seed, pack=pack)
            # concat_heads is the identity in the packed layout
            return jnp.einsum("ble,de->bld", attn_p, out_w) + out_b

        # Project straight into the head-major (B, H, L, dh) layout the
        # attention op consumes: einsum folds the head split + transpose into
        # the projection matmul's OUTPUT layout. The former split+transpose
        # formulation materialized three (B, H, L, dh) relayout
        # concats/copies per call around the pallas custom call — measured
        # ~1.4 ms of the 12 ms mmoecut train step (RESULTS.md "whole-model
        # time breakdown"). torch's in_proj rows are [q; k; v], each block
        # head-major, so the (3, H, dh, D) reshape is exactly that layout.
        w3 = in_proj_w.reshape(3, self.n_head, head_dim, d)
        b3 = in_proj_b.reshape(3, 1, self.n_head, 1, head_dim)
        q = jnp.einsum("bld,hkd->bhlk", x, w3[0]) + b3[0]
        k = jnp.einsum("bld,hkd->bhlk", x, w3[1]) + b3[1]
        v = jnp.einsum("bld,hkd->bhlk", x, w3[2]) + b3[2]

        attn = multi_head_attention(
            q, k, v,
            dropout_rate=0.0 if deterministic else rate,
            dropout_rng=rng,
            # the fused kernel is trainable (custom_vjp + in-kernel dropout),
            # so it serves the training path too; the bf16 eval forward of
            # wide-head models routes to XLA (measured, route_xla_eval)
            use_pallas=self.use_pallas and not route_xla_eval,
        )
        # out = concat_heads(attn) @ out_w.T, with the head concat absorbed
        # into the contraction (torch out_proj columns are head-major)
        return jnp.einsum("bhlk,dhk->bld",
                          attn, out_w.reshape(d, self.n_head, head_dim)) + out_b


class TransformerEncoderLayer(nn.Module):
    """torch nn.TransformerEncoderLayer: post-LayerNorm, ReLU FF (width 2048)."""

    d_model: int
    n_head: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        attn = SelfAttention(
            self.d_model, self.n_head, self.dropout, self.use_pallas, name="self_attn"
        )(x, deterministic, dropout_rate)
        attn = Dropout(self.dropout, name="Dropout_0")(attn, deterministic,
                                                       dropout_rate)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn)

        h = TorchLinear(self.dim_feedforward, name="linear1")(x)
        # relu+dropout fused into one output-residual vjp; the explicit
        # "Dropout_1" name keeps the rng fold path (and therefore every
        # dropout bitstream in the zoo) identical to the pre-fusion build
        h = ReluDropout(self.dropout, name="Dropout_1")(h, deterministic,
                                                        dropout_rate)
        h = TorchLinear(self.d_model, name="linear2")(h)
        h = Dropout(self.dropout, name="Dropout_2")(h, deterministic,
                                                    dropout_rate)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + h)


class TransformerEncoder(nn.Module):
    d_model: int
    n_head: int
    num_layers: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.n_head, self.dim_feedforward, self.dropout,
                self.use_pallas, name=f"layers_{i}",
            )(x, deterministic, dropout_rate)
        return x


# ---------------------------------------------------------------------------
# Output towers (reference models/MMOECut.py:17-53 and the per-model heads)
# ---------------------------------------------------------------------------

def logit_mix() -> bool:
    """Measured default: mix MMOE experts in tower-logit space (see
    _tower_logits). Read at trace time, like the RLT_ATTN_* gates."""
    return os.environ.get("RLT_MMOE_LOGIT_MIX", "1") == "1"


def _tower_logits(x, gates):
    """Affine tower head with the MMOE gate mix folded into LOGIT space.

    With `gates` (B, E) and x carrying a leading expert axis (E, B, L, D),
    sum_e g_e (x_e W + b) == (sum_e g_e x_e) W + b exactly (the gates are
    softmax-normalized, sum_e g_e = 1), so mixing the per-expert (B, L, 1)
    logits replaces mixing (B, L, D) activations — the reference's
    broadcast-expand mix (MMOECut.py:101-102) and its backward never
    materialize. Measured: the tbe,ebld mix + its copies were ~1.5 ms of
    the 39.8 ms mmoecut bf16 epoch and ~25 ms at B=256 (RESULTS.md
    "Per-op roofline"); RLT_MMOE_LOGIT_MIX=0 restores the reference-ordered
    activation-space mix for A/B — the ONE branch point for every
    MMOE-family model (kernel shape depends only on D, so params are
    identical either way)."""
    if gates is not None and not logit_mix():
        x = jnp.einsum("be,ebld->bld", gates, x)
        gates = None
    logits = TorchLinear(1, name="linear")(x)
    if gates is not None:
        logits = jnp.einsum("be,eblo->blo", gates, logits)
    return logits


class TowerCut(nn.Module):
    """Linear -> softmax over positions: a cut distribution (B, L, 1)."""

    @nn.compact
    def __call__(self, x, gates=None):
        return jax.nn.softmax(_tower_logits(x, gates), axis=1)


class TowerClass(nn.Module):
    """Linear -> sigmoid: per-position relevance probability (B, L, 1)."""

    @nn.compact
    def __call__(self, x, gates=None):
        return jax.nn.sigmoid(_tower_logits(x, gates))


class TowerRerank(nn.Module):
    """Linear -> softmax over positions: rerank score distribution (B, L, 1)."""

    @nn.compact
    def __call__(self, x, gates=None):
        return jax.nn.softmax(_tower_logits(x, gates), axis=1)
