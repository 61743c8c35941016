"""Pallas fused LSTM recurrence for TPU (forward + backward).

Every model but Choopy runs a 2-layer BiLSTM over the ranked list (reference
models/Bicut.py:5-21, AttnCut.py:5-20, MMOECut.py:64 pre_encoding) — at
L = 300 that is 4 sequential scans of 300 tiny recurrent steps each. The
input projection for all timesteps is one big MXU matmul hoisted OUTSIDE
this kernel (rlt_tpu/models/layers.py:_lstm_scan); what remains per step is
a (B, H) @ (H, 4H) matmul plus elementwise gates. Under `lax.scan` XLA emits
a device loop whose per-iteration overhead and HBM round trips for h/c
dominate the milliseconds; here the WHOLE recurrence is one kernel with a
sequential grid over time — h, c, and W_hh stay resident in VMEM for all L
steps, and the only HBM traffic is the streamed gate inputs and outputs.

The backward is a reverse-grid kernel (cuDNN-style): the forward stores h
and c per step, the backward recomputes the gate activations from the saved
inputs (one extra matmul) and accumulates dW_hh in VMEM across the whole
sequence, writing it once.

vmap over these kernels is CORRECT: pallas batching keeps existing
`pl.program_id` axes stable when it adds the batch grid axis, verified
exactly (fwd + grad) by `tests/test_ops_lstm.py::test_vmap_matches_sequential`
— the population engine (rlt_tpu/population.py) relies on this to train K
members of every model as one vmapped program with the fused kernels on.
The rank-3 asserts below reject *explicitly batched* arrays only: callers
must vmap rather than hand the kernel a stacked axis it would misread as
batch rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_gates(gates, hidden):
    """torch nn.LSTM gate order: input, forget, cell, output."""
    i = jax.nn.sigmoid(gates[..., :hidden])
    f = jax.nn.sigmoid(gates[..., hidden:2 * hidden])
    g = jnp.tanh(gates[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[..., 3 * hidden:])
    return i, f, g, o


# Direction batching: both LSTM directions of a layer advance in the SAME
# kernel step, so the L-step serial chain is paid once per layer instead of
# once per direction. The directions are folded into the BATCH (sublane)
# axis — blocks stay rank-3 exactly like the fast single-direction kernel
# ((1, D*B, 4H) steps, D*B = 128 fills the MXU rows) — and each step's
# recurrence is a static python loop of per-direction rank-2 slice-dots
# (rows d*B:(d+1)*B against weight rows d*H:(d+1)*H; every boundary is
# sublane/lane aligned). A leading rank-4 direction axis and a batched
# rank-3 dot_general were both measured ~2x slower through Mosaic at these
# shapes (RESULTS.md "Fused bidirectional LSTM").


def _dir_dot(lhs, rhs, ndir, contract_lhs, contract_rhs):
    """Per-direction rank-2 dots on sublane slices, re-concatenated.

    lhs: (D*B, K) row-partitioned by direction; rhs: (D*H, N) likewise.
    contract_* name which axis of the SLICE is contracted (0 or 1).
    """
    if ndir == 1:
        return jax.lax.dot_general(
            lhs, rhs, (((contract_lhs,), (contract_rhs,)), ((), ())),
            preferred_element_type=jnp.float32)
    b = lhs.shape[0] // ndir
    hr = rhs.shape[0] // ndir
    outs = [
        jax.lax.dot_general(
            lhs[d * b:(d + 1) * b], rhs[d * hr:(d + 1) * hr],
            (((contract_lhs,), (contract_rhs,)), ((), ())),
            preferred_element_type=jnp.float32)
        for d in range(ndir)
    ]
    return jnp.concatenate(outs, axis=0)


def _lstm_fwd_kernel(ndir, xw_ref, whh_ref, h_out_ref, c_out_ref, h_s, c_s):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_s[...] = jnp.zeros_like(h_s)
        c_s[...] = jnp.zeros_like(c_s)

    hidden = h_s.shape[-1]
    gates = xw_ref[0] + _dir_dot(h_s[...], whh_ref[...], ndir, 1, 0)
    i, f, g, o = _split_gates(gates, hidden)
    c = f * c_s[...] + i * g
    h = o * jnp.tanh(c)
    h_s[...] = h
    c_s[...] = c
    h_out_ref[0] = h.astype(h_out_ref.dtype)
    c_out_ref[0] = c.astype(c_out_ref.dtype)


def _lstm_bwd_kernel(ndir, xw_ref, whh_ref, hprev_ref, c_ref, cprev_ref,
                     dho_ref, dxw_ref, dwhh_ref, dh_s, dc_s):
    s = pl.program_id(0)
    length = pl.num_programs(0)
    t = length - 1 - s
    hidden = dh_s.shape[-1]

    # t == 0 has no previous step: its h_prev/c_prev are the zero initial
    # state (the refs then point at block 0, masked here), and the scratch
    # carries are zero at the sequence tail (s == 0). jnp.where is selection,
    # so uninitialized scratch garbage cannot propagate.
    is_first_step = t == 0
    h_prev = jnp.where(is_first_step, 0.0, hprev_ref[0]).astype(jnp.float32)
    c_prev = jnp.where(is_first_step, 0.0, cprev_ref[0]).astype(jnp.float32)
    dh_carry = jnp.where(s == 0, 0.0, dh_s[...])
    dc_carry = jnp.where(s == 0, 0.0, dc_s[...])

    gates = xw_ref[0] + _dir_dot(h_prev, whh_ref[...], ndir, 1, 0)
    i, f, g, o = _split_gates(gates, hidden)
    c_t = c_ref[0].astype(jnp.float32)
    tanh_c = jnp.tanh(c_t)

    dh = dho_ref[0].astype(jnp.float32) + dh_carry
    do = dh * tanh_c
    dc = dc_carry + dh * o * (1.0 - tanh_c * tanh_c)
    di = dc * g
    df = dc * c_prev
    dg = dc * i
    dc_s[...] = dc * f

    dgates = jnp.concatenate([
        di * i * (1.0 - i),
        df * f * (1.0 - f),
        dg * (1.0 - g * g),
        do * o * (1.0 - o),
    ], axis=-1)  # (D*B, 4H)
    dxw_ref[0] = dgates.astype(dxw_ref.dtype)
    # dh_{t-1} = dgates @ W_hh^T : contract the 4H axis per direction
    dh_s[...] = _dir_dot(dgates, whh_ref[...], ndir, 1, 1)
    # dW_hh += h_prev^T @ dgates, accumulated in VMEM across the whole grid
    contrib = _dir_dot(h_prev, dgates, ndir, 0, 0)

    @pl.when(s == 0)
    def _first():
        dwhh_ref[...] = contrib

    @pl.when(s > 0)
    def _rest():
        dwhh_ref[...] += contrib


def _fwd_pallas(interpret, ndir, xw, w_hh_t):
    length, rows, gates4 = xw.shape  # rows = D*B
    hidden = gates4 // 4
    step_block = pl.BlockSpec((1, rows, gates4), lambda t: (t, 0, 0))
    out_block = pl.BlockSpec((1, rows, hidden), lambda t: (t, 0, 0))
    whh_block = pl.BlockSpec((ndir * hidden, gates4), lambda t: (0, 0))
    hs, cs = pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, ndir),
        grid=(length,),
        in_specs=[step_block, whh_block],
        out_specs=(out_block, out_block),
        out_shape=(
            jax.ShapeDtypeStruct((length, rows, hidden), xw.dtype),
            jax.ShapeDtypeStruct((length, rows, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, hidden), jnp.float32),
            pltpu.VMEM((rows, hidden), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * length * rows * hidden * gates4,
            bytes_accessed=4 * length * rows * (gates4 + 2 * hidden),
            transcendentals=4 * length * rows * hidden,
        ),
    )(xw, w_hh_t)
    return hs, cs


def _bwd_pallas(interpret, ndir, xw, w_hh_t, hs, cs, dho):
    length, rows, gates4 = xw.shape
    hidden = gates4 // 4
    rev = lambda s: (length - 1 - s, 0, 0)  # noqa: E731
    # previous step's block (clamped at the front; the kernel masks t == 0)
    rev_prev = lambda s: (jnp.maximum(length - 2 - s, 0), 0, 0)  # noqa: E731
    step_block = pl.BlockSpec((1, rows, gates4), rev)
    h_block = pl.BlockSpec((1, rows, hidden), rev)
    h_prev_block = pl.BlockSpec((1, rows, hidden), rev_prev)
    whh_block = pl.BlockSpec((ndir * hidden, gates4), lambda s: (0, 0))
    dxw, dwhh = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, ndir),
        grid=(length,),
        in_specs=[step_block, whh_block, h_prev_block, h_block,
                  h_prev_block, h_block],
        out_specs=(step_block, whh_block),
        out_shape=(
            jax.ShapeDtypeStruct((length, rows, gates4), xw.dtype),
            jax.ShapeDtypeStruct((ndir * hidden, gates4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, hidden), jnp.float32),
            pltpu.VMEM((rows, hidden), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * length * rows * hidden * gates4,
            bytes_accessed=4 * length * rows * (2 * gates4 + 4 * hidden),
            transcendentals=4 * length * rows * hidden,
        ),
    )(xw, w_hh_t, hs, cs, cs, dho)
    return dxw, dwhh


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_lstm(interpret, ndir, xw, w_hh_t):
    hs, _ = _fwd_pallas(interpret, ndir, xw, w_hh_t)
    return hs


def _fused_lstm_fwd(interpret, ndir, xw, w_hh_t):
    hs, cs = _fwd_pallas(interpret, ndir, xw, w_hh_t)
    return hs, (xw, w_hh_t, hs, cs)


def _fused_lstm_bwd(interpret, ndir, res, g):
    xw, w_hh_t, hs, cs = res
    dxw, dwhh = _bwd_pallas(interpret, ndir, xw, w_hh_t, hs, cs, g)
    return dxw, dwhh


_fused_lstm.defvjp(_fused_lstm_fwd, _fused_lstm_bwd)


def _run_stacked(xw: jax.Array, w_hh_t: jax.Array, interpret: bool):
    """Fold the direction axis into the batch (sublane) axis and run the
    rank-3 kernel: (L, D, B, 4H) gate inputs + (D, H, 4H) recurrent weights
    become (L, D*Bp, 4H) and (D*H, 4H) with B padded per direction to the
    TPU sublane multiple, so every direction slice boundary stays aligned."""
    length, ndir, batch, gates4 = xw.shape
    hidden = gates4 // 4
    pad = (-batch) % 8
    if pad:
        xw = jnp.pad(xw, ((0, 0), (0, 0), (0, pad), (0, 0)))
    bp = batch + pad
    xw_flat = xw.reshape(length, ndir * bp, gates4)
    whh_flat = w_hh_t.reshape(ndir * hidden, gates4)
    hs = _fused_lstm(bool(interpret), ndir, xw_flat, whh_flat)
    hs = hs.reshape(length, ndir, bp, hidden)
    return hs[:, :, :batch] if pad else hs


def fused_lstm(xw: jax.Array, w_hh_t: jax.Array,
               interpret: bool = False) -> jax.Array:
    """Run one LSTM direction as a single Pallas kernel.

    xw: (L, B, 4H) time-major pre-projected gate inputs (x @ W_ih^T + biases);
    w_hh_t: (H, 4H) recurrent weights, already transposed. Returns the hidden
    states (L, B, H). Differentiable via a reverse-grid backward kernel.

    The batch axis is padded to a multiple of 8 (TPU sublane tiling) and the
    pad rows sliced off afterwards; H and 4H must be lane-aligned already
    (H = 128 everywhere in this framework).
    """
    if xw.ndim != 3:
        raise ValueError(
            f"fused_lstm expects unbatched (L, B, 4H) input, got {xw.shape}; "
            "vmap the call instead of stacking an axis (module docstring)")
    hs = _run_stacked(xw[:, None], w_hh_t[None], interpret)
    return hs[:, 0]


def fused_lstm_bidir(xw_fwd: jax.Array, xw_rev: jax.Array,
                     w_hh_fwd_t: jax.Array, w_hh_rev_t: jax.Array,
                     interpret: bool = False):
    """Both directions of a BiLSTM layer in ONE kernel launch.

    The two directions are data-independent, but run as two sequential Pallas
    programs they pay the L-step serial chain twice per layer — and RESULTS.md's
    speed-of-light analysis shows that chain latency, not matmul throughput,
    is what binds the LSTM. Folding them into the batch axis makes each kernel
    step a pair of full-width slice-dots sharing one serial chain, so the
    chain is paid once (reference BiLSTM sites: Bicut.py:9, AttnCut.py:9,
    MMOECut.py:60).

    xw_fwd / xw_rev: (L, B, 4H) gate inputs per direction, BOTH in kernel
    time order (the caller flips the reverse direction's inputs before and
    its outputs after, exactly as for `fused_lstm`). Returns (hs_fwd, hs_rev),
    each (L, B, H), with hs_rev still in flipped time order.
    """
    if xw_fwd.ndim != 3:
        raise ValueError(
            f"fused_lstm_bidir expects unbatched (L, B, 4H) inputs, got "
            f"{xw_fwd.shape}; vmap the call instead of stacking an axis "
            "(module docstring)")
    xw = jnp.stack([xw_fwd, xw_rev], axis=1)        # (L, 2, B, 4H)
    whh = jnp.stack([w_hh_fwd_t, w_hh_rev_t])       # (2, H, 4H)
    hs = _run_stacked(xw, whh, interpret)           # (L, 2, B, H)
    return hs[:, 0], hs[:, 1]
