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

NOTE: these kernels use `pl.program_id` as the time index, so they must not
be `vmap`-ed (pallas auto-batching prepends a grid axis, which would silently
re-bind program_id(0) to the batch axis). The LSTM is shared (pre-vmap) in
every model — the vmapped MMOE experts are attention-only (models/mmoe.py) —
and `fused_lstm` asserts rank-3 input to keep it that way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_gates(gates, hidden):
    """torch nn.LSTM gate order: input, forget, cell, output."""
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    return i, f, g, o


def _lstm_fwd_kernel(xw_ref, whh_ref, h_out_ref, c_out_ref, h_s, c_s):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_s[...] = jnp.zeros_like(h_s)
        c_s[...] = jnp.zeros_like(c_s)

    hidden = h_s.shape[-1]
    gates = xw_ref[0] + jnp.dot(h_s[...], whh_ref[...],
                                preferred_element_type=jnp.float32)
    i, f, g, o = _split_gates(gates, hidden)
    c = f * c_s[...] + i * g
    h = o * jnp.tanh(c)
    h_s[...] = h
    c_s[...] = c
    h_out_ref[0] = h.astype(h_out_ref.dtype)
    c_out_ref[0] = c.astype(c_out_ref.dtype)


def _lstm_bwd_kernel(xw_ref, whh_ref, hprev_ref, c_ref, cprev_ref, dho_ref,
                     dxw_ref, dwhh_ref, dh_s, dc_s):
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

    gates = xw_ref[0] + jnp.dot(h_prev, whh_ref[...],
                                preferred_element_type=jnp.float32)
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
    ], axis=-1)  # (B, 4H)
    dxw_ref[0] = dgates.astype(dxw_ref.dtype)
    # dh_{t-1} = dgates @ W_hh^T : contract the 4H axis
    dh_s[...] = jax.lax.dot_general(
        dgates, whh_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dW_hh += h_prev^T @ dgates, accumulated in VMEM across the whole grid
    contrib = jax.lax.dot_general(
        h_prev, dgates, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(s == 0)
    def _first():
        dwhh_ref[...] = contrib

    @pl.when(s > 0)
    def _rest():
        dwhh_ref[...] += contrib


def _fwd_pallas(interpret, xw, w_hh_t):
    length, batch, gates4 = xw.shape
    hidden = gates4 // 4
    step_block = pl.BlockSpec((1, batch, gates4), lambda t: (t, 0, 0))
    out_block = pl.BlockSpec((1, batch, hidden), lambda t: (t, 0, 0))
    whh_block = pl.BlockSpec((hidden, gates4), lambda t: (0, 0))
    hs, cs = pl.pallas_call(
        _lstm_fwd_kernel,
        grid=(length,),
        in_specs=[step_block, whh_block],
        out_specs=(out_block, out_block),
        out_shape=(
            jax.ShapeDtypeStruct((length, batch, hidden), xw.dtype),
            jax.ShapeDtypeStruct((length, batch, hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * length * batch * hidden * gates4,
            bytes_accessed=4 * length * batch * (gates4 + 2 * hidden),
            transcendentals=4 * length * batch * hidden,
        ),
    )(xw, w_hh_t)
    return hs, cs


def _bwd_pallas(interpret, xw, w_hh_t, hs, cs, dho):
    length, batch, gates4 = xw.shape
    hidden = gates4 // 4
    rev = lambda s: (length - 1 - s, 0, 0)  # noqa: E731
    # previous step's block (clamped at the front; the kernel masks t == 0)
    rev_prev = lambda s: (jnp.maximum(length - 2 - s, 0), 0, 0)  # noqa: E731
    step_block = pl.BlockSpec((1, batch, gates4), rev)
    h_block = pl.BlockSpec((1, batch, hidden), rev)
    h_prev_block = pl.BlockSpec((1, batch, hidden), rev_prev)
    whh_block = pl.BlockSpec((hidden, gates4), lambda s: (0, 0))
    dxw, dwhh = pl.pallas_call(
        _lstm_bwd_kernel,
        grid=(length,),
        in_specs=[step_block, whh_block, h_prev_block, h_block,
                  h_prev_block, h_block],
        out_specs=(step_block, whh_block),
        out_shape=(
            jax.ShapeDtypeStruct((length, batch, gates4), xw.dtype),
            jax.ShapeDtypeStruct((hidden, gates4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch, hidden), jnp.float32),
            pltpu.VMEM((batch, hidden), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * length * batch * hidden * gates4,
            bytes_accessed=4 * length * batch * (2 * gates4 + 4 * hidden),
            transcendentals=4 * length * batch * hidden,
        ),
    )(xw, w_hh_t, hs, cs, cs, dho)
    return dxw, dwhh


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_lstm(interpret, xw, w_hh_t):
    hs, _ = _fwd_pallas(interpret, xw, w_hh_t)
    return hs


def _fused_lstm_fwd(interpret, xw, w_hh_t):
    hs, cs = _fwd_pallas(interpret, xw, w_hh_t)
    return hs, (xw, w_hh_t, hs, cs)


def _fused_lstm_bwd(interpret, res, g):
    xw, w_hh_t, hs, cs = res
    dxw, dwhh = _bwd_pallas(interpret, xw, w_hh_t, hs, cs, g)
    return dxw, dwhh


_fused_lstm.defvjp(_fused_lstm_fwd, _fused_lstm_bwd)


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
            "do not vmap this op (see module docstring)")
    batch = xw.shape[1]
    pad = (-batch) % 8
    if pad:
        xw = jnp.pad(xw, ((0, 0), (0, pad), (0, 0)))
    hs = _fused_lstm(bool(interpret), xw, w_hh_t)
    return hs[:, :batch] if pad else hs
