"""Attention ops: Pallas fused-attention TPU kernels (fwd + bwd) plus an XLA path.

Every model family in the reference runs self-attention over ranked lists
(Choopy models/Choopy.py:12, AttnCut models/AttnCut.py:10-11, the MMOE experts
models/MMOECut.py:6-14). Sequence lengths are small (L = 300 or 40), so the
whole (L, L) score matrix of one (batch, head) slice fits in VMEM; the win is
bandwidth, not FLOPs: XLA materializes the (B, H, L, L) probability tensor to
HBM between the QK^T and PV matmuls (and again in the backward), while the
fused kernels keep it on-chip — the only HBM traffic is Q/K/V/O (+ dO, LSE in
the backward).

The kernel is trainable: `fused_attention` carries a flash-style custom_vjp
(store O and the log-sum-exp rows, recompute the probabilities in the backward
kernel) and optional in-kernel dropout on the softmax weights. Dropout bits
come from a counter-based murmur3-finalizer hash — pure integer jnp ops, so
the identical mask is regenerated in the backward kernel (no (L, L) mask in
HBM) and the same code runs under `interpret=True` on CPU for tests, where the
TPU PRNG primitives don't exist.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# bf16 inputs keep their dtype INTO the MXU matmuls (f32 accumulation via
# preferred_element_type) instead of being cast to f32 first — bf16 operands
# run the MXU at twice the f32 rate, which is the native mode for the bf16
# production lane (VERDICT r4: the unconditional f32 casts forfeited it).
# The softmax/LSE statistics stay f32 either way; the only numeric change in
# the bf16 lane is the flash-standard bf16 rounding of the probability matrix
# before the PV/dV matmuls. f32 inputs are bit-identical to the round-3
# kernels (the casts below are no-ops). RLT_ATTN_BF16=0 restores the f32
# internal math for A/B re-measurement (read at trace time, like
# RLT_ATTN_PACKED in models/layers.py).


def _mxu(x):
    """Operand dtype policy for kernel-internal matmuls: bf16 stays bf16
    (full MXU rate, exact products under f32 accumulation), everything else
    computes in f32."""
    if (x.dtype == jnp.bfloat16
            and os.environ.get("RLT_ATTN_BF16", "1") == "1"):
        return x
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Counter-based dropout mask (identical bits in fwd and bwd, portable)
# ---------------------------------------------------------------------------

def keep_mask(stream, shape, dropout_rate: float):
    """Boolean keep-mask for one (batch*head) program.

    murmur3 finalizer over (element index ^ stream key): 2 multiplies + 3
    xor-shifts per element on the VPU, full avalanche. `stream` is a traced
    int32 scalar unique per (call site, batch, head) slice — the wrapper
    derives it as seed + slice index, and under nn.vmap'ed experts the seed
    itself is per-expert (split dropout rngs), keeping masks independent.
    Exposed at module level so tests reconstruct the exact mask outside the
    kernel. Deliberately free of pl.program_id: the kernel body stays
    grid-shape-agnostic, so the pallas vmap batching rule (which prepends a
    grid dimension) cannot skew the streams."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = rows * jnp.uint32(shape[1]) + cols
    x = x ^ (stream.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    threshold = jnp.uint32(min(int((1.0 - dropout_rate) * 2**32), 2**32 - 1))
    return x < threshold


# ---------------------------------------------------------------------------
# Kernels: one program per (batch*head) slice, everything in VMEM
# ---------------------------------------------------------------------------

def _attn_fwd_kernel(stream_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                     scale: float, dropout_rate: float):
    # Each program handles G (batch*head) slices (G = leading block dim):
    # grouping amortizes the per-program dispatch/DMA-pipeline overhead that
    # dominates at small (L, dh) — the per-slice math is unchanged, and each
    # slice keeps its own dropout stream, so masks are grouping-invariant.
    for g in range(q_ref.shape[0]):
        q = _mxu(q_ref[g])  # (L, dh); bf16 stays bf16 (native MXU rate)
        k = _mxu(k_ref[g])
        v = _mxu(v_ref[g])
        # q @ k^T without materializing the transpose (NT matmul on the MXU);
        # accumulation is f32 regardless of operand dtype
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (L, L) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        p = e / denom
        if dropout_rate > 0.0:
            keep = keep_mask(stream_ref[g, 0, 0], s.shape, dropout_rate)
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        # flash-standard: probabilities ride the MXU in the operand dtype
        o_ref[g] = jnp.dot(p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)
        lse_ref[g, 0] = (m + jnp.log(denom))[:, 0]


def _attn_bwd_kernel(stream_ref, q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float, dropout_rate: float):
    """Flash-style backward: recompute p from (q, k, lse); the softmax
    jacobian contraction uses delta = rowsum(do * o), which absorbs the
    dropout mask exactly (delta = sum_j p_j * dp_j for the dropped p too).
    Like the forward, one program covers G slices (leading block dim)."""
    for g in range(q_ref.shape[0]):
        q = _mxu(q_ref[g])
        k = _mxu(k_ref[g])
        v = _mxu(v_ref[g])
        do = _mxu(do_ref[g])
        lse = lse_ref[g, 0]  # (L,) f32

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse[:, None])  # pre-dropout softmax probs, f32
        dpd = jax.lax.dot_general(  # do @ v^T: grad wrt (post-dropout) probs
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if dropout_rate > 0.0:
            keep = keep_mask(stream_ref[g, 0, 0], s.shape, dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p * inv, 0.0)   # the probs the fwd actually used
            dp = jnp.where(keep, dpd * inv, 0.0)  # chain rule through the mask
        else:
            pd, dp = p, dpd
        # delta in f32 on the VPU (elementwise; no MXU rate at stake)
        delta = jnp.sum(do_ref[g].astype(jnp.float32)
                        * o_ref[g].astype(jnp.float32),
                        axis=-1, keepdims=True)  # (L, 1)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq_ref[g] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[g] = jax.lax.dot_general(  # ds^T @ q
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)
        dv_ref[g] = jax.lax.dot_general(  # pd^T @ do
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)


def _flat_specs(seq_len: int, head_dim: int, group: int):
    # Per-slice dropout stream seeds ride as an (n, 1, 1) VMEM operand indexed
    # exactly like Q/K/V — NOT as an SMEM scalar: the pallas vmap batching
    # rule (MMOECut's experts vmap this op) broadcasts operands and prepends a
    # grid dim, which breaks a whole-array SMEM spec but composes fine with a
    # leading grid-indexed dim. Only the last two block dims face the TPU
    # 8/128-or-equal tiling rule, and (1, 1) == the array's trailing dims.
    # The leading block dim is the per-program slice group G (free of tiling
    # constraints).
    stream_spec = pl.BlockSpec((group, 1, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((group, seq_len, head_dim), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    # LSE rides as (n, 1, L) for the same tiling reason: its trailing (1, L)
    # block equals the array dims, whereas a (1, L) row of (n, L) would not.
    vec = pl.BlockSpec((group, 1, seq_len), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    return stream_spec, mat, vec


# VMEM budget for the live (L, L) f32 intermediates of one program; the
# per-core VMEM is ~16 MB and Q/K/V/O blocks + pipeline double-buffering need
# their share. Live (L, L) tensors per slice: ~3 in the forward (s/e, p,
# keep), ~5 in the backward (p, dpd, pd/dp, ds, keep).
_GROUP_VMEM_BUDGET = 8 * 2**20


def _pick_group(n: int, seq_len: int, live_mats: int) -> int:
    """Largest G in {8, 4, 2, 1} dividing n whose live score tiles fit VMEM.

    Grouping G slices per program amortizes per-program dispatch overhead,
    which at these shapes (L<=384, dh<=64) is comparable to the per-slice
    math itself (RESULTS.md 'Kernel' — ~0.7-0.9 us/program fixed cost)."""
    per_slice = seq_len * seq_len * 4 * live_mats
    for g in (8, 4, 2):
        if n % g == 0 and g * per_slice <= _GROUP_VMEM_BUDGET:
            return g
    return 1


def _streams(seed, n: int):
    """Per-(batch*head)-slice stream seeds: seed + slice index, shaped for
    the (n, 1, 1) VMEM operand."""
    s = jnp.asarray(seed, jnp.int32).reshape(()) + jnp.arange(n, dtype=jnp.int32)
    return s.reshape(n, 1, 1)


def _fwd_pallas(dropout_rate, interpret, q, k, v, seed):
    batch, heads, seq_len, head_dim = q.shape
    scale = 1.0 / math.sqrt(head_dim)
    n = batch * heads
    flat = (n, seq_len, head_dim)
    group = _pick_group(n, seq_len, live_mats=3)
    stream_spec, mat, vec = _flat_specs(seq_len, head_dim, group)
    o, lse = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, dropout_rate=dropout_rate),
        grid=(n // group,),
        in_specs=[stream_spec, mat, mat, mat],
        out_specs=(mat, vec),
        out_shape=(
            jax.ShapeDtypeStruct(flat, q.dtype),
            jax.ShapeDtypeStruct((n, 1, seq_len), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * seq_len * seq_len * head_dim,
            bytes_accessed=4 * n * seq_len * head_dim * 4,
            transcendentals=n * seq_len * seq_len,
        ),
    )(_streams(seed, n), q.reshape(flat), k.reshape(flat), v.reshape(flat))
    return o.reshape(q.shape), lse


def _bwd_pallas(dropout_rate, interpret, q, k, v, o, lse, do, seed):
    batch, heads, seq_len, head_dim = q.shape
    scale = 1.0 / math.sqrt(head_dim)
    n = batch * heads
    flat = (n, seq_len, head_dim)
    group = _pick_group(n, seq_len, live_mats=5)
    stream_spec, mat, vec = _flat_specs(seq_len, head_dim, group)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, dropout_rate=dropout_rate),
        grid=(n // group,),
        in_specs=[stream_spec, mat, mat, mat, mat, mat, vec],
        out_specs=(mat, mat, mat),
        out_shape=(
            jax.ShapeDtypeStruct(flat, q.dtype),
            jax.ShapeDtypeStruct(flat, k.dtype),
            jax.ShapeDtypeStruct(flat, v.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * n * seq_len * seq_len * head_dim,
            bytes_accessed=9 * n * seq_len * head_dim * 4,
            transcendentals=n * seq_len * seq_len,
        ),
    )(_streams(seed, n), q.reshape(flat), k.reshape(flat), v.reshape(flat),
      o.reshape(flat), do.reshape(flat), lse)
    return dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_attention(dropout_rate, interpret, q, k, v, seed):
    o, _ = _fwd_pallas(dropout_rate, interpret, q, k, v, seed)
    return o


def _fused_attention_fwd(dropout_rate, interpret, q, k, v, seed):
    o, lse = _fwd_pallas(dropout_rate, interpret, q, k, v, seed)
    return o, (q, k, v, o, lse, seed)


def _fused_attention_bwd(dropout_rate, interpret, res, g):
    q, k, v, o, lse, seed = res
    dq, dk, dv = _bwd_pallas(dropout_rate, interpret, q, k, v, o, lse, g, seed)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    dropout_rate: float = 0.0,
    seed: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas fused attention. q, k, v: (B, H, L, dh) -> (B, H, L, dh).

    Differentiable (flash-style custom_vjp, probabilities recomputed in the
    backward kernel). With dropout_rate > 0, `seed` (int32 scalar array)
    drives in-kernel dropout on the softmax weights — the mask never touches
    HBM. Grid is one program per GROUP of (batch, head) slices (G in
    {8,4,2,1} chosen by `_pick_group` to amortize per-program dispatch
    overhead within the VMEM budget); each program holds its G (L, dh)
    Q/K/V blocks and (L, L) score tiles in VMEM (L <= 384). Dropout masks
    are per-slice and grouping-invariant.
    """
    if dropout_rate > 0.0 and seed is None:
        raise ValueError("fused_attention: dropout_rate > 0 requires a seed")
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    return _fused_attention(float(dropout_rate), bool(interpret), q, k, v, seed)


# ---------------------------------------------------------------------------
# Head-packed variant for thin heads. One program per batch element; the H
# heads are processed in GROUPS of `pack` heads whose pack*dh feature columns
# form one 128-lane contraction depth (e.g. Choopy's 8 x dh=16 as one group
# of 8 — models/Choopy.py:12 — or AttnCut/MMOECut's 4 x dh=64 as two groups
# of 2 — models/AttnCut.py:10, MMOECut.py:6-14). Within a group, all pack
# heads' scores come from ONE full-depth matmul Q_g(L,gd) @ Kbig_g(pack*L,gd)^T
# where Kbig_g is the head-block-structured expansion (row block h carries
# K's feature block h, zeros elsewhere), and the PV product is the
# mirror-image P(L,pack*L) @ Vbig_g(pack*L,gd). Trades pack x the MAC count
# (the zero blocks are real work to the MXU) for full 128-deep contractions
# instead of 2H depth-dh matmuls per slice — measured either way (VERDICT r3
# ask #4 for dh=16; VERDICT r4 ask #2b for dh=64).
# ---------------------------------------------------------------------------

def _packed_consts(pack: int, seq_len: int, gd: int):
    """Kernel-internal indicator matrices for one head-group of the packed
    layout (all built from iotas — no HBM operands); gd = pack * dh:
    * mask (pack*L, gd): row block h nonzero only in feature cols [h*dh,(h+1)dh)
    * seg (pack*L, pack) / seg_t (pack, pack*L): score-column -> head indicators
    * fold (L, pack*L): fold[j, r] = (r mod L == j), collapses the pack row
      blocks of a (pack*L, gd) gradient back onto (L, gd) by matmul."""
    dh = gd // pack
    rows = jax.lax.broadcasted_iota(jnp.int32, (pack * seq_len, gd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (pack * seq_len, gd), 1)
    mask = ((rows // seq_len) == (cols // dh)).astype(jnp.float32)
    seg = (jax.lax.broadcasted_iota(
        jnp.int32, (pack * seq_len, pack), 0) // seq_len
        == jax.lax.broadcasted_iota(
            jnp.int32, (pack * seq_len, pack), 1)).astype(jnp.float32)
    seg_t = (jax.lax.broadcasted_iota(
        jnp.int32, (pack, pack * seq_len), 0)
        == jax.lax.broadcasted_iota(
            jnp.int32, (pack, pack * seq_len), 1) // seq_len
    ).astype(jnp.float32)
    fold = (jax.lax.broadcasted_iota(
        jnp.int32, (seq_len, pack * seq_len), 1) % seq_len
        == jax.lax.broadcasted_iota(
            jnp.int32, (seq_len, pack * seq_len), 0)).astype(jnp.float32)
    return mask, seg, seg_t, fold


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _group_stream(stream, gi: int):
    """Independent dropout stream per head-group: group 0 keeps the slice
    stream verbatim (bit-compatible with the round-4 single-group kernel);
    later groups decorrelate via a fixed odd-constant offset (wrapped to
    int32 range — gi >= 2 would otherwise overflow the int32 literal at
    trace time under NumPy 2.x)."""
    if gi == 0:
        return stream
    return stream + jnp.int32((gi * 0x7F4A7C15) & 0x7FFFFFFF)


def _attn_fwd_packed_kernel(stream_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                            *, scale: float, heads: int, pack: int,
                            dropout_rate: float):
    g_dim, seq_len, d = q_ref.shape
    groups = heads // pack
    gd = d // groups
    mask_f32, seg, seg_t, _ = _packed_consts(pack, seq_len, gd)
    for g in range(g_dim):
        qfull = _mxu(q_ref[g])  # (L, D) head-packed; bf16 stays bf16
        kfull = _mxu(k_ref[g])
        vfull = _mxu(v_ref[g])
        mask = mask_f32.astype(qfull.dtype)
        outs, lses = [], []
        for gi in range(groups):
            cols = slice(gi * gd, (gi + 1) * gd)
            q, k, v = qfull[:, cols], kfull[:, cols], vfull[:, cols]
            kbig = jnp.tile(k, (pack, 1)) * mask  # (pack*L, gd)
            vbig = jnp.tile(v, (pack, 1)) * mask
            s = jax.lax.dot_general(  # (L, pack*L), one full-depth contraction
                q, kbig, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            # segment softmax without a (L, pack, L) reshape (Mosaic cannot
            # split the lane dim when L is not a multiple of 128): subtract
            # the GLOBAL row max (a superset of each head's max — equally
            # stabilizing, and it cancels in the ratio), then build each
            # head's denominator with the segment-indicator matmul pair
            # e @ seg @ seg_t
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            sums = _mm(e, seg)  # (L, pack) per-head denominators
            p = e / _mm(sums, seg_t)
            if dropout_rate > 0.0:
                keep = keep_mask(_group_stream(stream_ref[g, 0, 0], gi),
                                 s.shape, dropout_rate)
                p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
            outs.append(_mm(p.astype(vbig.dtype), vbig))
            lses.append(m + jnp.log(sums))  # (L, pack)
        o_ref[g] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype) \
            if groups > 1 else outs[0].astype(o_ref.dtype)
        lse_ref[g] = jnp.stack(lses).astype(jnp.float32)  # (groups, L, pack)


def _attn_bwd_packed_kernel(stream_ref, q_ref, k_ref, v_ref, o_ref, do_ref,
                            lse_ref, dq_ref, dk_ref, dv_ref, *, scale: float,
                            heads: int, pack: int, dropout_rate: float):
    """Packed flash-style backward: recompute p from (q, kbig, lse); the
    per-head delta = rowsum_h(do * o) comes from the feature-segment matmul
    and absorbs the dropout mask exactly (as in _attn_bwd_kernel). dk/dv
    row-block gradients fold back onto (L, gd) with the `fold` indicator
    matmul; the block mask zeroes the cross-head terms first."""
    g_dim, seq_len, d = q_ref.shape
    groups = heads // pack
    gd = d // groups
    dh = gd // pack
    mask_f32, seg, seg_t, fold = _packed_consts(pack, seq_len, gd)
    featseg = (jax.lax.broadcasted_iota(jnp.int32, (gd, pack), 0) // dh
               == jax.lax.broadcasted_iota(jnp.int32, (gd, pack), 1)
               ).astype(jnp.float32)
    for g in range(g_dim):
        qfull = _mxu(q_ref[g])
        kfull = _mxu(k_ref[g])
        vfull = _mxu(v_ref[g])
        dofull = _mxu(do_ref[g])
        ofull_f32 = o_ref[g].astype(jnp.float32)
        dofull_f32 = do_ref[g].astype(jnp.float32)
        mask = mask_f32.astype(qfull.dtype)
        dqs, dks, dvs = [], [], []
        for gi in range(groups):
            cols = slice(gi * gd, (gi + 1) * gd)
            q, k, v, do = (qfull[:, cols], kfull[:, cols], vfull[:, cols],
                           dofull[:, cols])
            lse = lse_ref[g, gi]  # (L, pack) f32
            kbig = jnp.tile(k, (pack, 1)) * mask
            vbig = jnp.tile(v, (pack, 1)) * mask
            s = jax.lax.dot_general(
                q, kbig, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            p = jnp.exp(s - _mm(lse, seg_t))  # pre-dropout probs (L, pack*L)
            dpd = jax.lax.dot_general(  # do @ vbig^T: (L, pack*L), full depth
                do, vbig, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if dropout_rate > 0.0:
                keep = keep_mask(_group_stream(stream_ref[g, 0, 0], gi),
                                 s.shape, dropout_rate)
                inv = 1.0 / (1.0 - dropout_rate)
                pd = jnp.where(keep, p * inv, 0.0)
                dp = jnp.where(keep, dpd * inv, 0.0)
            else:
                pd, dp = p, dpd
            # (L, pack) per-head rowsum(do*o), f32 on the VPU
            delta = _mm(dofull_f32[:, cols] * ofull_f32[:, cols], featseg)
            ds = (p * (dp - _mm(delta, seg_t)) * scale).astype(q.dtype)
            dqs.append(_mm(ds, kbig))
            dk_full = jax.lax.dot_general(  # ds^T @ q -> (pack*L, gd) blocks
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dks.append(_mm(fold.astype(q.dtype),
                           (dk_full * mask_f32).astype(q.dtype)))
            dv_full = jax.lax.dot_general(  # pd^T @ do
                pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dvs.append(_mm(fold.astype(q.dtype),
                           (dv_full * mask_f32).astype(q.dtype)))
        cat = (lambda xs: jnp.concatenate(xs, axis=-1)) if groups > 1 \
            else (lambda xs: xs[0])
        dq_ref[g] = cat(dqs).astype(dq_ref.dtype)
        dk_ref[g] = cat(dks).astype(dk_ref.dtype)
        dv_ref[g] = cat(dvs).astype(dv_ref.dtype)


def _packed_specs(seq_len: int, d: int, heads: int, pack: int):
    groups = heads // pack
    stream_spec = pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((1, seq_len, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    lse = pl.BlockSpec((1, groups, seq_len, pack), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return stream_spec, mat, lse


def _fwd_packed(dropout_rate, interpret, heads, pack, q, k, v, seed):
    batch, seq_len, d = q.shape
    groups = heads // pack
    scale = 1.0 / math.sqrt(d // heads)
    stream_spec, mat, lse_spec = _packed_specs(seq_len, d, heads, pack)
    o, lse = pl.pallas_call(
        functools.partial(_attn_fwd_packed_kernel, scale=scale, heads=heads,
                          pack=pack, dropout_rate=dropout_rate),
        grid=(batch,),
        in_specs=[stream_spec, mat, mat, mat],
        out_specs=(mat, lse_spec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((batch, groups, seq_len, pack), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * batch * seq_len * seq_len * pack * d,
            bytes_accessed=4 * batch * seq_len * d * 4,
            transcendentals=batch * heads * seq_len * seq_len,
        ),
    )(_streams(seed, batch), q, k, v)
    return o, lse


def _bwd_packed(dropout_rate, interpret, heads, pack, q, k, v, o, lse, do,
                seed):
    batch, seq_len, d = q.shape
    scale = 1.0 / math.sqrt(d // heads)
    stream_spec, mat, lse_spec = _packed_specs(seq_len, d, heads, pack)
    return pl.pallas_call(
        functools.partial(_attn_bwd_packed_kernel, scale=scale, heads=heads,
                          pack=pack, dropout_rate=dropout_rate),
        grid=(batch,),
        in_specs=[stream_spec, mat, mat, mat, mat, mat, lse_spec],
        out_specs=(mat, mat, mat),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * batch * seq_len * seq_len * pack * d,
            bytes_accessed=9 * batch * seq_len * d * 4,
            transcendentals=batch * heads * seq_len * seq_len,
        ),
    )(_streams(seed, batch), q, k, v, o, do, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_attention_packed(dropout_rate, interpret, heads, pack, q, k, v,
                            seed):
    o, _ = _fwd_packed(dropout_rate, interpret, heads, pack, q, k, v, seed)
    return o


def _fused_attention_packed_fwd(dropout_rate, interpret, heads, pack, q, k, v,
                                seed):
    o, lse = _fwd_packed(dropout_rate, interpret, heads, pack, q, k, v, seed)
    return o, (q, k, v, o, lse, seed)


def _fused_attention_packed_bwd(dropout_rate, interpret, heads, pack, res, g):
    q, k, v, o, lse, seed = res
    dq, dk, dv = _bwd_packed(dropout_rate, interpret, heads, pack, q, k, v, o,
                             lse, g, seed)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dseed


_fused_attention_packed.defvjp(_fused_attention_packed_fwd,
                               _fused_attention_packed_bwd)


def packed_group_size(d: int, heads: int) -> int | None:
    """heads-per-group `pack` that makes each packed contraction exactly 128
    lanes deep (pack * dh == 128), or None when the shape doesn't admit one.
    dh >= 128 heads are already full-depth — the per-slice kernel handles
    them without the pack-x MAC overhead."""
    if d % heads:
        return None
    dh = d // heads
    if dh >= 128 or 128 % dh:
        return None
    pack = 128 // dh
    if heads % pack or d % (heads // pack):
        return None
    return pack


def fused_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                           heads: int, dropout_rate: float = 0.0,
                           seed: jax.Array | None = None,
                           interpret: bool = False,
                           pack: int | None = None) -> jax.Array:
    """Head-packed fused attention. q, k, v: (B, L, D) with the H heads
    CONTIGUOUS in the feature dim (D = H*dh — the projection output's
    natural torch in_proj layout, no head split) -> (B, L, D).

    Differentiable (flash-style custom_vjp; per-(batch, head-group)
    in-kernel dropout streams regenerated in the backward). `pack` heads
    share one group (default: all of them); pack*dh should be 128 for
    full-depth contractions (`packed_group_size`). Measured 1.15-1.6x over
    the per-slice fused kernel at Choopy's (63, 8, 300, 16) despite pack x
    the MACs — the depth-16 matmuls were overhead-bound, the zero-padded
    full-depth contractions are not (RESULTS_attention_packed.json)."""
    if dropout_rate > 0.0 and seed is None:
        raise ValueError("fused_attention_packed: dropout needs a seed")
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    batch, seq_len, d = q.shape
    if d % heads:
        raise ValueError(f"feature dim {d} not divisible by heads={heads}")
    if pack is None:
        pack = heads
    if heads % pack:
        raise ValueError(f"heads={heads} not divisible by pack={pack}")
    if d % (heads // pack):
        raise ValueError(
            f"feature dim {d} not divisible by {heads // pack} head groups")
    return _fused_attention_packed(float(dropout_rate), bool(interpret),
                                   int(heads), int(pack), q, k, v, seed)


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Plain XLA attention with optional dropout on the softmax weights
    (torch.nn.MultiheadAttention applies dropout there)."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(head_dim)
    probs = jax.nn.softmax(scores, axis=-1)
    # dropout_rate may be a TRACED scalar (vmapped population training) —
    # bernoulli with a traced p produces the same bits as the static rate
    if dropout_rng is not None and (
        isinstance(dropout_rate, jax.Array) or dropout_rate > 0.0
    ):
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# Measured crossover on TPU v5 lite (scripts/bench_attention.py,
# RESULTS_attention.json, 400 chained on-device iterations): at L=300 the
# fused kernels win the training path (fwd+bwd with dropout 1.4-1.5x, dropout
# fwd 2.2-2.6x, eval fwd ~1.6x) because XLA round-trips the (B,H,L,L) probs
# through HBM; at L=40 XLA wins by >5x — the per-(batch*head) grid overhead
# (~500 programs of ~0.7us) exceeds the entire computation, which XLA runs at
# near-peak MXU. Route by sequence length.
PALLAS_MIN_SEQ_LEN = 128


def xla_wins_bf16_eval(dtype, head_dim: int) -> bool:
    """Measured routing exception (round 5, RESULTS_attention_r5_bf16.json):
    in bf16 at EVAL (deterministic forward) with dh >= 64, XLA's batched
    attention beats both fused kernels (attncut/MMOE-expert shape
    (63,4,300,64): fwd 0.100 vs 0.202/0.207 ms) — the (B,H,L,L) probs
    round-trip HBM at half the bytes while the custom kernels stay
    issue-bound. The decision is EVAL-ONLY on whole-model evidence
    (RESULTS.md "Grouped head packing + kernel dtype"): routing the no-dropout
    TRAINING path to XLA (moecut bf16, preset dropout=0) REGRESSES the epoch
    34.3 -> 37-40 ms despite the isolated-op fwd+bwd win (0.233 vs 0.561) —
    inside the real program the materialized probs compete for HBM with the
    expert FFNs. Thin dh=16 heads keep preferring the packed kernel even at
    eval (0.382 vs 0.496); f32 prefers the fused kernels everywhere at
    L >= 128 (RESULTS_attention_r5.json)."""
    return dtype == jnp.bfloat16 and head_dim >= 64


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Dispatch: the fused Pallas kernels on TPU (training included — dropout
    runs in-kernel from a seed folded out of the rng key) for sequences past
    the measured crossover, XLA otherwise. A TRACED dropout_rate (vmapped
    population training) routes to XLA: the fused kernel bakes the dropout
    threshold into the compiled program, so it needs a static rate."""
    if (use_pallas and q.shape[2] >= PALLAS_MIN_SEQ_LEN
            and not isinstance(dropout_rate, jax.Array)):
        rate = dropout_rate if dropout_rng is not None else 0.0
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(
                dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
        return fused_attention(q, k, v, dropout_rate=rate, seed=seed)
    return xla_attention(q, k, v, dropout_rate, dropout_rng)
