"""Attention ops: a Pallas fused-softmax-attention TPU kernel plus an XLA path.

Every model family in the reference runs self-attention over ranked lists
(Choopy models/Choopy.py:12, AttnCut models/AttnCut.py:10-11, the MMOE experts
models/MMOECut.py:6-14). Sequence lengths are small (L = 300 or 40), so the win
from the fused kernel is keeping the (L, L) score matrix in VMEM — one HBM
round-trip for scores+softmax+PV instead of three.

The Pallas kernel is used on the inference/eval path (attention-weight dropout
off); training uses the XLA path, which autodiffs and fuses well. Shapes are
static, so both paths compile once.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch*head) slice: scores -> stable softmax -> PV, all in VMEM."""
    q = q_ref[0].astype(jnp.float32)  # (L, dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    # q @ k^T without materializing the transpose (NT matmul on the MXU)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (L, L)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    """Pallas fused attention. q, k, v: (B, H, L, dh) -> (B, H, L, dh).

    Grid is one program per (batch, head); each program holds its full (L, dh)
    Q/K/V block and (L, L) score tile in VMEM (L <= 384 here, ~0.6 MB fp32).
    """
    batch, heads, seq_len, head_dim = q.shape
    scale = 1.0 / math.sqrt(head_dim)
    flat = (batch * heads, seq_len, head_dim)
    spec = pl.BlockSpec((1, seq_len, head_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale),
        grid=(batch * heads,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(flat, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * batch * heads * seq_len * seq_len * head_dim,
            bytes_accessed=4 * batch * heads * seq_len * head_dim * 4,
            transcendentals=batch * heads * seq_len * seq_len,
        ),
    )(q.reshape(flat), k.reshape(flat), v.reshape(flat))
    return out.reshape(q.shape)


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
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Dispatch: Pallas fused kernel when no attention dropout is active
    (inference / dropout=0 configs on TPU), XLA otherwise."""
    if use_pallas and (dropout_rate == 0.0 or dropout_rng is None):
        return fused_attention(q, k, v)
    return xla_attention(q, k, v, dropout_rate, dropout_rng)
