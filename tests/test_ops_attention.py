"""Fused Pallas attention: forward/backward parity with XLA (interpret mode)
and in-kernel dropout correctness against a mask-exact jnp reference."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlt_tpu.ops.attention import fused_attention, keep_mask, xla_attention


def qkv(shape, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


def ref_dropout_attention(q, k, v, rate, seed):
    """Pure-jnp attention applying the exact mask the kernels regenerate
    (keep_mask is shared module-level code), so outputs AND autodiff grads
    must match the Pallas custom_vjp bit-for-bit up to float tolerance."""
    b, h, L, dh = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
    p = jax.nn.softmax(s, axis=-1)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(())
    mask = jnp.stack(
        [keep_mask(seed_arr + i, (L, L), rate) for i in range(b * h)]
    ).reshape(b, h, L, L)
    p = jnp.where(mask, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("shape", [(2, 2, 24, 8), (1, 4, 40, 16), (2, 1, 31, 8)])
def test_forward_matches_xla(shape):
    q, k, v = qkv(shape)
    out = fused_attention(q, k, v, interpret=True)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 2, 24, 8), (1, 4, 40, 16)])
def test_backward_matches_xla_autodiff(shape):
    q, k, v = qkv(shape, seed=1)
    # a non-symmetric scalar readout so dq/dk/dv are all distinct
    w = jax.random.normal(jax.random.PRNGKey(9), shape, jnp.float32)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, interpret=True) * w)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_fused, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), atol=2e-5, err_msg=f"d{name}"
        )


def test_dropout_forward_matches_mask_exact_reference():
    q, k, v = qkv((2, 2, 24, 8), seed=2)
    rate, seed = 0.3, 1234
    out = fused_attention(q, k, v, dropout_rate=rate,
                          seed=jnp.asarray([seed], jnp.int32), interpret=True)
    ref = ref_dropout_attention(q, k, v, rate, seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dropout_backward_matches_mask_exact_reference():
    """The backward kernel must regenerate the identical mask the forward
    used; any fwd/bwd mask skew shows up as a grad mismatch here."""
    q, k, v = qkv((2, 2, 24, 8), seed=3)
    rate, seed = 0.25, 77
    w = jax.random.normal(jax.random.PRNGKey(5), q.shape, jnp.float32)

    def loss_fused(q, k, v):
        out = fused_attention(q, k, v, dropout_rate=rate,
                              seed=jnp.asarray([seed], jnp.int32), interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(ref_dropout_attention(q, k, v, rate, seed) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-5, err_msg=f"d{name}"
        )


def test_dropout_seed_semantics():
    q, k, v = qkv((1, 2, 16, 8), seed=4)
    a = fused_attention(q, k, v, dropout_rate=0.5,
                        seed=jnp.asarray([1], jnp.int32), interpret=True)
    b = fused_attention(q, k, v, dropout_rate=0.5,
                        seed=jnp.asarray([1], jnp.int32), interpret=True)
    c = fused_attention(q, k, v, dropout_rate=0.5,
                        seed=jnp.asarray([2], jnp.int32), interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


def test_dropout_mask_statistics():
    """The hash must behave like a fair Bernoulli(1-rate) source: keep
    fraction within a few sigma, and E[dropped attention] ~ the clean one."""
    L, rate = 128, 0.2
    seed_arr = jnp.asarray(11, jnp.int32)
    m = np.asarray(keep_mask(seed_arr, (L, L), rate))
    n = L * L
    frac = m.mean()
    sigma = math.sqrt(rate * (1 - rate) / n)
    assert abs(frac - (1 - rate)) < 5 * sigma, frac
    # rows/cols shouldn't be degenerate (all-kept or all-dropped stripes)
    assert m.all(axis=1).sum() == 0
    assert (~m).all(axis=1).sum() == 0


def test_vmap_over_fused_attention():
    """MMOECut's expert stack nn.vmap's the whole encoder — the pallas_call
    must batch (prepended grid dim) without breaking specs or streams."""
    q, k, v = qkv((3, 2, 2, 24, 8), seed=6)  # leading expert axis
    seeds = jnp.arange(3, dtype=jnp.int32).reshape(3, 1) * 1000 + 5

    def per_expert(q, k, v, seed):
        return fused_attention(q, k, v, dropout_rate=0.3, seed=seed,
                               interpret=True)

    out = jax.vmap(per_expert)(q, k, v, seeds)
    ref = jnp.stack([
        ref_dropout_attention(q[e], k[e], v[e], 0.3, int(seeds[e, 0]))
        for e in range(3)
    ])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # distinct per-expert seeds => distinct masks
    assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 1e-6

    # and the custom_vjp must batch too (grads through the vmapped op)
    g = jax.grad(lambda q: jnp.sum(jax.vmap(per_expert)(q, k, v, seeds) ** 2))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_dropout_requires_seed():
    q, k, v = qkv((1, 1, 8, 8))
    with pytest.raises(ValueError, match="requires a seed"):
        fused_attention(q, k, v, dropout_rate=0.1)


def test_grouping_invariance(monkeypatch):
    """Outputs and grads must not depend on the per-program slice group G
    (the grid-overhead amortization knob): per-slice dropout streams make
    the math grouping-invariant by construction. Force G=1 vs auto (G>1
    for these shapes) and compare."""
    from rlt_tpu.ops import attention as A

    shape = (2, 4, 24, 8)  # n = 8 slices -> auto picks G=8
    q, k, v = qkv(shape)
    seed = jnp.asarray([7], jnp.int32)

    def run():
        def f(q):
            return jnp.sum(
                fused_attention(q, k, v, dropout_rate=0.25, seed=seed,
                                interpret=True) ** 2)
        return fused_attention(q, k, v, dropout_rate=0.25, seed=seed,
                               interpret=True), jax.grad(f)(q)

    assert A._pick_group(8, 24, live_mats=3) == 8
    out_auto, g_auto = run()
    monkeypatch.setattr(A, "_pick_group", lambda n, L, live_mats: 1)
    out_g1, g_g1 = run()
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_g1))
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_g1), atol=1e-6)


def test_pick_group_respects_divisibility_and_vmem():
    from rlt_tpu.ops.attention import _GROUP_VMEM_BUDGET, _pick_group

    # 504 = 63 batch * 8 heads (choopy robust04): bwd live tiles at L=300
    # cap the group at 4; the fwd (fewer live tiles) also fits 4 but not 8.
    assert _pick_group(504, 300, live_mats=5) == 4
    assert _pick_group(504, 300, live_mats=3) == 4
    # odd slice count cannot group
    assert _pick_group(63, 40, live_mats=3) == 1
    # small L groups maximally
    assert _pick_group(256, 40, live_mats=5) == 8
    # never exceed the VMEM budget
    g = _pick_group(8, 384, live_mats=5)
    assert g * 384 * 384 * 4 * 5 <= _GROUP_VMEM_BUDGET or g == 1


def test_packed_matches_xla_eval():
    """Head-packed variant (H*dh = 128 lanes, VERDICT r3 ask #4): the
    block-structured Kbig/Vbig construction must reproduce per-head
    attention exactly — the zero blocks contribute nothing to any head's
    score or output."""
    import jax

    from rlt_tpu.ops.attention import fused_attention_packed, xla_attention

    B, H, L, dh = 2, 8, 32, 16
    q, k, v = (jax.random.normal(kk, (B, H, L, dh), jnp.float32)
               for kk in jax.random.split(jax.random.PRNGKey(3), 3))

    def pack(a):
        return a.transpose(0, 2, 1, 3).reshape(B, L, H * dh)

    got = fused_attention_packed(pack(q), pack(k), pack(v), heads=H,
                                 interpret=True)
    want = pack(xla_attention(q, k, v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_packed_backward_matches_xla_autodiff():
    import jax

    from rlt_tpu.ops.attention import fused_attention_packed, xla_attention

    B, H, L, dh = 2, 8, 32, 16
    q, k, v = (jax.random.normal(kk, (B, H, L, dh), jnp.float32)
               for kk in jax.random.split(jax.random.PRNGKey(5), 3))
    w = jax.random.normal(jax.random.PRNGKey(6), (B, L, H * dh), jnp.float32)

    def pack(a):
        return a.transpose(0, 2, 1, 3).reshape(B, L, H * dh)

    def unpack(a):
        return a.reshape(B, L, H, dh).transpose(0, 2, 1, 3)

    g_p = jax.grad(
        lambda q, k, v: jnp.sum(fused_attention_packed(
            q, k, v, heads=H, interpret=True) * w),
        argnums=(0, 1, 2))(pack(q), pack(k), pack(v))
    g_x = jax.grad(
        lambda q, k, v: jnp.sum(xla_attention(q, k, v) * unpack(w)),
        argnums=(0, 1, 2))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(pack(gx)),
                                   atol=2e-5, err_msg=f"d{name}")


def test_packed_group_size():
    from rlt_tpu.ops.attention import packed_group_size

    assert packed_group_size(128, 8) == 8      # Choopy: 8 x dh=16, one group
    assert packed_group_size(256, 4) == 2      # AttnCut/MMOE: 4 x dh=64, two groups
    assert packed_group_size(256, 2) is None   # dh=128 already full depth
    assert packed_group_size(256, 8) == 4      # dh=32 -> groups of 4
    assert packed_group_size(100, 4) is None   # dh=25 does not divide 128
    assert packed_group_size(130, 4) is None   # d not divisible by heads


@pytest.mark.parametrize("H,dh,pack", [(4, 16, 2), (4, 32, 4), (8, 8, 4),
                                       (4, 64, 2)])
def test_packed_groups_match_xla(H, dh, pack):
    """Grouped packing (pack < heads, VERDICT r4 ask #2b): each head-group's
    block-structured contraction must reproduce per-head attention exactly,
    forward and backward."""
    from rlt_tpu.ops.attention import fused_attention_packed, xla_attention

    B, L = 2, 24
    q, k, v = (jax.random.normal(kk, (B, H, L, dh), jnp.float32)
               for kk in jax.random.split(jax.random.PRNGKey(13), 3))
    w = jax.random.normal(jax.random.PRNGKey(14), (B, L, H * dh), jnp.float32)

    def packf(a):
        return a.transpose(0, 2, 1, 3).reshape(B, L, H * dh)

    def unpack(a):
        return a.reshape(B, L, H, dh).transpose(0, 2, 1, 3)

    got = fused_attention_packed(packf(q), packf(k), packf(v), heads=H,
                                 pack=pack, interpret=True)
    want = packf(xla_attention(q, k, v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    g_p = jax.grad(
        lambda q, k, v: jnp.sum(fused_attention_packed(
            q, k, v, heads=H, pack=pack, interpret=True) * w),
        argnums=(0, 1, 2))(packf(q), packf(k), packf(v))
    g_x = jax.grad(
        lambda q, k, v: jnp.sum(xla_attention(q, k, v) * unpack(w)),
        argnums=(0, 1, 2))(q, k, v)
    for gp, gx, name in zip(g_p, g_x, "qkv"):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(packf(gx)),
                                   atol=2e-5, err_msg=f"d{name}")


def test_packed_groups_dropout_streams_decorrelated():
    """With pack < heads the groups must draw INDEPENDENT dropout bits
    (group 0 keeps the round-4 stream; later groups offset): identical seeds
    reproduce, and the two groups' realized masks differ."""
    from rlt_tpu.ops.attention import fused_attention_packed

    B, H, L, dh = 1, 4, 24, 16
    qp, kp, vp = (jax.random.normal(kk, (B, L, H * dh), jnp.float32)
                  for kk in jax.random.split(jax.random.PRNGKey(15), 3))
    sd = jnp.asarray([42], jnp.int32)
    a = fused_attention_packed(qp, kp, vp, heads=H, pack=2, dropout_rate=0.5,
                               seed=sd, interpret=True)
    b = fused_attention_packed(qp, kp, vp, heads=H, pack=2, dropout_rate=0.5,
                               seed=sd, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # mask-exact grouped reference: group gi draws from the OFFSET stream
    from rlt_tpu.ops.attention import _group_stream, keep_mask

    rate, dh_g = 0.5, 2 * dh  # gd = pack*dh feature cols per group
    outs = []
    for g in range(B):
        group_outs = []
        for gi in range(2):
            cols = slice(gi * dh_g, (gi + 1) * dh_g)
            p_blocks = []
            for h in range(2):
                c = slice((2 * gi + h) * dh, (2 * gi + h + 1) * dh)
                s = qp[g, :, c] @ kp[g, :, c].T / np.sqrt(dh)
                p_blocks.append(jax.nn.softmax(s, axis=-1))
            p = jnp.concatenate(p_blocks, axis=1)  # (L, pack*L)
            keep = keep_mask(_group_stream(jnp.asarray(42 + g, jnp.int32), gi),
                             p.shape, rate)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
            o_blocks = [
                p[:, h * L:(h + 1) * L] @ vp[g, :, (2 * gi + h) * dh:
                                              (2 * gi + h + 1) * dh]
                for h in range(2)]
            group_outs.append(jnp.concatenate(o_blocks, axis=1))
        outs.append(jnp.concatenate(group_outs, axis=1))
    ref = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref), atol=1e-5)

    # the two groups' bitstreams really are decorrelated
    m0 = np.asarray(keep_mask(jnp.asarray(42, jnp.int32), (L, 2 * L), rate))
    m1 = np.asarray(keep_mask(_group_stream(jnp.asarray(42, jnp.int32), 1),
                              (L, 2 * L), rate))
    assert (m0 != m1).any()

    # and the backward regenerates the same per-group masks (finite, exact
    # match against a second grad evaluation)
    g1 = jax.grad(lambda q: jnp.sum(fused_attention_packed(
        q, kp, vp, heads=H, pack=2, dropout_rate=0.5, seed=sd,
        interpret=True) ** 2))(qp)
    g2 = jax.grad(lambda q: jnp.sum(fused_attention_packed(
        q, kp, vp, heads=H, pack=2, dropout_rate=0.5, seed=sd,
        interpret=True) ** 2))(qp)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert np.isfinite(np.asarray(g1)).all()


def test_bf16_inputs_native_mxu_math():
    """bf16 inputs stay bf16 into the kernel matmuls (f32 accumulation):
    outputs must track an f32 reference to bf16 tolerance, fwd and bwd, for
    both kernel families (VERDICT r4 ask #2a)."""
    from rlt_tpu.ops.attention import (fused_attention,
                                       fused_attention_packed, xla_attention)

    B, H, L, dh = 2, 4, 24, 16
    q, k, v = qkv((B, H, L, dh), seed=21)
    qb, kb, vb = (a.astype(jnp.bfloat16) for a in (q, k, v))
    ref = xla_attention(q, k, v)

    out = fused_attention(qb, kb, vb, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.03, rtol=0.05)

    def packf(a):
        return a.transpose(0, 2, 1, 3).reshape(B, L, H * dh)

    outp = fused_attention_packed(packf(qb), packf(kb), packf(vb), heads=H,
                                  pack=2, interpret=True)
    assert outp.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(outp, np.float32),
                               np.asarray(packf(ref)), atol=0.03, rtol=0.05)

    # gradients finite and close to the f32 autodiff reference
    g_b = jax.grad(lambda q: jnp.sum(
        fused_attention(q, kb, vb, interpret=True).astype(jnp.float32) ** 2))(qb)
    g_f = jax.grad(lambda q: jnp.sum(xla_attention(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_b, np.float32), np.asarray(g_f),
                               atol=0.15, rtol=0.1)


def test_f32_unaffected_by_bf16_flag(monkeypatch):
    """RLT_ATTN_BF16 must be a no-op for f32 inputs (the casts are identity),
    and =0 must restore f32 internal math for bf16 inputs."""
    from rlt_tpu.ops.attention import fused_attention

    q, k, v = qkv((1, 2, 16, 8), seed=22)
    base = fused_attention(q, k, v, interpret=True)
    monkeypatch.setenv("RLT_ATTN_BF16", "0")
    off = fused_attention(q, k, v, interpret=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))

    qb, kb, vb = (a.astype(jnp.bfloat16) for a in (q, k, v))
    off_b = fused_attention(qb, kb, vb, interpret=True)
    monkeypatch.setenv("RLT_ATTN_BF16", "1")
    on_b = fused_attention(qb, kb, vb, interpret=True)
    # same inputs, ~same math: bf16 PV rounding may differ slightly
    np.testing.assert_allclose(np.asarray(off_b, np.float32),
                               np.asarray(on_b, np.float32),
                               atol=0.02, rtol=0.02)


def _ref_packed_dropout(qp, kp, vp, heads, rate, seed):
    """Mask-exact reference: per-head XLA softmax assembled into the packed
    (L, H*L) score layout, the kernel's keep_mask applied, blocks multiplied
    back out — pure jnp, no pallas."""
    from rlt_tpu.ops.attention import keep_mask

    B, L, D = qp.shape
    dh = D // heads
    outs = []
    for g in range(B):
        p_blocks = []
        for h in range(heads):
            qh = qp[g, :, h * dh:(h + 1) * dh]
            kh = kp[g, :, h * dh:(h + 1) * dh]
            s = qh @ kh.T / np.sqrt(dh)
            p_blocks.append(jax.nn.softmax(s, axis=-1))
        p = jnp.concatenate(p_blocks, axis=1)  # (L, H*L)
        keep = keep_mask(jnp.asarray(seed + g, jnp.int32), p.shape, rate)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
        o_blocks = [p[:, h * L:(h + 1) * L] @ vp[g, :, h * dh:(h + 1) * dh]
                    for h in range(heads)]
        outs.append(jnp.concatenate(o_blocks, axis=1))
    return jnp.stack(outs)


def test_packed_dropout_fwd_and_bwd_mask_exact():
    """Packed in-kernel dropout: forward matches the mask-exact reference,
    and the backward regenerates the identical mask (grad match)."""
    import jax

    from rlt_tpu.ops.attention import fused_attention_packed

    B, H, L, dh = 2, 4, 24, 32  # D = 128
    qp, kp, vp = (jax.random.normal(kk, (B, L, H * dh), jnp.float32)
                  for kk in jax.random.split(jax.random.PRNGKey(8), 3))
    rate, seed = 0.3, 321
    w = jax.random.normal(jax.random.PRNGKey(9), qp.shape, jnp.float32)
    sd = jnp.asarray([seed], jnp.int32)

    out = fused_attention_packed(qp, kp, vp, heads=H, dropout_rate=rate,
                                 seed=sd, interpret=True)
    ref = _ref_packed_dropout(qp, kp, vp, H, rate, seed)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g_p = jax.grad(
        lambda q, k, v: jnp.sum(fused_attention_packed(
            q, k, v, heads=H, dropout_rate=rate, seed=sd,
            interpret=True) * w),
        argnums=(0, 1, 2))(qp, kp, vp)
    g_r = jax.grad(
        lambda q, k, v: jnp.sum(_ref_packed_dropout(
            q, k, v, H, rate, seed) * w),
        argnums=(0, 1, 2))(qp, kp, vp)
    for gp, gr, name in zip(g_p, g_r, "qkv"):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                                   atol=2e-5, err_msg=f"d{name}")


def test_vmap_over_packed_attention():
    """The MMOE expert stack nn.vmap's SelfAttention, and population
    training vmaps whole models over a member axis — the PACKED pallas_call
    (grouped variant included) must batch exactly like the per-slice one:
    prepended grid dim, per-slice streams stable, custom_vjp batchable."""
    B, H, L, dh = 2, 4, 16, 8  # pack=2 -> 2 groups
    E = 3
    qkv5 = tuple(
        jax.random.normal(k, (E, B, L, H * dh), jnp.float32)
        for k in jax.random.split(jax.random.PRNGKey(31), 3))
    seeds = jnp.arange(E, dtype=jnp.int32).reshape(E, 1) * 1000 + 9

    from rlt_tpu.ops.attention import fused_attention_packed

    def per_expert(q, k, v, seed):
        return fused_attention_packed(q, k, v, heads=H, pack=2,
                                      dropout_rate=0.3, seed=seed,
                                      interpret=True)

    out = jax.vmap(per_expert)(*qkv5, seeds)
    ref = jnp.stack([
        per_expert(qkv5[0][e], qkv5[1][e], qkv5[2][e], seeds[e])
        for e in range(E)
    ])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # distinct per-expert seeds => distinct masks
    assert np.abs(np.asarray(out[0]) - np.asarray(out[1])).max() > 1e-6

    # grads batch too
    g = jax.grad(lambda q: jnp.sum(
        jax.vmap(per_expert)(q, qkv5[1], qkv5[2], seeds) ** 2))(qkv5[0])
    assert np.isfinite(np.asarray(g)).all()


def test_packed_three_groups_with_dropout():
    """Regression: 3+ head groups overflowed the int32 group-stream offset
    literal at trace time (gi=2 -> 2*0x7F4A7C15 > 2^31-1, NumPy 2.x raises
    OverflowError). heads=6, dh=16 -> pack computed by the caller as 2
    would give 3 groups; assert the kernel traces, runs, reproduces, and
    decorrelates all three group streams."""
    B, H, L, dh = 1, 6, 16, 8  # pack=2 -> 3 groups of gd=16
    qp, kp, vp = (jax.random.normal(k, (B, L, H * dh), jnp.float32)
                  for k in jax.random.split(jax.random.PRNGKey(41), 3))
    sd = jnp.asarray([7], jnp.int32)

    from rlt_tpu.ops.attention import (_group_stream, fused_attention_packed,
                                       keep_mask)

    a = fused_attention_packed(qp, kp, vp, heads=H, pack=2, dropout_rate=0.4,
                               seed=sd, interpret=True)
    b = fused_attention_packed(qp, kp, vp, heads=H, pack=2, dropout_rate=0.4,
                               seed=sd, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()

    streams = [np.asarray(_group_stream(jnp.asarray(7, jnp.int32), gi))
               for gi in range(3)]
    assert len({int(s) for s in streams}) == 3
    masks = [np.asarray(keep_mask(jnp.asarray(int(s), jnp.int32),
                                  (L, 2 * L), 0.4)) for s in streams]
    assert (masks[0] != masks[2]).any() and (masks[1] != masks[2]).any()
