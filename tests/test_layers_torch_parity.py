"""Numerical parity of the core layers against torch (the reference's
substrate): copy a torch module's weights into the flax layer and require
matching outputs. This pins down weight layouts, gate order, residual/LayerNorm
placement, and softmax axes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from rlt_tpu.models.layers import LSTM, TransformerEncoderLayer
from rlt_tpu.ops.attention import fused_attention, xla_attention


def test_lstm_matches_torch(rng):
    B, L, F, H = 3, 17, 5, 8
    x = rng.normal(size=(B, L, F)).astype(np.float32)

    torch_lstm = torch.nn.LSTM(F, H, num_layers=2, batch_first=True, bidirectional=True)
    torch_lstm.eval()
    with torch.no_grad():
        expected = torch_lstm(torch.tensor(x))[0].numpy()

    model = LSTM(hidden_size=H, num_layers=2, bidirectional=True)
    params = model.init(jax.random.PRNGKey(0), jnp.array(x))["params"]
    sd = torch_lstm.state_dict()
    converted = {k: jnp.array(v.numpy()) for k, v in sd.items()}
    assert set(converted) == set(params), (set(converted) ^ set(params))
    got = np.asarray(model.apply({"params": converted}, jnp.array(x)))

    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("d_model,n_head", [(128, 8), (256, 4)])
def test_transformer_layer_matches_torch(rng, d_model, n_head):
    B, L = 2, 12
    x = rng.normal(size=(B, L, d_model)).astype(np.float32)

    torch_layer = torch.nn.TransformerEncoderLayer(
        d_model=d_model, nhead=n_head, dropout=0.0, batch_first=True
    )
    torch_layer.eval()
    with torch.no_grad():
        expected = torch_layer(torch.tensor(x)).numpy()

    model = TransformerEncoderLayer(d_model=d_model, n_head=n_head, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), jnp.array(x))["params"]
    sd = {k: v.numpy() for k, v in torch_layer.state_dict().items()}
    converted = {
        "self_attn": {
            "in_proj_weight": sd["self_attn.in_proj_weight"],
            "in_proj_bias": sd["self_attn.in_proj_bias"],
            "out_proj_weight": sd["self_attn.out_proj.weight"],
            "out_proj_bias": sd["self_attn.out_proj.bias"],
        },
        "linear1": {"weight": sd["linear1.weight"], "bias": sd["linear1.bias"]},
        "linear2": {"weight": sd["linear2.weight"], "bias": sd["linear2.bias"]},
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
    }
    converted = jax.tree.map(jnp.array, converted)
    # compare the actual shape VALUES (tree_structure ignores leaf values, so
    # it cannot catch a transposed weight layout)
    assert jax.tree.map(np.shape, converted) == jax.tree.map(np.shape,
                                                             dict(params))
    got = np.asarray(model.apply({"params": converted}, jnp.array(x), deterministic=True))

    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_pallas_attention_matches_xla(rng):
    B, H, L, dh = 2, 4, 300, 64
    q = rng.normal(size=(B, H, L, dh)).astype(np.float32)
    k = rng.normal(size=(B, H, L, dh)).astype(np.float32)
    v = rng.normal(size=(B, H, L, dh)).astype(np.float32)
    expected = np.asarray(xla_attention(jnp.array(q), jnp.array(k), jnp.array(v)))
    got = np.asarray(
        fused_attention(jnp.array(q), jnp.array(k), jnp.array(v), interpret=True)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_bicut_init_distribution_matches_torch():
    """The init path is the one thing the lockstep trajectory test bypasses
    (it copies torch weights). Pin it analytically: torch inits every LSTM
    parameter U(-1/sqrt(H), 1/sqrt(H)) and Linear weight+bias
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform(a=sqrt(5)) ==
    that bound for weights); our BiCut must draw from the same families
    (models/Bicut.py:5-21, torch nn.LSTM/nn.Linear reset_parameters)."""
    import jax.numpy as jnp

    from rlt_tpu.models.simple import BiCut

    model = BiCut(input_size=3, dropout=0.0)  # default H=128, fc 256
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 3)))["params"]

    checks = [(f"bilstm/{k}", v, 1 / np.sqrt(128))
              for k, v in params["bilstm"].items()]
    for mod in ("fc", "decision"):
        for k in ("weight", "bias"):
            checks.append((f"{mod}/{k}", params[mod][k], 1 / np.sqrt(256)))

    for name, v, bound in checks:
        v = np.asarray(v).ravel()
        assert np.abs(v).max() <= bound, name
        if v.size >= 256:  # enough samples for tight moment checks
            np.testing.assert_allclose(v.std(), bound / np.sqrt(3), rtol=0.1,
                                       err_msg=name)
            assert abs(v.mean()) < 0.15 * bound, name
            # genuinely uniform, not gaussian-clipped: mass near the edges
            assert (np.abs(v) > 0.9 * bound).mean() > 0.05, name


def test_relu_dropout_bit_identical_to_composition():
    """ReluDropout (output-residual custom vjp, layers.py) must reproduce
    relu -> Dropout bit-for-bit in fwd AND bwd for both compute dtypes.
    Same explicit module name => same rng fold path => same mask bits, so
    this pins that swapping the FFN composition for the fused vjp changed
    no bitstream anywhere in the zoo (RESULTS.md round-4 roofline)."""
    from flax import linen as nn

    from rlt_tpu.models.layers import Dropout, ReluDropout

    class Old(nn.Module):
        @nn.compact
        def __call__(self, x, det=False):
            return Dropout(0.1, name="Dropout_1")(nn.relu(x), det)

    class New(nn.Module):
        @nn.compact
        def __call__(self, x, det=False):
            return ReluDropout(0.1, name="Dropout_1")(x, det)

    key = jax.random.PRNGKey(3)
    x32 = jnp.asarray(np.random.default_rng(5).normal(size=(4, 9, 65)),
                      jnp.float32)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = x32.astype(dtype)
        fwd_old = Old().apply({}, x, rngs={"dropout": key})
        fwd_new = New().apply({}, x, rngs={"dropout": key})
        assert (fwd_old == fwd_new).all()

        def tot(mod, z):
            return mod.apply({}, z, rngs={"dropout": key}).astype(
                jnp.float32).sum()

        g_old = jax.grad(lambda z: tot(Old(), z))(x)
        g_new = jax.grad(lambda z: tot(New(), z))(x)
        assert (g_old == g_new).all()
    # deterministic path is plain relu on both
    assert (Old().apply({}, x32, True, rngs={"dropout": key})
            == New().apply({}, x32, True, rngs={"dropout": key})).all()


def test_attention_routing_by_dtype_and_mode():
    """The SelfAttention dispatch is a measured decision table (RESULTS.md
    'Grouped head packing + kernel dtype', round 5): packed Pallas kernels
    wherever packed_group_size admits 128-lane head groups, EXCEPT the bf16
    wide-head (dh>=64) deterministic forward, which routes to XLA; mq2007's
    L=40 always routes to XLA. Tracing (make_jaxpr) never executes the
    kernels, so the routing is assertable on CPU."""
    import jax
    import jax.numpy as jnp

    from rlt_tpu.models.layers import SelfAttention

    def path(d, n_head, L, dtype, deterministic, dropout=0.1):
        m = SelfAttention(d_model=d, n_head=n_head, dropout=dropout,
                          use_pallas=True)
        x = jnp.zeros((2, L, d), dtype)
        params = jax.eval_shape(
            lambda: m.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x))
        # trace the apply without executing it
        jaxpr = jax.make_jaxpr(
            lambda p, x: m.apply(
                p, x, deterministic,
                rngs=None if deterministic else
                {"dropout": jax.random.PRNGKey(2)}))(
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params), x)
        return "pallas_call" in str(jaxpr)

    f32, bf16 = jnp.float32, jnp.bfloat16
    # robust04 L=300: packed pallas for training everywhere eligible
    assert path(256, 4, 300, f32, deterministic=False)
    assert path(256, 4, 300, bf16, deterministic=False)
    assert path(128, 8, 300, f32, deterministic=False)
    assert path(128, 8, 300, bf16, deterministic=False)
    # eval: f32 keeps pallas; bf16 wide-head routes to XLA, thin-head stays
    assert path(256, 4, 300, f32, deterministic=True)
    assert not path(256, 4, 300, bf16, deterministic=True)
    assert path(128, 8, 300, bf16, deterministic=True)
    # mq2007 L=40: XLA everywhere
    assert not path(256, 4, 40, f32, deterministic=False)
    assert not path(128, 8, 40, bf16, deterministic=False)
