"""Shape/semantics tests for the model zoo, replacing the reference's
print-and-eyeball `__main__` blocks (e.g. models/MMOECut.py:112-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlt_tpu.models import MODELS, Probe, ProbeBase, TaskC, TaskR, build_model

SMALL = dict(seq_len=20, input_size=3, dropout=0.1)


def _init_and_apply(model, x, train=False):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True,
    )
    rngs = {"dropout": jax.random.PRNGKey(2)} if train else None
    return model.apply(variables, x, deterministic=not train, rngs=rngs)


@pytest.mark.parametrize("name", sorted(MODELS))
def test_model_shapes(rng, name):
    B, L, F = 4, SMALL["seq_len"], SMALL["input_size"]
    if name in ("choopy", "mtchoopy"):
        F = 1
    x = jnp.array(rng.normal(size=(B, L, F)).astype(np.float32))
    model = build_model(name, seq_len=L, input_size=F, dropout=0.1)
    out = _init_and_apply(model, x)

    if name == "bicut":
        assert out.shape == (B, L, 2)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)
    elif name in ("choopy", "attncut"):
        assert out.shape == (B, L, 1)
        np.testing.assert_allclose(np.asarray(out)[..., 0].sum(-1), 1.0, rtol=1e-5)
    elif name == "probe_base":
        experts_in, experts_o, final = out
        assert experts_in.shape == (B, L, 256)
        assert experts_o.shape == (2, B, L, 256)
        assert len(final) == 3
    else:
        assert isinstance(out, list) and len(out) == 3
        for head in out:
            assert head.shape == (B, L, 1)
        # cut head is a distribution over positions
        np.testing.assert_allclose(np.asarray(out[-1])[..., 0].sum(-1), 1.0, rtol=1e-5)
        # class head is in (0, 1)
        cls = np.asarray(out[0])
        assert ((cls > 0) & (cls < 1)).all()


@pytest.mark.parametrize("name", ["mtchoopy", "mtattncut", "mmoecut", "moecut"])
@pytest.mark.parametrize("num_tasks", [2.1, 2.2])
def test_num_tasks_selection(rng, name, num_tasks):
    B, L = 3, SMALL["seq_len"]
    F = 1 if name == "mtchoopy" else 3
    x = jnp.array(rng.normal(size=(B, L, F)).astype(np.float32))
    model = build_model(name, seq_len=L, input_size=F, dropout=0.0, num_tasks=num_tasks)
    out = _init_and_apply(model, x)
    assert len(out) == 2
    np.testing.assert_allclose(np.asarray(out[-1])[..., 0].sum(-1), 1.0, rtol=1e-5)


def test_dropout_training_path(rng):
    """Training-mode apply must differ from eval and vary with the rng."""
    B, L, F = 3, SMALL["seq_len"], 3
    x = jnp.array(rng.normal(size=(B, L, F)).astype(np.float32))
    model = build_model("attncut", seq_len=L, input_size=F, dropout=0.5)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, deterministic=True,
    )
    eval_out = model.apply(variables, x, deterministic=True)
    train1 = model.apply(variables, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    train2 = model.apply(variables, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(eval_out), np.asarray(train1))
    assert not np.allclose(np.asarray(train1), np.asarray(train2))


def test_probe_pipeline(rng):
    B, L, F = 3, SMALL["seq_len"], 3
    x = jnp.array(rng.normal(size=(B, L, F)).astype(np.float32))
    base = ProbeBase(seq_len=L, input_size=F, dropout=0.0, num_experts=2)
    variables = base.init(jax.random.PRNGKey(0), x, deterministic=True)
    experts_in, experts_o, _ = base.apply(variables, x, deterministic=True)

    probe = Probe()
    pvars = probe.init(jax.random.PRNGKey(1), experts_in, experts_o)
    outs = probe.apply(pvars, experts_in, experts_o)
    assert len(outs) == 6
    for o in outs:
        assert o.shape == (B, L, 1)


def test_task_heads(rng):
    B, L, D = 3, 10, 16
    x = jnp.array(rng.normal(size=(B, L, D)).astype(np.float32))
    c = TaskC()
    cv = c.init(jax.random.PRNGKey(0), x)
    out_c = np.asarray(c.apply(cv, x))
    assert out_c.shape == (B, L, 1) and ((out_c > 0) & (out_c < 1)).all()
    r = TaskR()
    rv = r.init(jax.random.PRNGKey(0), x)
    out_r = np.asarray(r.apply(rv, x))
    np.testing.assert_allclose(out_r[..., 0].sum(-1), 1.0, rtol=1e-5)


def test_mmoe_gate_param_shapes(rng):
    """Gates are shape-specialized to (2*H*L, E) exactly like the reference
    (MMOECut.py:68) — this is where MMOECut's capacity lives."""
    L, F = 20, 3
    model = build_model("mmoecut", seq_len=L, input_size=F, dropout=0.0)
    x = jnp.zeros((2, L, F))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    w = variables["params"]["w_gates"]
    assert w.shape == (3, 128 * L * 2, 3)


def test_multi_head_registry_pins_reference_dispatch():
    """The reference routes multi-task decode on `"m" in model_name`
    (run.py:137). Our registry makes that an explicit attribute; this test
    pins every registered model name to the reference rule so the two can
    never drift, and pins the unknown-name failure mode."""
    from rlt_tpu.models import is_multi_head

    for name in MODELS:
        assert is_multi_head(name) == ("m" in name), name
    with pytest.raises(ValueError):
        is_multi_head("newmodel_not_registered")


def test_logit_mix_equals_activation_mix(monkeypatch):
    """The tower heads are affine and the gates softmax to 1, so mixing
    per-expert LOGITS must equal mixing (B, L, D) activations first (the
    reference's MMOECut.py:101-102 order) up to float reassociation —
    same params, same outputs, for every MMOE-family model."""
    import jax
    import numpy as np

    from rlt_tpu.models import build_model

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 20, 3))
    for name in ("mmoecut", "moecut", "mtple", "probe_base"):
        model = build_model(name, seq_len=20, input_size=3, dropout=0.0)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x)["params"]

        monkeypatch.setenv("RLT_MMOE_LOGIT_MIX", "1")
        out_new = model.apply({"params": params}, x, True)
        monkeypatch.setenv("RLT_MMOE_LOGIT_MIX", "0")
        out_old = model.apply({"params": params}, x, True)

        new_leaves = jax.tree.leaves(out_new)
        old_leaves = jax.tree.leaves(out_old)
        assert len(new_leaves) == len(old_leaves)
        for a, b in zip(new_leaves, old_leaves):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, err_msg=name)
