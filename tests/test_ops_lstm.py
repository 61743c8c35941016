"""Fused Pallas LSTM (rlt_tpu/ops/lstm.py) vs the lax.scan reference, in
interpret mode on CPU: forward parity, custom-vjp gradient parity (BPTT
through all gates + recurrent weights), batch padding, vmap-batching
exactness, and the explicitly-batched-input guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rlt_tpu.ops.lstm import fused_lstm


def scan_lstm(xw, w_hh_t):
    """Plain lax.scan recurrence over time-major (L, B, 4H) gate inputs —
    the exact math of models/layers.py:_lstm_scan after the hoisted input
    projection."""
    batch = xw.shape[1]
    hidden = w_hh_t.shape[0]

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

    init = (jnp.zeros((batch, hidden), xw.dtype),
            jnp.zeros((batch, hidden), xw.dtype))
    _, ys = jax.lax.scan(step, init, xw)
    return ys


def make_inputs(key, length=7, batch=4, hidden=16):
    k1, k2 = jax.random.split(key)
    xw = jax.random.normal(k1, (length, batch, 4 * hidden), jnp.float32)
    w_hh_t = 0.5 * jax.random.normal(k2, (hidden, 4 * hidden), jnp.float32)
    return xw, w_hh_t


@pytest.mark.parametrize("batch", [4, 6])  # 6 exercises the pad-to-8 path
def test_forward_matches_scan(batch):
    xw, w_hh_t = make_inputs(jax.random.PRNGKey(0), batch=batch)
    got = fused_lstm(xw, w_hh_t, interpret=True)
    want = scan_lstm(xw, w_hh_t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_scan():
    """custom_vjp (reverse-grid backward kernel) vs autodiff through the
    scan, for both the streamed gate inputs and the recurrent weights."""
    xw, w_hh_t = make_inputs(jax.random.PRNGKey(1), length=9, batch=4)
    probe = jax.random.normal(jax.random.PRNGKey(2), xw.shape[:2] + (16,))

    def loss(fn):
        def inner(xw, w):
            return jnp.sum(fn(xw, w) * probe)
        return inner

    g_fused = jax.grad(loss(lambda a, b: fused_lstm(a, b, interpret=True)),
                       argnums=(0, 1))(xw, w_hh_t)
    g_scan = jax.grad(loss(scan_lstm), argnums=(0, 1))(xw, w_hh_t)
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_scan[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(g_scan[1]),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match_scan_padded_batch():
    xw, w_hh_t = make_inputs(jax.random.PRNGKey(3), length=5, batch=3)
    probe = jax.random.normal(jax.random.PRNGKey(4), xw.shape[:2] + (16,))

    def fused_loss(a, b):
        return jnp.sum(fused_lstm(a, b, interpret=True) * probe)

    def scan_loss(a, b):
        return jnp.sum(scan_lstm(a, b) * probe)

    g_fused = jax.grad(fused_loss, argnums=(0, 1))(xw, w_hh_t)
    g_scan = jax.grad(scan_loss, argnums=(0, 1))(xw, w_hh_t)
    np.testing.assert_allclose(np.asarray(g_fused[0]), np.asarray(g_scan[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_fused[1]), np.asarray(g_scan[1]),
                               rtol=1e-4, atol=1e-5)


def test_rejects_batched_input():
    with pytest.raises(ValueError, match="unbatched"):
        fused_lstm(jnp.zeros((2, 5, 4, 64)), jnp.zeros((16, 64)),
                   interpret=True)


def test_vmap_matches_sequential():
    """The population engine (rlt_tpu/population.py) vmaps whole train steps
    over K members WITH the fused kernels on — pallas batching must keep the
    time grid axis stable under the prepended member axis, exactly (fwd and
    grad)."""
    key = jax.random.PRNGKey(11)
    K = 3
    xws = jnp.stack([make_inputs(jax.random.fold_in(key, i))[0]
                     for i in range(K)])
    whhs = jnp.stack([make_inputs(jax.random.fold_in(key, i))[1]
                      for i in range(K)])

    f = lambda a, w: fused_lstm(a, w, interpret=True)  # noqa: E731
    vm = jax.vmap(f)(xws, whhs)
    seq = jnp.stack([f(xws[i], whhs[i]) for i in range(K)])
    np.testing.assert_array_equal(np.asarray(vm), np.asarray(seq))

    g_vm = jax.grad(lambda a: jnp.sum(jax.vmap(f)(a, whhs) ** 2))(xws)
    g_seq = jax.grad(
        lambda a: jnp.sum(jnp.stack([f(a[i], whhs[i]) for i in range(K)]) ** 2)
    )(xws)
    np.testing.assert_array_equal(np.asarray(g_vm), np.asarray(g_seq))


def test_bidir_forward_matches_two_scans():
    """fused_lstm_bidir (one kernel, direction-stacked) vs two independent
    scan recurrences — outputs must match each direction exactly."""
    from rlt_tpu.ops.lstm import fused_lstm_bidir

    key = jax.random.PRNGKey(5)
    xw_f, whh_f = make_inputs(key, length=7, batch=6)
    xw_r, whh_r = make_inputs(jax.random.fold_in(key, 1), length=7, batch=6)
    hs_f, hs_r = fused_lstm_bidir(xw_f, xw_r, whh_f, whh_r, interpret=True)
    np.testing.assert_allclose(np.asarray(hs_f), np.asarray(scan_lstm(xw_f, whh_f)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hs_r), np.asarray(scan_lstm(xw_r, whh_r)),
                               rtol=1e-5, atol=1e-5)


def test_bidir_gradients_match_two_scans():
    """Backward through the direction-stacked kernel: gradients w.r.t. both
    directions' gate inputs and recurrent weights match per-direction
    autodiff through the scan."""
    from rlt_tpu.ops.lstm import fused_lstm_bidir

    key = jax.random.PRNGKey(6)
    xw_f, whh_f = make_inputs(key, length=9, batch=4)
    xw_r, whh_r = make_inputs(jax.random.fold_in(key, 1), length=9, batch=4)
    probe_f = jax.random.normal(jax.random.PRNGKey(7), xw_f.shape[:2] + (16,))
    probe_r = jax.random.normal(jax.random.PRNGKey(8), xw_f.shape[:2] + (16,))

    def fused_loss(af, ar, wf, wr):
        hf, hr = fused_lstm_bidir(af, ar, wf, wr, interpret=True)
        return jnp.sum(hf * probe_f) + jnp.sum(hr * probe_r)

    def scan_loss(af, ar, wf, wr):
        return (jnp.sum(scan_lstm(af, wf) * probe_f)
                + jnp.sum(scan_lstm(ar, wr) * probe_r))

    g_fused = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(xw_f, xw_r, whh_f, whh_r)
    g_scan = jax.grad(scan_loss, argnums=(0, 1, 2, 3))(xw_f, xw_r, whh_f, whh_r)
    for gf, gs in zip(g_fused, g_scan):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gs),
                                   rtol=1e-4, atol=1e-5)


def test_bidir_rejects_batched_input():
    from rlt_tpu.ops.lstm import fused_lstm_bidir

    with pytest.raises(ValueError, match="unbatched"):
        fused_lstm_bidir(jnp.zeros((2, 5, 4, 64)), jnp.zeros((2, 5, 4, 64)),
                         jnp.zeros((16, 64)), jnp.zeros((16, 64)),
                         interpret=True)


def test_lstm_module_bidir_fused_path_matches_scan(monkeypatch):
    """Module-level wiring of the fused bidir path (time flips, direction
    concat order, per-layer stacking) against the scan path, same params."""
    import functools

    from rlt_tpu.models import layers as layers_mod

    monkeypatch.setenv("RLT_LSTM_FUSE_BIDIR", "1")  # opt-in path (see layers.py)
    monkeypatch.setattr(
        layers_mod, "fused_lstm_bidir",
        functools.partial(layers_mod.fused_lstm_bidir, interpret=True))

    x = jax.random.normal(jax.random.PRNGKey(9), (3, 11, 5), jnp.float32)
    fused_mod = layers_mod.LSTM(hidden_size=128, num_layers=2, use_pallas=True)
    scan_mod = layers_mod.LSTM(hidden_size=128, num_layers=2, use_pallas=False)
    variables = scan_mod.init(jax.random.PRNGKey(10), x)
    want = scan_mod.apply(variables, x)
    got = fused_mod.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
