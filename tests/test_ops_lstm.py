"""Fused Pallas LSTM (rlt_tpu/ops/lstm.py) vs the lax.scan reference, in
interpret mode on CPU: forward parity, custom-vjp gradient parity (BPTT
through all gates + recurrent weights), batch padding, and the no-vmap
guard."""

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
