"""Checkpointing (reference run.py:203-220: state_dict pickle on each new best
test F1, loaded back for fine-tuning / frozen-trunk probing).

Primary format is orbax (the idiomatic TPU/JAX checkpointer — async-safe,
sharding-aware, restores to the same device layout); a msgpack fallback via
flax.serialization keeps checkpoints working if orbax is unavailable. Unlike
the reference, `save_train_state` can persist optimizer state + epoch for true
resume (the reference only stores model weights, SURVEY §5.4)."""

from __future__ import annotations

import os

import jax
import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp
        return ocp
    except Exception:
        return None


def save_params(path: str, params) -> str:
    """Save a params pytree. Returns the path written."""
    path = os.path.abspath(path)
    ocp = _orbax()
    params = jax.device_get(params)
    if ocp is not None:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path + ".orbax", params, force=True)
        ckptr.wait_until_finished()
        return path + ".orbax"
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path + ".msgpack", "wb") as f:
        f.write(serialization.to_bytes(params))
    return path + ".msgpack"


def save_train_state(path: str, state, epoch: int) -> str:
    """Persist the full training state (params + optimizer state + rng +
    epoch) for true resume — the reference only stores model weights
    (run.py:213, SURVEY §5.4)."""
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "epoch": np.int32(epoch),
    }
    return save_params(path + ".trainstate", payload)


def load_train_state(path: str, like_state=None, epoch: int = 0):
    """Restore (state_fields_dict, epoch) saved by save_train_state, or None."""
    like = None
    if like_state is not None:
        like = {
            "params": like_state.params,
            "opt_state": like_state.opt_state,
            "rng": like_state.rng,
            "epoch": np.int32(epoch),
        }
    payload = load_params(path + ".trainstate", like=like)
    if payload is None:
        return None
    return payload


def load_params(path: str, like=None):
    """Load a params pytree saved by save_params; returns None if missing.

    `like` (an example pytree) is required for the msgpack fallback and
    recommended for orbax restore-with-structure."""
    path = os.path.abspath(path)
    ocp = _orbax()
    if ocp is not None and os.path.exists(path + ".orbax"):
        ckptr = ocp.StandardCheckpointer()
        if like is not None:
            target = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
                like,
            )
            return ckptr.restore(path + ".orbax", target)
        return ckptr.restore(path + ".orbax")
    if os.path.exists(path + ".msgpack"):
        from flax import serialization

        with open(path + ".msgpack", "rb") as f:
            data = f.read()
        if like is None:
            return serialization.msgpack_restore(data)
        return serialization.from_bytes(like, data)
    return None
