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


def save_train_state(path: str, state, epoch: int, epoch_key=None,
                     records: dict | None = None) -> str:
    """Persist the full training state (params + optimizer state + rng +
    epoch + epoch-key stream position) for true resume — the reference only
    stores model weights (run.py:213, SURVEY §5.4). `records` (e.g. per-epoch
    f1/dcg history and running bests) goes to a JSON sidecar so best/best-5
    bookkeeping survives the restart too."""
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "rng": state.rng,
        "epoch": np.int32(epoch),
        "epoch_key": state.rng if epoch_key is None else epoch_key,
    }
    out = save_params(path + ".trainstate", payload)
    if records is not None:
        import json

        with open(path + ".records.json", "w") as f:
            json.dump(records, f)
    return out


def load_train_state(path: str, like_state=None, epoch: int = 0):
    """Restore the dict saved by save_train_state (with 'records' merged in
    from the JSON sidecar when present), or None."""
    like = None
    if like_state is not None:
        like = {
            "params": like_state.params,
            "opt_state": like_state.opt_state,
            "rng": like_state.rng,
            "epoch": np.int32(epoch),
            "epoch_key": like_state.rng,
        }
    payload = load_params(path + ".trainstate", like=like)
    if payload is None:
        return None
    records_path = path + ".records.json"
    if os.path.exists(records_path):
        import json

        with open(records_path) as f:
            payload["records"] = json.load(f)
    return payload


def _sharding_of(a):
    """The leaf's NamedSharding if it is a committed sharded jax.Array, else
    None (host arrays, scalars, uncommitted single-device arrays)."""
    s = getattr(a, "sharding", None)
    if s is not None and isinstance(s, jax.sharding.NamedSharding):
        return s
    return None


def _leaf_struct(a, sharding):
    shape = getattr(a, "shape", None)
    dtype = getattr(a, "dtype", None)
    if shape is None or dtype is None:
        a = np.asarray(a)
        shape, dtype = a.shape, a.dtype
    return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)


def load_params(path: str, like=None, shardings=None):
    """Load a params pytree saved by save_params; returns None if missing.

    `like` (an example pytree) is required for the msgpack fallback and
    recommended for orbax restore-with-structure. When `like` leaves are
    mesh-committed jax.Arrays (a `--data-parallel` / model_parallel run,
    parallel/sharding.py layouts), their NamedShardings are carried into the
    restore target, so orbax materializes each tensor directly in its
    original per-tensor layout — a resume never silently degrades a tp/ep
    split to replicated. `shardings` (a matching tree of NamedSharding or
    None) overrides the derived layouts."""
    path = os.path.abspath(path)
    ocp = _orbax()
    sh_leaves = treedef = None
    if like is not None:
        # flatten once; sharding trees may carry None leaves (replicate /
        # host), which jax.tree.map over multiple trees cannot express
        like_leaves, treedef = jax.tree.flatten(like)
        if shardings is None:
            sh_leaves = [_sharding_of(a) for a in like_leaves]
        else:
            sh_leaves = jax.tree.flatten(
                shardings, is_leaf=lambda x: x is None)[0]
    if ocp is not None and os.path.exists(path + ".orbax"):
        ckptr = ocp.StandardCheckpointer()
        if like is not None:
            target = treedef.unflatten(
                [_leaf_struct(a, s) for a, s in zip(like_leaves, sh_leaves)])
            return ckptr.restore(path + ".orbax", target)
        return ckptr.restore(path + ".orbax")
    if os.path.exists(path + ".msgpack"):
        from flax import serialization

        with open(path + ".msgpack", "rb") as f:
            data = f.read()
        if like is None:
            return serialization.msgpack_restore(data)
        restored = serialization.from_bytes(like, data)
        if sh_leaves is not None and any(s is not None for s in sh_leaves):
            r_leaves = treedef.flatten_up_to(restored)
            restored = treedef.unflatten([
                a if s is None else jax.device_put(a, s)
                for a, s in zip(r_leaves, sh_leaves)])
        return restored
    return None
