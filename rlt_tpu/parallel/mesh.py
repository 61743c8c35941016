"""Mesh + sharding helpers for data-parallel truncation training.

Workload analysis (SURVEY §5.8): models are a few M params, datasets are a few
hundred queries — batch data parallelism is the axis with guaranteed payoff,
so this module ships the default 1-D "data" mesh. Parameters are replicated;
each chip holds a batch shard; XLA turns the jitted gradient computation into
per-shard compute + one psum over ICI. For the regimes where one chip stops
being enough, sharding.py adds the optional 2-D (data, model) mesh with
expert-parallel / FFN-tensor-parallel per-tensor layouts."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the batch axis. Uses all visible devices by default.

    When n_devices is given, exactly that many devices are required — a
    silent downscale (e.g. a 1-chip host "passing" an 8-chip dryrun) would
    fake multi-chip coverage, so too few devices is an error."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"data_parallel_mesh: need {n_devices} devices, backend has "
                f"{len(devices)} ({devices[0].platform if devices else 'none'})"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, scalars)."""
    return NamedSharding(mesh, P())


def pad_and_shard_rows(a, mesh: Mesh):
    """Pad the leading dim to a multiple of the mesh size (XLA requires even
    shards) and device_put sharded over 'data'. Padding rows are dropped by
    the batch plan's valid mask, so their values are irrelevant."""
    from rlt_tpu.data.batching import pad_rows

    return jax.device_put(pad_rows(a, mesh.devices.size), batch_sharding(mesh))


def shard_dataset(data, mesh: Mesh):
    """Shard a RankedListData's four arrays over the 'data' axis. Returns
    (x_train, y_train, x_test, y_test) as sharded device arrays."""
    return tuple(
        pad_and_shard_rows(a, mesh)
        for a in (data.x_train, data.y_train, data.x_test, data.y_test)
    )


def device_put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
