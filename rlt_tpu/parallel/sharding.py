"""2-D (data x model) mesh sharding: expert- and tensor-parallel layouts.

The reference trains on exactly one GPU (run.py:106-108); SURVEY §5.8 asks for
an SPMD replacement. Round 1 shipped the 1-D data mesh (mesh.py) — the only
axis with guaranteed payoff at the reference's model sizes. This module adds
the second mesh axis ("model") for the scaling regimes where one chip's HBM
or FLOPs stop being enough, with two GSPMD layouts chosen per-tensor:

* **Expert parallelism (ep)** — the MMOE family's experts are a vmapped stack
  whose params all carry a leading E axis (models/mmoe.py:54-64, reference
  MMOECut.py:86-88 python list of experts). When E divides the model-axis
  size, each device group holds E/m whole experts; the only cross-group
  traffic is the psum produced by the gate-mixing einsum contraction over E
  (mmoe.py:111) and is inserted by XLA automatically.
* **Tensor parallelism (tp)** — Megatron-style split of the transformer FFN,
  where ~8/9 of each encoder layer's parameters live (dim_feedforward=2048 vs
  d_model<=256, reference models/*.py nn.TransformerEncoderLayer): linear1 is
  column-parallel (output dim sharded), linear2 row-parallel (input dim
  sharded); XLA inserts one all-reduce per FFN on the partial products.
  Attention in/out projections stay replicated: their torch-layout (3D, D)
  in_proj interleaves q/k/v thirds, so a clean head split is not expressible
  as a single dim sharding, and they are <1/8 of the layer's FLOPs.

Rules are applied per-tensor from parameter-tree paths, ep first, tp as the
fallback — so MMOECut with E=4 on a (4, 2) mesh runs pure ep, the reference's
E=3 runs tp, and the non-MOE transformers (AttnCut/Choopy families) run tp on
their encoder FFNs. Anything that does not divide evenly stays replicated
(never a silent wrong answer — GSPMD still computes the same math, the layout
is just less parallel). Pipeline/sequence parallelism remain unwarranted: the
deepest model is 3 encoder layers (Choopy.py:12) and the LSTM recurrence is
sequential in L by construction.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, tree_map_with_path


def mesh_2d(n_devices: int | None = None, model_parallel: int = 1,
            devices=None) -> Mesh:
    """A ("data", "model") mesh of exactly n_devices devices.

    Like data_parallel_mesh, requesting more devices than the backend has is
    an error, never a silent downscale; n_devices must also be divisible by
    model_parallel so both axes are rectangular."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if model_parallel < 1 or n_devices % model_parallel:
        raise ValueError(
            f"mesh_2d: model_parallel={model_parallel} must divide "
            f"n_devices={n_devices}"
        )
    if len(devices) < n_devices:
        raise ValueError(
            f"mesh_2d: need {n_devices} devices, backend has {len(devices)} "
            f"({devices[0].platform if devices else 'none'})"
        )
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names=("data", "model"))


def _path_names(path) -> list[str]:
    return [p.key for p in path if isinstance(p, DictKey)]


def _spec_for(path, leaf, model_size: int) -> P:
    """Per-tensor layout rule: ep on the vmapped expert axis when it divides,
    else Megatron tp on the FFN linears, else replicated."""
    names = _path_names(path)
    if model_size <= 1:  # no "model" axis (or nothing to split): replicate
        return P()
    if "experts" in names and leaf.ndim >= 1 and leaf.shape[0] % model_size == 0:
        return P("model", *(None,) * (leaf.ndim - 1))
    if len(names) >= 2:
        layer, param = names[-2], names[-1]
        # TorchLinear layout is (out, in); a leading expert axis may precede it
        if layer == "linear1" and param == "weight" \
                and leaf.shape[-2] % model_size == 0:
            return P(*(None,) * (leaf.ndim - 2), "model", None)
        if layer == "linear1" and param == "bias" \
                and leaf.shape[-1] % model_size == 0:
            return P(*(None,) * (leaf.ndim - 1), "model")
        if layer == "linear2" and param == "weight" \
                and leaf.shape[-1] % model_size == 0:
            return P(*(None,) * (leaf.ndim - 1), "model")
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for a model's params on a ("data", "model") mesh.

    Parameters are never sharded over "data" (that axis belongs to the
    batch); the "model" axis takes the expert stack or the FFN split per
    _spec_for. On a model_parallel=1 mesh everything is replicated and this
    degenerates to the round-1 data-parallel layout."""
    model_size = mesh.shape.get("model", 1)
    return tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _spec_for(path, leaf, model_size)),
        params,
    )


def shard_params(params, mesh: Mesh):
    """device_put the param tree with its per-tensor layouts."""
    return jax.tree.map(
        jax.device_put, params, param_shardings(params, mesh)
    )
