"""Multi-chip scaling layer (no analogue in the reference — it is single
process, optional single GPU via .cuda(), run.py:106-108; SURVEY §5.8).

The TPU-native design: a 1-D `jax.sharding.Mesh` over the batch ("data") axis,
NamedSharding annotations on the dataset and batch, replicated parameters, and
XLA-inserted ICI collectives (psum for the gradient reduction) — pure SPMD via
jit, no torch.distributed analogue, no hand-written NCCL calls."""

from rlt_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    pad_and_shard_rows,
    replicated,
    shard_dataset,
)
