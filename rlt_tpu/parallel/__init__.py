"""Multi-chip scaling layer (no analogue in the reference — it is single
process, optional single GPU via .cuda(), run.py:106-108; SURVEY §5.8).

The TPU-native design: a `jax.sharding.Mesh` over a batch ("data") axis and
an optional "model" axis, NamedSharding annotations on the dataset, batch and
parameters, and XLA-inserted ICI collectives — pure SPMD via jit, no
torch.distributed analogue, no hand-written NCCL calls. mesh.py holds the
1-D data-parallel layout (replicated params + gradient psum); sharding.py
adds the 2-D (data, model) layouts: expert parallelism over the vmapped MMOE
expert stack and Megatron-style tensor parallelism over the encoder FFNs."""

from rlt_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    pad_and_shard_rows,
    replicated,
    shard_dataset,
)
from rlt_tpu.parallel.sharding import (  # noqa: F401
    mesh_2d,
    param_shardings,
    shard_params,
)
