"""rlt_tpu — a TPU-native ranked-list truncation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the reference
ranked-list-truncation framework (Woody5962/Ranked-List-Truncation): six deep
truncation models (BiCut, Choopy, AttnCut, MtChoopy, MtAttnCut, MMOECut) plus
MOECut/PLECut ablations, reward-distribution losses, F1/DCG metrics at the
predicted cut, classical baselines (Fixed-k / Greedy-k / Oracle),
hyper-parameter search, and scientific-verification harnesses — all re-designed
TPU-first:

* metrics/rewards are single fully-batched cumulative-sum tensors instead of
  O(B*L^2) python loops (reference utils/losses.py:217-225),
* models are Flax modules with `lax.scan` recurrence and fused (Pallas)
  attention instead of cuDNN LSTM / torch TransformerEncoder,
* the train step is one jitted, donate-buffers XLA program; whole epochs can be
  `lax.scan`-ed on device,
* multi-chip scaling is a `jax.sharding.Mesh` + NamedSharding data/model
  parallel layer (rlt_tpu.parallel) rather than any torch.distributed analogue.
"""

__version__ = "0.1.0"

import os as _os

from rlt_tpu import config  # noqa: F401


def enable_compilation_cache(path: str = "/tmp/rlt_tpu_jax_cache") -> None:
    """Opt-in persistent XLA compilation cache (compiles of the big epoch
    programs through the TPU tunnel take minutes; cached reruns take seconds)."""
    import jax

    _os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
