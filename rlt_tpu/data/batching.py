"""Device-resident batching.

The datasets are tiny (~250 queries x 300 x F floats ≈ 1 MB), so the whole
dataset lives on device as one array and the "dataloader" is an index gather
inside jit (SURVEY §7 step 1): a shuffled epoch is one permutation, padded to
a whole number of static-shape batches with a per-row `valid` mask so the jit
cache sees exactly one batch shape. This replaces the reference's
torch DataLoader + pin_memory host loop (attncut_dataloader.py:74-90) — zero
host<->device traffic per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def num_batches(n: int, batch_size: int) -> int:
    return -(-n // batch_size)


def epoch_permutation(key: jax.Array, n: int, batch_size: int):
    """Shuffled, padded epoch index plan.

    Returns (idx, valid): idx (num_batches, batch_size) int32 gather indices
    (padding rows repeat index 0), valid (num_batches, batch_size) float32
    mask of real rows. Pure jnp — callable inside jit/scan.
    """
    nb = num_batches(n, batch_size)
    perm = jax.random.permutation(key, n)
    pad = nb * batch_size - n
    idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
    valid = jnp.concatenate([jnp.ones((n,), jnp.float32), jnp.zeros((pad,), jnp.float32)])
    return idx.reshape(nb, batch_size), valid.reshape(nb, batch_size)


class DeviceDataset(struct.PyTreeNode):
    """Train/test splits as device arrays plus the static batch plan.

    A pytree (arrays are leaves, batch_size is static) so it can be passed
    straight into jitted epoch programs."""

    x_train: jax.Array
    y_train: jax.Array
    x_test: jax.Array
    y_test: jax.Array
    batch_size: int = struct.field(pytree_node=False)

    @classmethod
    def from_host(cls, data, batch_size: int, sharding=None) -> "DeviceDataset":
        """Put a RankedListData on device (optionally with a NamedSharding so
        multi-chip runs keep the data sharded over the batch axis)."""
        put = (lambda a: jax.device_put(np.asarray(a), sharding)) if sharding \
            else (lambda a: jnp.asarray(a))
        return cls(
            x_train=put(data.x_train),
            y_train=put(data.y_train),
            x_test=put(data.x_test),
            y_test=put(data.y_test),
            batch_size=batch_size,
        )

    @property
    def n_train(self) -> int:
        return self.x_train.shape[0]

    @property
    def n_test(self) -> int:
        return self.x_test.shape[0]

    @property
    def train_batches(self) -> int:
        return num_batches(self.n_train, self.batch_size)

    @property
    def test_batches(self) -> int:
        return num_batches(self.n_test, self.batch_size)
