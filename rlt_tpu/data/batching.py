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


def pad_rows(a: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad the leading dim to a multiple (XLA requires even shards).
    Shared by DeviceDataset.from_host and rlt_tpu.parallel."""
    a = np.asarray(a)
    rem = (-a.shape[0]) % multiple
    if rem:
        a = np.concatenate([a, np.zeros((rem,) + a.shape[1:], a.dtype)])
    return a


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

    A pytree (arrays are leaves; batch_size and the true row counts are
    static) so it can be passed straight into jitted epoch programs. When a
    batch sharding is given, rows are padded to a multiple of the device
    count (XLA requires even shards); the batch plan never indexes past the
    true row counts, so pad rows are dead weight only."""

    x_train: jax.Array
    y_train: jax.Array
    x_test: jax.Array
    y_test: jax.Array
    batch_size: int = struct.field(pytree_node=False)
    n_train: int = struct.field(pytree_node=False, default=0)
    n_test: int = struct.field(pytree_node=False, default=0)

    @classmethod
    def from_host(cls, data, batch_size: int, sharding=None) -> "DeviceDataset":
        """Put a RankedListData on device (optionally with a NamedSharding so
        multi-chip runs keep the data sharded over the batch axis)."""
        n_train = int(np.asarray(data.x_train).shape[0])
        n_test = int(np.asarray(data.x_test).shape[0])
        if sharding is not None:
            n_dev = len(sharding.device_set)
            put = lambda a: jax.device_put(pad_rows(a, n_dev), sharding)
        else:
            put = jnp.asarray
        return cls(
            x_train=put(data.x_train),
            y_train=put(data.y_train),
            x_test=put(data.x_test),
            y_test=put(data.y_test),
            batch_size=batch_size,
            n_train=n_train,
            n_test=n_test,
        )

    @property
    def train_batches(self) -> int:
        return num_batches(self.n_train, self.batch_size)

    @property
    def test_batches(self) -> int:
        return num_batches(self.n_test, self.batch_size)
