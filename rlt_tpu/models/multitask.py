"""Shared-bottom multi-task models: MtChoopy, MtAttnCut.

Contracts follow reference models/MtChoopy.py:5-32 and models/MtAttnCut.py:4-29:
the single-task trunk plus three heads — `classi` Linear+sigmoid, `rerank`
plain Linear (no softmax), `decision` Linear+softmax over positions — with
num_tasks in {3, 2.1, 2.2} selecting which heads are returned:
  3   -> [class, rerank, cut]
  2.1 -> [class, cut]
  2.2 -> [rerank, cut]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rlt_tpu.models.layers import LSTM, TorchLinear, TransformerEncoder, randn_init


def select_heads(y_class, y_rerank, y_cut, num_tasks: float):
    if num_tasks == 3:
        return [y_class, y_rerank, y_cut]
    if num_tasks == 2.1:
        return [y_class, y_cut]
    return [y_rerank, y_cut]


class _MtHeads(nn.Module):
    @nn.compact
    def __call__(self, x):
        y_class = jax.nn.sigmoid(TorchLinear(1, name="classi")(x))
        y_rerank = TorchLinear(1, name="rerank")(x)
        y_cut = jax.nn.softmax(TorchLinear(1, name="decision")(x), axis=1)
        return y_class, y_rerank, y_cut


class MtChoopy(nn.Module):
    seq_len: int = 300
    d_model: int = 128
    n_head: int = 8
    num_layers: int = 3
    num_tasks: float = 3
    dropout: float = 0.4
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        pe = self.param("position_encoding", randn_init(), (self.seq_len, self.d_model - 1))
        pe = jnp.broadcast_to(pe, (x.shape[0], self.seq_len, self.d_model - 1))
        x = jnp.concatenate([x, pe], axis=2)
        x = TransformerEncoder(
            self.d_model, self.n_head, self.num_layers, dropout=self.dropout,
            use_pallas=self.use_pallas, name="encoding_layer",
        )(x, deterministic, dropout_rate)
        return select_heads(*_MtHeads(name="heads")(x), self.num_tasks)


class MtAttnCut(nn.Module):
    input_size: int = 3
    d_model: int = 256
    n_head: int = 4
    num_layers: int = 1
    num_tasks: float = 3
    dropout: float = 0.4
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        x = LSTM(128, 2, use_pallas=self.use_pallas, name="pre_encoding")(x)
        x = TransformerEncoder(
            self.d_model, self.n_head, self.num_layers, dropout=self.dropout,
            use_pallas=self.use_pallas, name="encoding_layer",
        )(x, deterministic, dropout_rate)
        return select_heads(*_MtHeads(name="heads")(x), self.num_tasks)
