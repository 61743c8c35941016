"""Single-task truncation models: BiCut, Choopy, AttnCut.

Architectural contracts (exact layer shapes) follow the reference:
  BiCut   — models/Bicut.py:5-21   BiLSTM(F->128x2, 2 layers) -> Linear 256->256
            -> ReLU -> Linear 256->2 -> Dropout -> softmax over the decision
            pair; output (B, L, 2) of per-position {truncate, continue}.
  Choopy  — models/Choopy.py:6-23  learnable randn positional encoding (L, 127)
            concatenated with the score -> d_model=128 -> 3-layer 8-head
            TransformerEncoder -> Linear -> softmax over positions.
  AttnCut — models/AttnCut.py:5-20 BiLSTM(F->128x2) -> 1-layer 4-head
            d_model=256 TransformerEncoder -> Linear -> softmax over positions.
"""

from __future__ import annotations

import jax
from flax import linen as nn
import jax.numpy as jnp

from rlt_tpu.models.layers import (
    LSTM,
    Dropout,
    TorchLinear,
    TransformerEncoder,
    randn_init,
)


class BiCut(nn.Module):
    input_size: int = 3
    lstm_hidden_size: int = 128
    lstm_layers: int = 2
    fc_dimensions: int = 256
    dropout: float = 0.4
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        x = LSTM(self.lstm_hidden_size, self.lstm_layers,
                 use_pallas=self.use_pallas, name="bilstm")(x)
        x = TorchLinear(self.fc_dimensions, name="fc")(x)
        x = nn.relu(x)
        x = TorchLinear(2, name="decision")(x)
        # the reference applies Dropout to the logits, before the softmax
        x = Dropout(self.dropout)(x, deterministic, dropout_rate)
        return jax.nn.softmax(x, axis=2)


class Choopy(nn.Module):
    seq_len: int = 300
    d_model: int = 128
    n_head: int = 8
    num_layers: int = 3
    dropout: float = 0.2
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        pe = self.param("position_encoding", randn_init(), (self.seq_len, self.d_model - 1))
        pe = jnp.broadcast_to(pe, (x.shape[0], self.seq_len, self.d_model - 1))
        x = jnp.concatenate([x, pe], axis=2)
        x = TransformerEncoder(
            self.d_model, self.n_head, self.num_layers, dropout=self.dropout,
            use_pallas=self.use_pallas, name="attention_layer",
        )(x, deterministic, dropout_rate)
        logits = TorchLinear(1, name="decision")(x)
        return jax.nn.softmax(logits, axis=1)


class AttnCut(nn.Module):
    input_size: int = 3
    d_model: int = 256
    n_head: int = 4
    num_layers: int = 1
    dropout: float = 0.4
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        x = LSTM(128, 2, use_pallas=self.use_pallas, name="encoding_layer")(x)
        x = TransformerEncoder(
            self.d_model, self.n_head, self.num_layers, dropout=self.dropout,
            use_pallas=self.use_pallas, name="attention_layer",
        )(x, deterministic, dropout_rate)
        logits = TorchLinear(1, name="decision")(x)
        return jax.nn.softmax(logits, axis=1)
