"""Mixture-of-experts truncation models: MMOECut (SOTA), MOECut, PLECut.

Contracts follow reference models/MMOECut.py:56-110, MOECut.py:56-109,
PLECut.py:56-104. TPU-first differences from the torch implementation:

* the E experts (1-layer transformer encoders) run as one stacked computation
  via `nn.vmap` over an expert axis instead of a python list of modules —
  XLA sees a single (E, B, L, D) batch of attention/FF matmuls,
* the per-task gates — torch does `experts_in.reshape(B, -1) @ g` per task in
  a loop — are a single einsum (B, F) x (T, F, E) -> (T, B, E) against one
  stacked randn gate tensor (F = 2 * 128 * L, the flattened BiLSTM output;
  this shape-specializes the model to L exactly as the reference does,
  MMOECut.py:68),
* expert mixing happens in tower-LOGIT space (layers._tower_logits): the
  towers' heads are affine and the gates softmax-normalize to 1, so
  sum_e g_e tower_linear(X_e) == tower_linear(sum_e g_e X_e) exactly — the
  reference's (B, L, D) mixed activations (broadcast-expand + sum,
  MMOECut.py:101-102) never materialize, forward or backward.
  RLT_MMOE_LOGIT_MIX=0 restores the activation-space einsum mix
  (T, B, E) x (E, B, L, D) -> (T, B, L, D) for A/B re-measurement.

Note: these experts are dense-activated (every expert runs for every input) —
this is NOT sparse-MoE routing, so no expert parallelism / all-to-all is
needed (SURVEY §5.8).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from rlt_tpu.models.layers import (
    LSTM,
    TowerClass,
    TowerCut,
    TowerRerank,
    TransformerEncoder,
    randn_init,
)


class Expert(nn.Module):
    """One expert: a 1-layer transformer encoder (reference MMOECut.py:6-14)."""

    d_model: int = 256
    n_head: int = 4
    num_layers: int = 1
    dropout: float = 0.2
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        return TransformerEncoder(
            self.d_model, self.n_head, self.num_layers, dropout=self.dropout,
            use_pallas=self.use_pallas, name="attention_layer",
        )(x, deterministic, dropout_rate)


def expert_stack(num_experts: int, **expert_kwargs):
    """E experts as one vmapped module: input broadcast, outputs stacked on
    a leading expert axis -> (E, B, L, D)."""
    return nn.vmap(
        Expert,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(None, None, None),
        out_axes=0,
        axis_size=num_experts,
    )(**expert_kwargs, name="experts")


def make_towers(num_tasks: float, d_model: int):
    """Tower selection per num_tasks (reference MMOECut.py:69-84)."""
    if num_tasks == 3:
        return [
            TowerClass(name="tower_class"),
            TowerRerank(name="tower_rerank"),
            TowerCut(name="tower_cut"),
        ]
    if num_tasks == 2.1:
        return [TowerClass(name="tower_class"), TowerCut(name="tower_cut")]
    return [TowerRerank(name="tower_rerank"), TowerCut(name="tower_cut")]


class MMOECut(nn.Module):
    """Multi-gate mixture-of-experts (reference MMOECut.py:56-110)."""

    seq_len: int = 300
    num_experts: int = 3
    num_tasks: float = 3
    input_size: int = 3
    encoding_size: int = 128
    d_model: int = 256
    n_head: int = 4
    num_layers: int = 1
    dropout: float = 0.2
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        experts_in = LSTM(self.encoding_size, 2, use_pallas=self.use_pallas,
                          name="pre_encoding")(x)  # (B, L, 2H)
        experts_o = expert_stack(
            self.num_experts, d_model=self.d_model, n_head=self.n_head,
            num_layers=self.num_layers, dropout=self.dropout, use_pallas=self.use_pallas,
        )(experts_in, deterministic, dropout_rate)  # (E, B, L, D)

        batch = experts_in.shape[0]
        flat = experts_in.reshape(batch, -1)  # (B, 2*H*L)
        n_gates = int(self.num_tasks)
        w_gates = self.param(
            "w_gates", randn_init(),
            (n_gates, self.encoding_size * self.seq_len * 2, self.num_experts),
        )
        gates_o = nn.softmax(jnp.einsum("bf,tfe->tbe", flat, w_gates), axis=-1)
        towers = make_towers(self.num_tasks, self.d_model)
        # mix happens inside the tower head (layers._tower_logits — logit
        # space by default, activation space under RLT_MMOE_LOGIT_MIX=0)
        return [tower(experts_o, gates=gates_o[t])
                for t, tower in enumerate(towers)]


class MOECut(nn.Module):
    """Single shared gate ablation (reference MOECut.py:56-109)."""

    seq_len: int = 300
    num_experts: int = 3
    num_tasks: float = 3
    input_size: int = 3
    encoding_size: int = 128
    d_model: int = 256
    n_head: int = 4
    num_layers: int = 1
    dropout: float = 0.2
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        experts_in = LSTM(self.encoding_size, 2, use_pallas=self.use_pallas,
                          name="pre_encoding")(x)
        experts_o = expert_stack(
            self.num_experts, d_model=self.d_model, n_head=self.n_head,
            num_layers=self.num_layers, dropout=self.dropout, use_pallas=self.use_pallas,
        )(experts_in, deterministic, dropout_rate)

        batch = experts_in.shape[0]
        flat = experts_in.reshape(batch, -1)
        w_gates = self.param(
            "w_gates", randn_init(),
            (self.encoding_size * self.seq_len * 2, self.num_experts),
        )
        gates_o = nn.softmax(flat @ w_gates, axis=-1)  # (B, E)
        towers = make_towers(self.num_tasks, self.d_model)
        return [tower(experts_o, gates=gates_o) for tower in towers]


class PLECut(nn.Module):
    """PLE-style expert-subset gating ablation (reference PLECut.py:56-104):
    task1 mixes experts {0,1}, task2 mixes {1,2}, task3 mixes all 3; fixed
    three towers; n_head defaults to 2."""

    seq_len: int = 300
    num_experts: int = 3
    input_size: int = 3
    encoding_size: int = 128
    d_model: int = 256
    n_head: int = 2
    num_layers: int = 1
    dropout: float = 0.1
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, dropout_rate=None):
        experts_in = LSTM(self.encoding_size, 2, use_pallas=self.use_pallas,
                          name="pre_encoding")(x)
        experts_o = expert_stack(
            self.num_experts, d_model=self.d_model, n_head=self.n_head,
            num_layers=self.num_layers, dropout=self.dropout, use_pallas=self.use_pallas,
        )(experts_in, deterministic, dropout_rate)  # (3, B, L, D)

        batch = experts_in.shape[0]
        flat = experts_in.reshape(batch, -1)
        feat = self.encoding_size * self.seq_len * 2
        subsets = (experts_o[0:2], experts_o[1:3], experts_o)
        towers = [
            TowerClass(name="tower_class"),
            TowerRerank(name="tower_rerank"),
            TowerCut(name="tower_cut"),
        ]
        outputs = []
        for t, (subset, tower) in enumerate(zip(subsets, towers)):
            w = self.param(f"w_gate_{t}", randn_init(), (feat, subset.shape[0]))
            gate = nn.softmax(flat @ w, axis=-1)  # (B, E_t)
            outputs.append(tower(subset, gates=gate))
        return outputs
