"""Representation-probing modules (reference models/Probe.py, Classification.py,
Rerank.py) used by the verify_bmt / verify_probe scientific harnesses."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from rlt_tpu.models.layers import (
    LSTM,
    TorchLinear,
    TowerClass,
    TowerCut,
    TowerRerank,
    randn_init,
)
from rlt_tpu.models.mmoe import expert_stack


class ProbeBase(nn.Module):
    """A 2-expert MMOECut that also returns its intermediates
    (reference Probe.py:56-99): (experts_in, experts_o, final_output)."""

    seq_len: int = 300
    num_experts: int = 2
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
        )(experts_in, deterministic, dropout_rate)  # (E, B, L, D)

        batch = experts_in.shape[0]
        flat = experts_in.reshape(batch, -1)
        w_gates = self.param(
            "w_gates", randn_init(),
            (int(self.num_tasks), self.encoding_size * self.seq_len * 2, self.num_experts),
        )
        gates_o = nn.softmax(jnp.einsum("bf,tfe->tbe", flat, w_gates), axis=-1)
        towers = [
            TowerClass(name="tower_class"),
            TowerRerank(name="tower_rerank"),
            TowerCut(name="tower_cut"),
        ]
        final_output = [tower(experts_o, gates=gates_o[t])
                        for t, tower in enumerate(towers)]
        return experts_in, experts_o, final_output


class Probe(nn.Module):
    """Six probe towers (reference Probe.py:102-123): classification + rerank
    probes on the pre-encoding representation and on each expert's output."""

    encoding_size: int = 128
    d_model: int = 256

    @nn.compact
    def __call__(self, experts_in, experts_o):
        probe_c1 = TowerClass(name="probe_c1")(experts_in)
        probe_r1 = TowerRerank(name="probe_r1")(experts_in)
        probe_ce1 = TowerClass(name="probe_ce1")(experts_o[0])
        probe_ce2 = TowerClass(name="probe_ce2")(experts_o[1])
        probe_re1 = TowerRerank(name="probe_re1")(experts_o[0])
        probe_re2 = TowerRerank(name="probe_re2")(experts_o[1])
        return probe_c1, probe_r1, probe_ce1, probe_ce2, probe_re1, probe_re2


class TaskC(nn.Module):
    """Standalone classification head (reference Classification.py:3-13)."""

    @nn.compact
    def __call__(self, x):
        return jax.nn.sigmoid(TorchLinear(1, name="linear")(x))


class TaskR(nn.Module):
    """Standalone rerank head (reference Rerank.py:3-13)."""

    @nn.compact
    def __call__(self, x):
        return jax.nn.softmax(TorchLinear(1, name="linear")(x), axis=1)
