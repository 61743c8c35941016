"""Batched inference / serving path.

The reference has no inference entry point (truncation happens inside the
training loop's decode, run.py:131-142). For production serving the framework
exposes a jitted predictor: params + (B, L, F) features -> per-list cut
positions (and optionally the full cut distribution), with a micro-benchmark
for ranked-lists/sec. Static batch shape; ragged tails are padded and masked
by the caller (see rlt_tpu.data.batching)."""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from rlt_tpu.config import TrainConfig
from rlt_tpu.models import build_model
from rlt_tpu.train import decode_ks
from rlt_tpu.utils.checkpoint import load_params
from rlt_tpu.utils.platform import pallas_supported


class Predictor:
    """Jitted truncation predictor for one model family."""

    def __init__(self, cfg: TrainConfig, params=None):
        if cfg.model_name == "probe_base":
            # ProbeBase returns (experts_in, experts_o, final_output) for the
            # probing harness — it has no cut-inference contract; probe it
            # through rlt_tpu.verify_probe instead (reference Probe.py:99)
            raise ValueError("probe_base is a probing vehicle, not an "
                             "inference model; use rlt_tpu.verify_probe")
        self.cfg = cfg
        use_pallas = cfg.use_pallas_attention and pallas_supported()
        self.model = build_model(
            cfg.model_name, seq_len=cfg.seq_len, input_size=cfg.input_size,
            dropout=cfg.dropout, num_tasks=cfg.num_tasks,
            use_pallas=use_pallas,
        )
        if params is None:
            key = jax.random.PRNGKey(cfg.seed)
            sample = jnp.zeros((1, cfg.seq_len, cfg.input_size), jnp.float32)
            params = self.model.init({"params": key, "dropout": key}, sample)["params"]
            if cfg.model_path:
                loaded = load_params(cfg.model_path, like=params)
                if loaded is not None:
                    params = loaded
        self.params = params

        model_name = cfg.model_name

        @jax.jit
        def _predict(params, x):
            output = self.model.apply({"params": params}, x, deterministic=True)
            ks = decode_ks(model_name, output)
            cut = output[-1] if "m" in model_name else output
            if model_name == "bicut":
                cut_dist = output  # (B, L, 2) decision probabilities
            else:
                cut_dist = cut[..., 0] if cut.ndim == 3 else cut
            return ks, cut_dist

        self._predict = _predict

    def predict(self, x) -> np.ndarray:
        """(B, L, F) features -> (B,) 1-based cut positions."""
        ks, _ = self._predict(self.params, jnp.asarray(x))
        return np.asarray(ks)

    def predict_with_distribution(self, x):
        ks, dist = self._predict(self.params, jnp.asarray(x))
        return np.asarray(ks), np.asarray(dist)

    def throughput(self, batch_size: int = 256, iters: int = 50) -> float:
        """Steady-state inference ranked-lists/sec at the given batch size."""
        x = jnp.zeros((batch_size, self.cfg.seq_len, self.cfg.input_size), jnp.float32)
        ks, _ = self._predict(self.params, x)
        jax.block_until_ready(ks)
        start = time.perf_counter()
        for _ in range(iters):
            ks, _ = self._predict(self.params, x)
        jax.block_until_ready(ks)
        return batch_size * iters / (time.perf_counter() - start)
