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
from rlt_tpu.models import build_model, is_multi_head
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
        use_pallas = cfg.use_pallas and pallas_supported()
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
                if loaded is None:
                    # never silently serve random weights when the caller
                    # asked for a trained checkpoint (a mistyped path would
                    # otherwise report plausible-looking cuts)
                    raise FileNotFoundError(
                        f"--model-path {cfg.model_path!r}: no loadable "
                        "checkpoint found; refusing to serve untrained weights"
                    )
                params = loaded
        self.params = params

        model_name = cfg.model_name
        # serving mixed precision mirrors train.py:146: bf16 matmul inputs,
        # decode/distribution back in f32 (measured 1.1-1.6x per epoch with
        # convergence parity — RESULTS.md "bfloat16 compute path")
        cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        @jax.jit
        def _predict(params, x):
            if cdtype is not None:
                cast = lambda a: a.astype(cdtype) if a.dtype == jnp.float32 else a
                params = jax.tree.map(cast, params)
                x = x.astype(cdtype)
            output = self.model.apply({"params": params}, x, deterministic=True)
            if cdtype is not None:
                to32 = lambda a: a.astype(jnp.float32)
                output = ([to32(o) for o in output]
                          if isinstance(output, (list, tuple)) else to32(output))
            ks = decode_ks(model_name, output)
            cut = output[-1] if is_multi_head(model_name) else output
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
        """Steady-state inference ranked-lists/sec at the given batch size.

        Chains `iters` forward passes through a carry inside ONE jitted
        lax.scan and synchronizes by fetching real bytes: block_until_ready
        can return prematurely through the tunneled TPU backend for
        Pallas-bearing programs (RESULTS.md "Timing methodology"), and a
        per-dispatch python loop measures tunnel round trips, not device
        time."""
        x = jnp.zeros((batch_size, self.cfg.seq_len, self.cfg.input_size), jnp.float32)
        predict = self._predict

        @functools.partial(jax.jit, static_argnames="n")
        def chained(params, x, n):
            def body(acc, _):
                ks, _dist = predict(params, x + acc * 0.0)
                return jnp.float32(jnp.sum(ks)) * 1e-9, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return acc

        np.asarray(jax.device_get(chained(self.params, x, 1)))       # compile both
        np.asarray(jax.device_get(chained(self.params, x, iters)))   # lengths + warm
        t0 = time.perf_counter()
        np.asarray(jax.device_get(chained(self.params, x, 1)))
        t1 = time.perf_counter()
        np.asarray(jax.device_get(chained(self.params, x, iters)))
        t2 = time.perf_counter()
        per_batch = ((t2 - t1) - (t1 - t0)) / (iters - 1)
        return batch_size / max(per_batch, 1e-9)


def main(argv=None):
    """CLI: predict cut positions for a dataset's test split.

    The reference has no inference entry point; this serves the trained
    checkpoints it produces. Loads reference-layout pkls when --dataset-base
    is given, else the calibrated synthetic corpus."""
    import argparse
    import json

    from rlt_tpu.data import load_pkl_dataset, synthetic_dataset
    from rlt_tpu.data.datasets import synthetic_config
    from rlt_tpu.utils import metrics as metrics_lib

    p = argparse.ArgumentParser(description="rlt_tpu truncation inference")
    p.add_argument("--model-name", type=str, default="attncut")
    p.add_argument("--model-path", type=str, default=None,
                   help="checkpoint from training (--model-persist)")
    p.add_argument("--dataset-base", type=str, default=None)
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--dataset-name", type=str, default="drmm_tks")
    p.add_argument("--throughput", action="store_true",
                   help="also report steady-state ranked-lists/sec")
    p.add_argument("--compute-dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"),
                   help="serve with bf16 matmul inputs (faster on the MXU)")
    p.add_argument("--out", type=str, default=None, help="write JSON here")
    args = p.parse_args(argv)

    cfg = TrainConfig(model_name=args.model_name, model_path=args.model_path,
                      retrieve_data=args.retrieve_data,
                      dataset_name=args.dataset_name,
                      dataset_base=args.dataset_base,
                      compute_dtype=args.compute_dtype)
    from rlt_tpu.config import loader_family

    family = loader_family(cfg.model_name, cfg.retrieve_data)
    if cfg.dataset_base:
        data = load_pkl_dataset(cfg.dataset_base, cfg.retrieve_data,
                                cfg.dataset_name, family)
    else:
        data = synthetic_dataset(
            num_queries=cfg.synthetic_queries, seq_len=cfg.seq_len,
            num_features=cfg.input_size, seed=cfg.seed,
            **synthetic_config(cfg.retrieve_data, cfg.dataset_name))

    predictor = Predictor(cfg)
    ks = predictor.predict(np.asarray(data.x_test))
    y = jnp.asarray(data.y_test)
    result = {
        "model": cfg.model_name,
        "n_lists": int(ks.shape[0]),
        "cuts": ks.tolist(),
        "test_f1": float(metrics_lib.f1_at_k(y, jnp.asarray(ks))),
        "test_dcg": float(metrics_lib.dcg_at_k(y, jnp.asarray(ks))),
    }
    if args.throughput:
        result["ranked_lists_per_sec"] = predictor.throughput()
    print(json.dumps({k: v for k, v in result.items() if k != "cuts"}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
