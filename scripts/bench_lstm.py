"""Pallas-fused-vs-lax.scan LSTM timing on the real TPU chip.

Level 1: the isolated recurrence (post input-projection) at the exact shapes
the models run — (L=300, B=64, H=128) for robust04, (L=40, ...) for mq2007 —
forward and forward+backward. Level 2: whole-model steady-state epoch time
(train scan + test scan, bench.py methodology) for the LSTM-heavy models with
all Pallas kernels on vs off.

Writes RESULTS_lstm.json. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_lstm.py
"""

from __future__ import annotations

import dataclasses
import json
import time

import jax
import jax.numpy as jnp

from rlt_tpu import enable_compilation_cache

enable_compilation_cache()

from rlt_tpu.ops.lstm import fused_lstm, fused_lstm_bidir  # noqa: E402

ITERS = 200
SHAPES = {"robust04": (300, 64, 128), "mq2007": (40, 64, 128)}


def scan_lstm(xw, w_hh_t, unroll=1):
    batch, hidden = xw.shape[1], w_hh_t.shape[0]

    def step(carry, x_t):
        h, c = carry
        gates = x_t + h @ w_hh_t
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((batch, hidden), xw.dtype),
            jnp.zeros((batch, hidden), xw.dtype))
    _, ys = jax.lax.scan(step, init, xw, unroll=unroll)
    return ys


def timeit(step_fn, carry0):
    """ITERS applications chained through the carry inside ONE jitted scan,
    synced by device_get (block_until_ready lies through the tunnel)."""

    def chain(n):
        @jax.jit
        def many(c0):
            c, _ = jax.lax.scan(lambda c, _: (step_fn(c), ()), c0, None,
                                length=n)
            return jnp.mean(c)
        return many

    one, many = chain(1), chain(ITERS)
    for f in (one, many):
        jax.device_get(f(carry0))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(one(carry0))
        t1 = time.perf_counter()
        jax.device_get(many(carry0))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (ITERS - 1))
    return best * 1e3  # ms


def isolated(records):
    for name, (length, batch, hidden) in SHAPES.items():
        xw = jax.random.normal(jax.random.PRNGKey(0),
                               (length, batch, 4 * hidden), jnp.float32)
        w_hh_t = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                         (hidden, 4 * hidden), jnp.float32)
        probe = jax.random.normal(jax.random.PRNGKey(2),
                                  (length, batch, hidden), jnp.float32)

        def fwd_case(fn):
            # feed the (L, B, H) output back into the (L, B, 4H) input
            return lambda c: jnp.tile(fn(c, w_hh_t), (1, 1, 4))

        def bwd_case(fn):
            grad = jax.grad(lambda c: jnp.sum(fn(c, w_hh_t) * probe))
            return lambda c: 0.5 * c + 0.5 * grad(c)

        # BiLSTM layer comparison: the reverse direction's second weight
        # matrix, and both-directions variants that consume the same xw
        # (fine for timing: identical shapes/dependencies as the real layer)
        w_hh_t2 = 0.1 * jax.random.normal(jax.random.PRNGKey(3),
                                          (hidden, 4 * hidden), jnp.float32)

        def two_seq(c, w):
            return fused_lstm(c, w) + fused_lstm(jnp.flip(c, 0), w_hh_t2)

        def one_bidir(c, w):
            hf, hr = fused_lstm_bidir(c, jnp.flip(c, 0), w, w_hh_t2)
            return hf + hr

        def two_scans(c, w):
            return scan_lstm(c, w) + scan_lstm(jnp.flip(c, 0), w_hh_t2)

        cases = {
            ("fwd", "pallas"): fwd_case(fused_lstm),
            ("fwd", "xla_scan"): fwd_case(scan_lstm),
            ("fwdbwd", "pallas"): bwd_case(fused_lstm),
            ("fwdbwd", "xla_scan"): bwd_case(scan_lstm),
            ("bidir_fwd", "pallas_2seq"): fwd_case(two_seq),
            ("bidir_fwd", "pallas_bidir"): fwd_case(one_bidir),
            ("bidir_fwd", "xla_scan"): fwd_case(two_scans),
            ("bidir_fwdbwd", "pallas_2seq"): bwd_case(two_seq),
            ("bidir_fwdbwd", "pallas_bidir"): bwd_case(one_bidir),
            ("bidir_fwdbwd", "xla_scan"): bwd_case(two_scans),
        }
        by_mode = {}
        for (mode, path), fn in cases.items():
            ms = timeit(fn, xw)
            by_mode.setdefault(mode, {})[path] = ms
            records.append({"level": "op", "shape_name": name,
                            "shape": [length, batch, hidden], "mode": mode,
                            "path": path, "ms": round(ms, 4)})
            print(f"{name:10s} {mode:13s} {path:12s} {ms:8.3f} ms", flush=True)
        for mode, d in by_mode.items():
            if "pallas" in d:
                print(f"{name:10s} {mode:13s} speedup scan/pallas = "
                      f"{d['xla_scan'] / d['pallas']:.2f}x", flush=True)
            if "pallas_bidir" in d:
                print(f"{name:10s} {mode:13s} bidir-fused vs 2-seq = "
                      f"{d['pallas_2seq'] / d['pallas_bidir']:.2f}x, "
                      f"vs scan = {d['xla_scan'] / d['pallas_bidir']:.2f}x",
                      flush=True)


def model_level(records):
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import time_epochs

    from rlt_tpu import config as config_lib
    from rlt_tpu.train import Trainer

    for model in ("bicut", "attncut", "mmoecut"):
        times = {}
        for pallas in (True, False):
            cfg = config_lib.apply_preset(config_lib.TrainConfig(
                model_name=model, dataset_name="drmm_tks",
                use_pallas=pallas))
            per_epoch, compile_s = time_epochs(Trainer(cfg), k_long=21)
            times[pallas] = per_epoch
            records.append({"level": "model", "model": model,
                            "pallas": pallas,
                            "epoch_ms": round(per_epoch * 1e3, 3),
                            "compile_s": round(compile_s, 2)})
            print(f"{model:10s} pallas={pallas} epoch "
                  f"{per_epoch * 1e3:8.3f} ms (compile {compile_s:.0f}s)",
                  flush=True)
        print(f"{model:10s} epoch speedup = {times[False] / times[True]:.2f}x",
              flush=True)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    records = []
    isolated(records)
    model_level(records)
    with open("RESULTS_lstm.json", "w") as f:
        json.dump({"device": str(dev.device_kind), "iters": ITERS,
                   "records": records}, f, indent=1)
    print("wrote RESULTS_lstm.json")


if __name__ == "__main__":
    main()
