"""Pallas-vs-XLA attention timing on the real TPU chip.

Measures forward and forward+backward wall time for the attention shapes the
models actually run (Choopy models/Choopy.py:12 -> (63,8,300,16); AttnCut /
MMOE experts AttnCut.py:10-11, MMOECut.py:6-14 -> (63,4,300,64); mq2007
variants at L=40), with and without softmax-weight dropout. Writes one JSON
record per (shape, mode, path) to RESULTS_attention.json — the numbers that
decide the training-path gating in models/layers.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_attention.py
  [--group N]   force the per-program slice group (A/B the grid-overhead
                amortization against the auto picker; --group 1 reproduces
                the round-1 one-program-per-slice grid)
  [--out FILE]  write records somewhere other than RESULTS_attention.json
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

from rlt_tpu.ops import attention as _attention
from rlt_tpu.ops.attention import (
    fused_attention,
    fused_attention_packed,
    packed_group_size,
    xla_attention,
)

SHAPES = {
    "choopy_robust04": (63, 8, 300, 16),
    "attncut_robust04": (63, 4, 300, 64),
    "choopy_mq2007": (63, 8, 40, 16),
    "attncut_mq2007": (63, 4, 40, 64),
}
DROPOUT = 0.1
WARMUP, ITERS = 10, 400  # 400 on-device iterations per dispatch: even a
# 10 us kernel accumulates ~4 ms, well above tunnel dispatch jitter


def timeit(fn, q, k, v):
    """Per-iteration device time: ITERS chained applications inside one
    jitted lax.scan (the output feeds back as q, forcing sequential
    execution), so tunnel dispatch latency is paid once, not per iteration."""

    def chain(first):
        @jax.jit
        def many(q, k, v):
            def body(c, _):
                out = fn(c, k, v)
                nxt = out[0] if isinstance(out, tuple) else out
                return nxt, ()
            c, _ = jax.lax.scan(body, q, None, length=ITERS if not first else 1)
            # scalar result: sync by FETCHING it — jax.block_until_ready can
            # return prematurely through the axon tunnel for Pallas-bearing
            # programs; device_get of real bytes cannot
            return jnp.mean(c)
        return many

    one, many = chain(True), chain(False)
    for f in (one, many):  # compile both
        jax.device_get(f(q, k, v))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(one(q, k, v))
        t1 = time.perf_counter()
        jax.device_get(many(q, k, v))
        t2 = time.perf_counter()
        # subtract the single-iteration dispatch+run from the ITERS-run
        best = min(best, ((t2 - t1) - (t1 - t0)) / (ITERS - 1))
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=0,
                    help="force the per-program slice group (0 = auto picker)")
    ap.add_argument("--out", type=str, default="RESULTS_attention.json")
    ap.add_argument("--packed-only", action="store_true",
                    help="measure only the head-packed variant + fwd "
                         "baselines on 128-lane shapes")
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="operand dtype for every path (bf16 exercises the "
                         "native-MXU kernel math, VERDICT r4 ask #2a)")
    args = ap.parse_args()
    if args.group:
        _attention._pick_group = lambda n, L, live_mats, _g=args.group: (
            _g if n % _g == 0 else 1)
    try:
        from rlt_tpu import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    records = []
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    for name, shape in SHAPES.items():
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, shape, jnp.float32).astype(dtype)
                   for kk in ks)
        seed = jnp.asarray([42], jnp.int32)
        rng = jax.random.PRNGKey(7)
        w = jax.random.normal(jax.random.PRNGKey(9), shape,
                              jnp.float32).astype(dtype)

        cases = {}
        if args.packed_only:
            if shape[1] * shape[3] != 128:
                continue
            cases[("fwd", "pallas")] = jax.jit(
                lambda q, k, v: fused_attention(q, k, v))
            cases[("fwd", "xla")] = jax.jit(
                lambda q, k, v: xla_attention(q, k, v))
            cases[("fwdbwd", "pallas")] = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(fused_attention(q, k, v) * w),
                argnums=(0, 1, 2)))
            cases[("fwdbwd", "xla")] = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(xla_attention(q, k, v) * w),
                argnums=(0, 1, 2)))
            cases[("fwdbwd_dropout", "pallas")] = jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(fused_attention(
                    q, k, v, dropout_rate=DROPOUT, seed=seed) * w),
                argnums=(0, 1, 2)))
        pack = packed_group_size(shape[1] * shape[3], shape[1])
        if pack is not None and shape[2] >= 128:
            # head-packed variant (VERDICT r3 ask #4; grouped dh=64 packing
            # r4 ask #2b): packed (B, L, D) layout, per-group full-depth
            # contraction matmuls traded for pack x MACs
            bsz, heads, sl, dh = shape
            pq, pk, pv = (a.transpose(0, 2, 1, 3).reshape(bsz, sl, heads * dh)
                          for a in (q, k, v))
            pw = w.transpose(0, 2, 1, 3).reshape(bsz, sl, heads * dh)
            packed_cases = {
                "fwd": jax.jit(functools.partial(
                    fused_attention_packed, heads=heads, pack=pack)),
                "fwd_dropout": jax.jit(functools.partial(
                    fused_attention_packed, heads=heads, pack=pack,
                    dropout_rate=DROPOUT, seed=seed)),
                "fwdbwd": jax.jit(jax.grad(
                    lambda q, k, v: jnp.sum(
                        fused_attention_packed(q, k, v, heads=heads,
                                               pack=pack) * pw),
                    argnums=(0, 1, 2))),
                "fwdbwd_dropout": jax.jit(jax.grad(
                    lambda q, k, v: jnp.sum(fused_attention_packed(
                        q, k, v, heads=heads, pack=pack, dropout_rate=DROPOUT,
                        seed=seed) * pw),
                    argnums=(0, 1, 2))),
            }
            for mode, fn in packed_cases.items():
                ms = timeit(fn, pq, pk, pv)
                records.append({"shape_name": name, "shape": list(shape),
                                "mode": mode, "path": "packed",
                                "ms": round(ms, 4)})
                print(f"{name:18s} {mode:15s} packed {ms:8.3f} ms")
        if args.packed_only:
            by_mode = {}
            for (mode, path), fn in cases.items():
                ms = timeit(fn, q, k, v)
                records.append({"shape_name": name, "shape": list(shape),
                                "mode": mode, "path": path,
                                "ms": round(ms, 4)})
                print(f"{name:18s} {mode:15s} {path:6s} {ms:8.3f} ms")
            continue
        cases = {
            ("fwd", "pallas"): jax.jit(lambda q, k, v: fused_attention(q, k, v)),
            ("fwd", "xla"): jax.jit(lambda q, k, v: xla_attention(q, k, v)),
            ("fwd_dropout", "pallas"): jax.jit(
                lambda q, k, v: fused_attention(q, k, v, dropout_rate=DROPOUT, seed=seed)
            ),
            ("fwd_dropout", "xla"): jax.jit(
                lambda q, k, v: xla_attention(q, k, v, DROPOUT, rng)
            ),
            ("fwdbwd", "pallas"): jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(fused_attention(q, k, v) * w), argnums=(0, 1, 2)
            )),
            ("fwdbwd", "xla"): jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(xla_attention(q, k, v) * w), argnums=(0, 1, 2)
            )),
            ("fwdbwd_dropout", "pallas"): jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(
                    fused_attention(q, k, v, dropout_rate=DROPOUT, seed=seed) * w
                ), argnums=(0, 1, 2)
            )),
            ("fwdbwd_dropout", "xla"): jax.jit(jax.grad(
                lambda q, k, v: jnp.sum(xla_attention(q, k, v, DROPOUT, rng) * w),
                argnums=(0, 1, 2)
            )),
        }
        by_mode = {}
        for (mode, path), fn in cases.items():
            ms = timeit(fn, q, k, v)
            by_mode.setdefault(mode, {})[path] = ms
            records.append({"shape_name": name, "shape": list(shape),
                            "mode": mode, "path": path, "ms": round(ms, 4)})
            print(f"{name:18s} {mode:15s} {path:6s} {ms:8.3f} ms")
        for mode, d in by_mode.items():
            if "pallas" in d and "xla" in d:
                print(f"{name:18s} {mode:15s} speedup xla/pallas = "
                      f"{d['xla'] / d['pallas']:.2f}x")
    for r in records:
        r["dtype"] = args.dtype
    with open(args.out, "w") as f:
        json.dump({"device": str(dev.device_kind), "dropout": DROPOUT,
                   "warmup": WARMUP, "iters": ITERS, "dtype": args.dtype,
                   "forced_group": args.group or None, "records": records}, f,
                  indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
