"""On-chip correctness check of the round-5 attention kernel paths.

Interpret-mode tests (tests/test_ops_attention.py) validate the kernel MATH;
this validates the MOSAIC LOWERING on the real TPU: compares the per-slice
and packed kernels (f32 and bf16, dropout off) against on-chip XLA attention
at the exact production shapes, fwd and grads, and cross-checks a short real
mmoecut bf16 training run packed-vs-per-slice for convergence agreement.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/attn_correctness_tpu.py
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

import rlt_tpu

rlt_tpu.enable_compilation_cache()

from rlt_tpu.ops.attention import (fused_attention,  # noqa: E402
                                   fused_attention_packed, packed_group_size,
                                   xla_attention)

SHAPES = {
    "choopy_robust04": (63, 8, 300, 16),
    "attncut_robust04": (63, 4, 300, 64),
}


def check_shape(name, shape, dtype):
    B, H, L, dh = shape
    d = H * dh
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32).astype(dtype)
               for kk in ks)
    w = jax.random.normal(jax.random.PRNGKey(9), shape,
                          jnp.float32).astype(dtype)
    ref = np.asarray(jax.device_get(
        jax.jit(xla_attention)(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32))))
    tol = 3e-2 if dtype == jnp.bfloat16 else 3e-5
    out = {}

    # per-slice kernel
    got = np.asarray(jax.device_get(
        jax.jit(fused_attention)(q, k, v)), np.float32)
    out["slice_fwd_maxerr"] = float(np.abs(got - ref).max())

    g_ref = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(xla_attention(q, k, v)
                                * w.astype(jnp.float32)),
        argnums=(0, 1, 2)))(q.astype(jnp.float32), k.astype(jnp.float32),
                            v.astype(jnp.float32))
    g_got = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum((fused_attention(q, k, v)
                                 * w).astype(jnp.float32)),
        argnums=(0, 1, 2)))(q, k, v)
    out["slice_grad_maxerr"] = float(max(
        np.abs(np.asarray(a, np.float32) - np.asarray(b)).max()
        for a, b in zip(jax.device_get(g_got), jax.device_get(g_ref))))

    # packed kernel (grouped where applicable)
    pack = packed_group_size(d, H)
    if pack is not None:
        def packf(a):
            return a.transpose(0, 2, 1, 3).reshape(B, L, d)

        pq, pk, pv, pw = (packf(a) for a in (q, k, v, w))
        got_p = np.asarray(jax.device_get(jax.jit(
            lambda q, k, v: fused_attention_packed(q, k, v, heads=H,
                                                   pack=pack))(pq, pk, pv)),
            np.float32)
        ref_p = ref.transpose(0, 2, 1, 3).reshape(B, L, d)
        out["packed_pack"] = pack
        out["packed_fwd_maxerr"] = float(np.abs(got_p - ref_p).max())

        gp = jax.jit(jax.grad(
            lambda q, k, v: jnp.sum((fused_attention_packed(
                q, k, v, heads=H, pack=pack) * pw).astype(jnp.float32)),
            argnums=(0, 1, 2)))(pq, pk, pv)
        gr = [np.asarray(a).transpose(0, 2, 1, 3).reshape(B, L, d)
              for a in jax.device_get(g_ref)]
        out["packed_grad_maxerr"] = float(max(
            np.abs(np.asarray(a, np.float32) - b).max()
            for a, b in zip(jax.device_get(gp), gr)))

    out["tol"] = tol
    errs = {kk: vv for kk, vv in out.items() if kk.endswith("maxerr")}
    out["ok"] = all(vv <= (10 * tol if "grad" in kk else tol)
                    for kk, vv in errs.items())
    print(name, dtype.__name__ if hasattr(dtype, "__name__") else str(dtype),
          json.dumps(out), flush=True)
    return out


def train_check():
    """100-epoch mmoecut bf16: packed vs per-slice best-F1 must agree to
    seed-noise level (different dropout bitstreams, same distribution)."""
    import dataclasses

    from rlt_tpu import config as config_lib
    from rlt_tpu.train import Trainer

    outs = {}
    for packed in ("1", "0"):
        os.environ["RLT_ATTN_PACKED"] = packed
        cfg = config_lib.apply_preset(config_lib.TrainConfig(
            model_name="mmoecut", dataset_name="drmm_tks", epochs=100,
            compute_dtype="bfloat16", log_dir="/tmp/rlt_tpu_ab_runs"))
        summary = Trainer(cfg).run()
        outs[f"packed_{packed}"] = {k: round(float(summary[k]), 5)
                                    for k in ("best_f1", "best_dcg",
                                              "best5_f1")}
        print("train", packed, json.dumps(outs[f"packed_{packed}"]),
              flush=True)
    return outs


def main():
    results = {"op": {}}
    for name, shape in SHAPES.items():
        for dtype in (jnp.float32, jnp.bfloat16):
            key = f"{name}_{np.dtype(dtype).name}"
            results["op"][key] = check_shape(name, shape, dtype)
    results["train"] = train_check()
    with open("RESULTS_attn_correctness_r5.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"wrote": "RESULTS_attn_correctness_r5.json"}))


if __name__ == "__main__":
    main()
