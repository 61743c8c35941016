"""Ahead-of-time serving export: compile once, serve from a saved artifact.

The reference never leaves the training process (run.py decodes cuts inside
its eval loop, run.py:131-142). A TPU serving deployment wants the opposite:
trace + lower the predictor ONCE, bake the trained weights into the program
as constants, and ship a self-contained StableHLO artifact that a serving
host can load and execute without the model code, the checkpoint, or a
retrace — `jax.export` is the idiomatic mechanism.

An export bundle is a directory:

    manifest.json        model/shape/dtype metadata + the exported buckets
    b<B>.stablehlo       one serialized `jax.export.Exported` per batch size

Each bucket is the full predictor (params baked in) at one static batch
size, mirroring the power-of-two bucketing the HTTP server uses
(rlt_tpu/serve.py) — XLA compiles per shape, so serving wants a small fixed
set of shapes. `load_exported` returns an `ExportedPredictor` with the same
`predict` / `predict_with_distribution` surface as `rlt_tpu.infer.Predictor`,
so `rlt_tpu.serve.TruncationService` can serve straight from a bundle
(`python -m rlt_tpu.serve --exported <dir>`).

Pallas note: kernels lower to `tpu_custom_call`, which carries no cross-
release compatibility guarantee, so exporting a Pallas-bearing predictor
requires explicitly waiving that check; we do, and record it in the
manifest (`custom_calls_waived`). Artifacts exported on one platform only
run on that platform (`manifest["platforms"]`).

CLI:
    python -m rlt_tpu.export --model-name attncut --model-path ck.msgpack \
        --out bundles/attncut --batch-sizes 1,8,64,256
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

MANIFEST = "manifest.json"
FORMAT_VERSION = 1


def _export_one(predict_fn, params, batch: int, seq_len: int, input_size: int,
                platforms=None):
    """Export `predict_fn(params, x)` at one static batch size with the
    params closed over (baked into the artifact as constants).

    `platforms` enables cross-platform lowering: pass ("tpu",) on a CPU
    build host to emit an artifact that runs only on TPU serving hosts —
    the deployment split jax.export exists for."""
    fn = jax.jit(lambda x: predict_fn(params, x))
    spec = jax.ShapeDtypeStruct((batch, seq_len, input_size), jnp.float32)
    kw = {} if platforms is None else {"platforms": list(platforms)}
    try:
        return jax_export.export(fn, **kw)(spec), False
    except ValueError as e:
        if "custom call" not in str(e).lower():
            raise
        # Pallas kernels lower to tpu_custom_call, which has no stability
        # guarantee; waive the check knowingly and record it in the manifest
        waive = jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call")
        return jax_export.export(fn, disabled_checks=[waive], **kw)(spec), True


def save_exported(out_dir: str, predictor, batch_sizes=(1, 8, 64, 256),
                  platforms=None) -> dict:
    """Export `predictor` (rlt_tpu.infer.Predictor) at each batch size and
    write the bundle to `out_dir`. Returns the manifest dict.

    `platforms`: target platform list for cross-platform lowering (e.g.
    ("tpu",) from a CPU build host); None exports for the current backend."""
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")
    os.makedirs(out_dir, exist_ok=True)
    cfg = predictor.cfg
    waived = False
    exported_platforms = None
    for b in batch_sizes:
        exp, w = _export_one(predictor._predict, predictor.params, b,
                             cfg.seq_len, cfg.input_size, platforms)
        waived = waived or w
        exported_platforms = list(exp.platforms)
        with open(os.path.join(out_dir, f"b{b}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
    manifest = {
        "format_version": FORMAT_VERSION,
        "model_name": cfg.model_name,
        "seq_len": cfg.seq_len,
        "input_size": cfg.input_size,
        "compute_dtype": cfg.compute_dtype,
        "batch_sizes": batch_sizes,
        "platforms": exported_platforms,
        "custom_calls_waived": waived,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedPredictor:
    """Serving-side view of a bundle: same predict surface as
    `rlt_tpu.infer.Predictor`, but executing deserialized AOT artifacts —
    no model code, checkpoint, or retrace involved."""

    def __init__(self, manifest: dict, buckets: dict):
        self.manifest = manifest
        self._buckets = dict(sorted(buckets.items()))
        # Exported.call is traceable; jit it so repeated serving calls hit
        # the executable cache instead of re-lowering per request
        self._calls = {b: jax.jit(e.call) for b, e in self._buckets.items()}

    @property
    def model_name(self) -> str:
        return self.manifest["model_name"]

    @property
    def seq_len(self) -> int:
        return int(self.manifest["seq_len"])

    @property
    def input_size(self) -> int:
        return int(self.manifest["input_size"])

    @property
    def max_batch(self) -> int:
        return max(self._buckets)

    def bucket_for(self, n: int) -> int:
        """Smallest exported bucket >= n (the shape that will execute)."""
        for b in self._buckets:
            if b >= n:
                return b
        raise ValueError(
            f"batch of {n} exceeds the largest exported bucket "
            f"{self.max_batch}; re-export with a larger batch size")

    def predict_with_distribution(self, x):
        """(B, L, F) features -> ((B,) 1-based cuts, cut distributions)."""
        x = np.asarray(x, np.float32)
        n = x.shape[0]
        b = self.bucket_for(n)
        if b > n:
            x = np.concatenate([x, np.zeros((b - n,) + x.shape[1:], x.dtype)])
        ks, dist = self._calls[b](jnp.asarray(x))
        return np.asarray(ks)[:n], np.asarray(dist)[:n]

    def predict(self, x) -> np.ndarray:
        return self.predict_with_distribution(x)[0]


def load_exported(bundle_dir: str) -> ExportedPredictor:
    """Load a bundle written by `save_exported`.

    Fails fast (rather than at first request) if the bundle was lowered for
    a platform the current host cannot execute."""
    with open(os.path.join(bundle_dir, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"bundle {bundle_dir}: format_version "
            f"{manifest.get('format_version')} != {FORMAT_VERSION}")
    have = {d.platform for d in jax.devices()} | {jax.default_backend()}
    want = {p.lower() for p in manifest.get("platforms") or []}
    if want and not (want & {h.lower() for h in have}):
        raise ValueError(
            f"bundle {bundle_dir} was exported for platforms "
            f"{sorted(want)} but this host has {sorted(have)}; re-export "
            f"with --platforms {','.join(sorted(have))} or serve on the "
            f"target platform")
    buckets = {}
    for b in manifest["batch_sizes"]:
        with open(os.path.join(bundle_dir, f"b{b}.stablehlo"), "rb") as f:
            buckets[int(b)] = jax_export.deserialize(bytearray(f.read()))
    return ExportedPredictor(manifest, buckets)


def main(argv=None):
    import argparse

    from rlt_tpu.config import TrainConfig
    from rlt_tpu.infer import Predictor

    p = argparse.ArgumentParser(description="rlt_tpu AOT serving export")
    p.add_argument("--model-name", type=str, default="attncut")
    p.add_argument("--model-path", type=str, default=None,
                   help="checkpoint from training (--model-persist)")
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--compute-dtype", type=str, default="float32",
                   choices=("float32", "bfloat16"))
    p.add_argument("--batch-sizes", type=str, default="1,8,64,256")
    p.add_argument("--platforms", type=str, default=None,
                   help="comma-separated target platforms for cross-platform "
                   "lowering (e.g. 'tpu' to build a TPU serving artifact "
                   "from a CPU host); default: the current backend")
    p.add_argument("--out", type=str, required=True, help="bundle directory")
    p.add_argument("--check", action="store_true",
                   help="reload the bundle and verify it matches the live "
                   "predictor on a random batch")
    args = p.parse_args(argv)

    cfg = TrainConfig(model_name=args.model_name, model_path=args.model_path,
                      retrieve_data=args.retrieve_data,
                      compute_dtype=args.compute_dtype)
    predictor = Predictor(cfg)
    sizes = [int(s) for s in args.batch_sizes.split(",") if s]
    platforms = args.platforms.split(",") if args.platforms else None
    manifest = save_exported(args.out, predictor, sizes, platforms=platforms)
    print(json.dumps(manifest))
    if args.check:
        loaded = load_exported(args.out)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(min(sizes), cfg.seq_len, cfg.input_size))
        x = x.astype(np.float32)
        np.testing.assert_array_equal(loaded.predict(x), predictor.predict(x))
        print(json.dumps({"check": "ok"}))


if __name__ == "__main__":
    main()
