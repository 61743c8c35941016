"""AOT serving-export tests (rlt_tpu/export.py) on tiny CPU shapes.

The bundle must be self-contained: cuts from a reloaded artifact must match
the live Predictor exactly, and distributions to float tolerance (the weights
are baked into the StableHLO as constants, but XLA may fuse the deserialized
module differently than the live trace, so ~1 ulp drift is expected), across
bucket padding and for both single-head and multi-task/bicut output
conventions."""

import json
import os

import numpy as np
import pytest

from rlt_tpu.config import TrainConfig
from rlt_tpu.export import load_exported, save_exported
from rlt_tpu.infer import Predictor
from rlt_tpu.serve import TruncationService


def tiny_cfg(model_name="attncut", **kw):
    return TrainConfig(model_name=model_name, seq_len_override=16,
                       input_size_override=3, use_pallas=False, **kw)


@pytest.fixture(scope="module")
def bundle(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bundle") / "attncut")
    predictor = Predictor(tiny_cfg())
    manifest = save_exported(out, predictor, batch_sizes=(2, 4))
    return out, predictor, manifest


def test_manifest_contents(bundle):
    out, predictor, manifest = bundle
    assert manifest["model_name"] == "attncut"
    assert manifest["seq_len"] == 16 and manifest["input_size"] == 3
    assert manifest["batch_sizes"] == [2, 4]
    on_disk = json.load(open(os.path.join(out, "manifest.json")))
    assert on_disk == manifest
    for b in (2, 4):
        assert os.path.exists(os.path.join(out, f"b{b}.stablehlo"))


def test_roundtrip_matches_live_predictor(bundle):
    out, predictor, _ = bundle
    loaded = load_exported(out)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 3)).astype(np.float32)
    np.testing.assert_array_equal(loaded.predict(x), predictor.predict(x))
    ks, dist = loaded.predict_with_distribution(x)
    ks2, dist2 = predictor.predict_with_distribution(x)
    np.testing.assert_array_equal(ks, ks2)
    np.testing.assert_allclose(dist, dist2, rtol=1e-5, atol=1e-7)


def test_bucket_padding(bundle):
    """A batch of 3 rides the 4-bucket; pad rows must not leak into results."""
    out, predictor, _ = bundle
    loaded = load_exported(out)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 16, 3)).astype(np.float32)
    ks = loaded.predict(x)
    assert ks.shape == (3,)
    np.testing.assert_array_equal(ks, predictor.predict(x))
    with pytest.raises(ValueError, match="largest exported bucket"):
        loaded.predict(rng.normal(size=(5, 16, 3)).astype(np.float32))


def test_multitask_and_bicut_exports(tmp_path):
    """Multi-head output lists (mmoecut) and the (B, L, 2) bicut convention
    must survive export unchanged."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 3)).astype(np.float32)
    for name in ("mmoecut", "bicut"):
        predictor = Predictor(tiny_cfg(name))
        out = str(tmp_path / name)
        save_exported(out, predictor, batch_sizes=(2,))
        loaded = load_exported(out)
        ks, dist = loaded.predict_with_distribution(x)
        ks2, dist2 = predictor.predict_with_distribution(x)
        np.testing.assert_array_equal(ks, ks2)
        np.testing.assert_allclose(dist, dist2, rtol=1e-5, atol=1e-7)


def test_service_serves_from_bundle(bundle):
    """TruncationService over an ExportedPredictor: same cuts as the live
    service, through the ragged/bucketed HTTP-facing path."""
    out, predictor, manifest = bundle
    loaded = load_exported(out)
    cfg = TrainConfig(model_name=manifest["model_name"],
                      seq_len_override=manifest["seq_len"],
                      input_size_override=manifest["input_size"])
    svc = TruncationService(cfg, max_batch=4, predictor=loaded)
    live = TruncationService(tiny_cfg(), max_batch=4)
    rng = np.random.default_rng(3)
    body = {"features": [rng.normal(size=(11, 3)).tolist(),
                         rng.normal(size=(16, 3)).tolist(),
                         rng.normal(size=(7, 3)).tolist()]}
    assert svc.truncate(body)["k"] == live.truncate(body)["k"]
    # the service defers bucket choice to the bundle's fixed bucket list:
    # a single list rides the smallest exported bucket (2), not power-of-two 1
    one = svc.truncate({"features": [rng.normal(size=(5, 3)).tolist()]})
    assert one["bucket"] == 2


def test_cross_platform_export_for_tpu(tmp_path):
    """A CPU build host can lower a TPU-only artifact (the deployment split
    jax.export exists for); loading it back on this CPU host must fail fast
    with the platform-mismatch message, not at first request."""
    predictor = Predictor(tiny_cfg())
    out = str(tmp_path / "tpu_bundle")
    manifest = save_exported(out, predictor, batch_sizes=(2,),
                             platforms=("tpu",))
    assert manifest["platforms"] == ["tpu"]
    with pytest.raises(ValueError, match="exported for platforms"):
        load_exported(out)


def test_explicit_platform_roundtrip(bundle, tmp_path):
    """platforms=('cpu',) on a CPU host behaves exactly like the default."""
    _, predictor, _ = bundle
    out = str(tmp_path / "cpu_bundle")
    save_exported(out, predictor, batch_sizes=(2,), platforms=("cpu",))
    loaded = load_exported(out)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 16, 3)).astype(np.float32)
    np.testing.assert_array_equal(loaded.predict(x), predictor.predict(x))


def test_format_version_guard(bundle, tmp_path):
    out, _, manifest = bundle
    bad = dict(manifest, format_version=999)
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    (bad_dir / "manifest.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="format_version"):
        load_exported(str(bad_dir))
