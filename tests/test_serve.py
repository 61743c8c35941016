"""Serving daemon tests (rlt_tpu/serve.py) on tiny CPU shapes."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from rlt_tpu.config import TrainConfig
from rlt_tpu.serve import TruncationService, bucket_size, make_server


def tiny_cfg(model_name="attncut", **kw):
    return TrainConfig(model_name=model_name, seq_len_override=16,
                       input_size_override=3, use_pallas=False, **kw)


@pytest.fixture(scope="module")
def service():
    return TruncationService(tiny_cfg(), max_batch=8)


def test_bucket_size():
    assert [bucket_size(n, 8) for n in (1, 2, 3, 5, 8)] == [1, 2, 4, 8, 8]
    with pytest.raises(ValueError, match="exceeds max_batch"):
        bucket_size(9, 8)


def test_truncate_ragged_lists(service):
    rng = np.random.default_rng(0)
    body = {"features": [
        rng.normal(size=(16, 3)).tolist(),   # full length
        rng.normal(size=(5, 3)).tolist(),    # short: zero-padded, k clamped
        rng.normal(size=(11, 3)).tolist(),
    ]}
    out = service.truncate(body)
    assert len(out["k"]) == 3
    assert out["bucket"] == 4  # 3 lists -> power-of-two bucket
    for k, length in zip(out["k"], (16, 5, 11)):
        assert 1 <= k <= length


def test_truncate_matches_predictor(service):
    """The bucketed/padded service path must decode the same cuts as a direct
    full-batch Predictor call."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 16, 3)).astype(np.float32)
    direct = service.predictor.predict(x)
    out = service.truncate({"features": x.tolist()})
    np.testing.assert_array_equal(np.asarray(out["k"]), direct)


def test_distribution_sliced_to_true_length(service):
    rng = np.random.default_rng(2)
    body = {"features": [rng.normal(size=(7, 3)).tolist()],
            "return_distribution": True}
    out = service.truncate(body)
    assert len(out["distribution"]) == 1
    assert len(out["distribution"][0]) == 7  # sliced off the L=16 padding


def test_scores_shorthand_for_score_only_models():
    svc = TruncationService(
        TrainConfig(model_name="choopy", seq_len_override=16,
                    input_size_override=1, use_pallas=False), max_batch=4)
    out = svc.truncate({"scores": [[0.9, 0.5, 0.3, 0.1]]})
    assert len(out["k"]) == 1 and 1 <= out["k"][0] <= 4
    with pytest.raises(ValueError, match="send 'features'"):
        TruncationService(tiny_cfg(), max_batch=4).truncate(
            {"scores": [[0.9, 0.5]]})


def test_input_validation(service):
    with pytest.raises(ValueError, match="exceeds the model's seq_len"):
        service.truncate({"features": [np.zeros((17, 3)).tolist()]})
    with pytest.raises(ValueError, match="positions x"):
        service.truncate({"features": [np.zeros((4, 2)).tolist()]})
    with pytest.raises(ValueError, match="'features' or 'scores'"):
        service.truncate({})
    with pytest.raises(ValueError, match="exceeds max_batch"):
        service.truncate({"features": np.zeros((9, 4, 3)).tolist()})


def test_microbatch_coalesces_and_matches(service):
    """Concurrent requests through a micro-batching service must return the
    same cuts as sequential requests through a plain one, with fewer device
    dispatches than requests (proof the coalescing actually happened)."""
    from concurrent.futures import ThreadPoolExecutor

    svc = TruncationService(tiny_cfg(), max_batch=8, microbatch=True,
                            max_wait_ms=250.0)
    try:
        rng = np.random.default_rng(4)
        bodies = [{"features": [rng.normal(size=(16, 3)).tolist()]}
                  for _ in range(6)]
        # warm the compile outside the timed window so the co-arrival window
        # isn't consumed by the first trace (generous window: 1-core CI box)
        svc.truncate({"features": [np.zeros((16, 3)).tolist()]})
        base_dispatches = svc.dispatches
        with ThreadPoolExecutor(max_workers=6) as pool:
            outs = list(pool.map(svc.truncate, bodies))
        seq = [service.truncate(b) for b in bodies]
        assert [o["k"] for o in outs] == [s["k"] for s in seq]
        assert svc.dispatches - base_dispatches < 6  # coalesced
        assert svc.lists_served == 7
        stats = svc.stats()
        assert stats["dispatches"] == svc.dispatches
    finally:
        svc.close()


def test_microbatch_single_request_and_errors():
    """A lone request still completes within the wait window, and oversize
    batches are rejected before enqueueing."""
    svc = TruncationService(tiny_cfg(), max_batch=4, microbatch=True,
                            max_wait_ms=1.0)
    try:
        out = svc.truncate({"features": [np.zeros((5, 3)).tolist()]})
        assert len(out["k"]) == 1
        with pytest.raises(ValueError, match="exceeds max_batch"):
            svc.truncate({"features": np.zeros((5, 4, 3)).tolist()})
    finally:
        svc.close()
    with pytest.raises(RuntimeError, match="shutting down"):
        svc.truncate({"features": [np.zeros((5, 3)).tolist()]})


def test_http_roundtrip(service):
    server = make_server(service, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        health = json.load(urllib.request.urlopen(f"{base}/healthz"))
        assert health["ok"] and health["model"] == "attncut"

        rng = np.random.default_rng(3)
        payload = json.dumps(
            {"features": [rng.normal(size=(6, 3)).tolist()]}).encode()
        req = urllib.request.Request(f"{base}/truncate", data=payload,
                                     headers={"Content-Type": "application/json"})
        out = json.load(urllib.request.urlopen(req))
        assert len(out["k"]) == 1 and 1 <= out["k"][0] <= 6

        bad = urllib.request.Request(f"{base}/truncate", data=b'{"nope": 1}',
                                     headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad)
        assert e.value.code == 400

        stats = json.load(urllib.request.urlopen(f"{base}/stats"))
        assert stats["requests"] >= 1
        assert stats["latency_ms"]["p50"] is not None
    finally:
        server.shutdown()
        thread.join(timeout=5)
