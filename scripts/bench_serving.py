"""TPU serving latency under concurrent load (VERDICT r2 ask #7).

Drives the HTTP daemon (rlt_tpu/serve.py) on the real chip across the
configuration grid {live, exported AOT} x {microbatch on, off}, firing
single-list POST /truncate requests from N concurrent client threads for a
fixed duration, then records BOTH the server-side /stats percentiles
(per-request wall inside the service, 1024-sample window) and client-side
end-to-end percentiles, plus the dispatches-vs-requests coalescing ratio.

Single-list requests are the adversarial case for a single chip: without
micro-batching every request pays its own device dispatch; with it,
co-arriving requests coalesce into one padded dispatch (serve.py
_coalesce_loop). The reference has no serving surface (SURVEY §7 framework
mandate; BASELINE.md ranked-lists/sec reporting).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serving.py \
      [--model choopy] [--retrieve-data robust04] [--threads 8]
      [--duration 20] [--out RESULTS_serving.json]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def wait_healthy(base: str, deadline_s: float = 900.0) -> dict:
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        try:
            with urllib.request.urlopen(f"{base}/healthz", timeout=5) as r:
                return json.load(r)
        except Exception:
            time.sleep(2.0)
    raise TimeoutError(f"server at {base} never became healthy")


def fire_load(base: str, scores: list, threads: int, duration_s: float):
    """N threads of back-to-back single-list requests; returns client-side
    per-request latencies (seconds) and error count."""
    payload = json.dumps({"scores": [scores]}).encode()
    latencies: list[float] = []
    errors = [0]
    lock = threading.Lock()
    stop = time.time() + duration_s

    def worker():
        mine = []
        while time.time() < stop:
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(
                    f"{base}/truncate", data=payload,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=30) as r:
                    r.read()
                mine.append(time.perf_counter() - t0)
            except Exception:
                with lock:
                    errors[0] += 1
        with lock:
            latencies.extend(mine)

    ts = [threading.Thread(target=worker) for _ in range(threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    return latencies, errors[0]


def pct(sorted_vals, q):
    if not sorted_vals:
        return None
    i = min(len(sorted_vals) - 1, int(q * len(sorted_vals)))
    return sorted_vals[i]


def run_config(name: str, serve_args: list[str], port: int, scores: list,
               threads: int, duration_s: float) -> dict:
    base = f"http://127.0.0.1:{port}"
    proc = subprocess.Popen(
        [sys.executable, "-m", "rlt_tpu.serve", "--port", str(port),
         "--warmup", *serve_args],
        cwd=REPO, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        health = wait_healthy(base)
        # warm the serving path (first request may still trace a bucket)
        fire_load(base, scores, threads=2, duration_s=2.0)
        with urllib.request.urlopen(f"{base}/stats") as r:
            pre = json.load(r)
        lat, errs = fire_load(base, scores, threads, duration_s)
        with urllib.request.urlopen(f"{base}/stats") as r:
            post = json.load(r)
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
    lat.sort()
    reqs = post["requests"] - pre["requests"]
    disps = post["dispatches"] - pre["dispatches"]
    out = {
        "config": name,
        "serve_args": serve_args,
        "model": health.get("model"),
        "threads": threads,
        "duration_s": duration_s,
        "requests": reqs,
        "errors": errs,
        "throughput_rps": round(len(lat) / duration_s, 1),
        "dispatches": disps,
        "coalescing_ratio": round(reqs / disps, 2) if disps else None,
        "client_ms": {
            "p50": round(1e3 * pct(lat, 0.50), 2) if lat else None,
            "p90": round(1e3 * pct(lat, 0.90), 2) if lat else None,
            "p99": round(1e3 * pct(lat, 0.99), 2) if lat else None,
        },
        "server_stats": post,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "server_stats"}),
          flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="choopy")
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--threads", type=int, default=8)
    p.add_argument("--duration", type=float, default=20.0)
    p.add_argument("--port", type=int, default=18411)
    p.add_argument("--skip-exported", action="store_true")
    p.add_argument("--skip-live", action="store_true")
    p.add_argument("--out", type=str, default="RESULTS_serving.json")
    args = p.parse_args()

    seq_len = 300 if args.retrieve_data == "robust04" else 40
    scores = [0.9 - 0.9 * i / seq_len for i in range(seq_len)]
    live = ["--model-name", args.model, "--retrieve-data", args.retrieve_data]

    results = []
    if not args.skip_live:
        results.append(run_config(
            "live", live, args.port, scores, args.threads, args.duration))
        results.append(run_config(
            "live+microbatch", [*live, "--microbatch"], args.port + 1,
            scores, args.threads, args.duration))

    if not args.skip_exported:
        bundle = "/tmp/rlt_tpu_serving_bundle"
        subprocess.run(
            [sys.executable, "-m", "rlt_tpu.export", "--model-name",
             args.model, "--retrieve-data", args.retrieve_data,
             "--batch-sizes", "1,8,64", "--out", bundle],
            cwd=REPO, check=True, stdout=subprocess.DEVNULL)
        exported = ["--exported", bundle]
        results.append(run_config(
            "exported", exported, args.port + 2, scores, args.threads,
            args.duration))
        results.append(run_config(
            "exported+microbatch", [*exported, "--microbatch"],
            args.port + 3, scores, args.threads, args.duration))

    try:
        with open(args.out) as f:
            prev = json.load(f).get("configs", [])
    except (FileNotFoundError, json.JSONDecodeError):
        prev = []
    names = {r["config"] for r in results}
    merged = [r for r in prev if r["config"] not in names] + results
    with open(args.out, "w") as f:
        json.dump({"model": args.model, "retrieve_data": args.retrieve_data,
                   "threads": args.threads, "duration_s": args.duration,
                   "configs": merged}, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
