"""Benchmark: MMOECut end-to-end training throughput on one chip.

Reference baseline (BASELINE.md): the reference trains MMOECut on robust04
(~200 train queries, batch 63 -> 4 steps/epoch, plus one test pass) at
~27 s/epoch on CPU (logs/mmoecut.log epochs 0-2). Here a full epoch (train
scan + test scan) is one jitted XLA program; we measure steady-state epoch
time and report ranked-lists/sec of training throughput.

Prints ONE JSON line: metric/value/unit/vs_baseline (+detail fields).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import numpy as np

# persistent compilation cache: first-ever compile of the epoch program through
# the TPU tunnel is slow (~15 min); cached reruns start in seconds.
os.makedirs("/tmp/rlt_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rlt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_EPOCH_SECONDS = 27.0  # logs/mmoecut.log epochs 0-2
# the first ~10 dispatches through the axon tunnel are ramp-dominated
# (~90 ms each, RESULTS.md); the metric is steady-state epoch time, so warm
# up past the ramp before timing
WARMUP_EPOCHS = 12
MEASURE_EPOCHS = 50


def main(quick: bool = False) -> None:
    measure_epochs = 3 if quick else MEASURE_EPOCHS
    from rlt_tpu import config as config_lib
    from rlt_tpu.train import Trainer

    cfg = config_lib.TrainConfig(model_name="mmoecut", dataset_name="drmm_tks")
    cfg = config_lib.apply_preset(cfg)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu:
        cfg = dataclasses.replace(cfg, use_pallas_attention=False)

    trainer = Trainer(cfg)
    data = trainer.data
    key = jax.random.PRNGKey(123)

    # warmup: compile + settle
    state = trainer.state
    for _ in range(WARMUP_EPOCHS):
        key, sub = jax.random.split(key)
        state, metrics = trainer.epoch_fn(state, data, sub)
    jax.block_until_ready(metrics)

    start = time.perf_counter()
    for _ in range(measure_epochs):
        key, sub = jax.random.split(key)
        state, metrics = trainer.epoch_fn(state, data, sub)
    jax.block_until_ready(metrics)
    elapsed = time.perf_counter() - start

    epoch_time = elapsed / measure_epochs
    # lists processed per epoch: every train row once + every test row once
    lists_per_epoch = data.n_train + data.n_test
    lists_per_sec = lists_per_epoch / epoch_time

    # serving-side throughput on the trained params
    model = trainer.model
    params = state.params
    infer_batch = 256
    x_inf = jax.numpy.zeros((infer_batch, cfg.seq_len, cfg.input_size), jax.numpy.float32)

    @jax.jit
    def infer(params, x):
        return model.apply({"params": params}, x, deterministic=True)[-1]

    out = infer(params, x_inf)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        out = infer(params, x_inf)
    jax.block_until_ready(out)
    infer_lists_per_sec = infer_batch * iters / (time.perf_counter() - t0)
    print(json.dumps({
        "metric": "mmoecut_train_epoch_time",
        "value": round(epoch_time, 6),
        "unit": "s/epoch",
        "vs_baseline": round(REFERENCE_EPOCH_SECONDS / epoch_time, 2),
        "detail": {
            "backend": jax.default_backend(),
            "ranked_lists_per_sec": round(lists_per_sec, 1),
            "infer_lists_per_sec": round(infer_lists_per_sec, 1),
            "n_train": int(data.n_train),
            "n_test": int(data.n_test),
            "batch_size": int(data.batch_size),
            "measure_epochs": measure_epochs,
            "projected_100_epoch_train_minutes": round(epoch_time * 100 / 60, 3),
            "last_test_f1": float(np.asarray(metrics["test_f1"])),
        },
    }))


if __name__ == "__main__":
    import sys

    main(quick="--quick" in sys.argv)
