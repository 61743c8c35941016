"""Whole-model A/B of the round-5 attention-kernel changes on the chip.

Times the steady-state epoch (bench.py's single-dispatch K-epoch scan
method) for the attention-family models under the kernel flags:

  RLT_ATTN_BF16   1 = bf16 operands ride the MXU natively (round 5)
                  0 = kernels cast everything to f32 internally (round 3/4)
  RLT_ATTN_PACKED 1 = head-packed kernels where packed_group_size applies
                      (round 5 extends this to dh=64 via 2-head groups)
                  0 = per-slice kernels

Both flags are read at TRACE time, so one process (one tunnel handshake)
measures every combination. The f32 lane only varies PACKED (BF16 is a
no-op on f32 inputs by construction — tests/test_ops_attention.py).

Decides VERDICT r4 ask #2 (attention customs at 20-35% of ceiling): the
headline target is mmoecut bf16 <= ~39 ms/epoch. Writes RESULTS_attn_ab_r5.json.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/attn_ab_r5.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import rlt_tpu

rlt_tpu.enable_compilation_cache()

from rlt_tpu import config as config_lib  # noqa: E402
from rlt_tpu.train import Trainer  # noqa: E402

sys.path.insert(0, "/root/repo")
from bench import time_epochs  # noqa: E402

# (model, compute_dtype, packed, bf16_kernels)
CASES = [
    # headline lane: all four combos
    ("mmoecut", "bfloat16", "1", "1"),
    ("mmoecut", "bfloat16", "1", "0"),
    ("mmoecut", "bfloat16", "0", "1"),
    ("mmoecut", "bfloat16", "0", "0"),   # round-4 configuration
    # f32 parity lane: does dh=64 packing pay without the bf16 rate?
    ("mmoecut", "float32", "1", "1"),
    ("mmoecut", "float32", "0", "1"),
    # monolithic attention models
    ("attncut", "float32", "1", "1"),
    ("attncut", "float32", "0", "1"),
    ("choopy", "bfloat16", "1", "1"),
    ("choopy", "bfloat16", "1", "0"),
    ("choopy", "float32", "1", "1"),     # round-4 default (packed, f32 math)
]


def main():
    # Pin the bf16-eval XLA routing OFF so the lanes measure ONLY the kernel
    # flags: the recorded RESULTS_attn_ab_r5.json rows predate that routing,
    # and without this a re-run's "packed=0 bf16=0" lane would no longer be
    # the round-4 program (review finding, round 5).
    os.environ.setdefault("RLT_ATTN_XLA_EVAL", "0")
    k_long = int(os.environ.get("AB_K", "11"))
    out_path = os.environ.get("AB_OUT", "RESULTS_attn_ab_r5.json")
    rows = []
    for model, dtype, packed, bf16k in CASES:
        os.environ["RLT_ATTN_PACKED"] = packed
        os.environ["RLT_ATTN_BF16"] = bf16k
        cfg = config_lib.apply_preset(config_lib.TrainConfig(
            model_name=model, dataset_name="drmm_tks", compute_dtype=dtype,
            log_dir="/tmp/rlt_tpu_ab_runs",
        ))
        t0 = time.time()
        trainer = Trainer(cfg)
        per_epoch, compile_s = time_epochs(trainer, k_long)
        row = {
            "model": model, "dtype": dtype, "packed": packed,
            "bf16_kernels": bf16k, "epoch_ms": round(per_epoch * 1e3, 3),
            "compile_s": round(compile_s, 1),
            "wall_s": round(time.time() - t0, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump({"k_long": k_long, "rows": rows}, f, indent=1)
        del trainer


if __name__ == "__main__":
    main()
