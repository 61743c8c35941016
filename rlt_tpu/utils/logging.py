"""Observability (reference run.py:19,111,146-156,196-198 tensorboardX wiring).

The reference logs scalars to tensorboardX with tags train/..., test/....
Here the primary sink is an append-only JSONL scalar stream (cheap, diffable,
no dependency) with the same tag vocabulary; if tensorboardX (or torch's
SummaryWriter) is importable it is mirrored there too, so `tensorboard
--logdir` keeps working for reference users."""

from __future__ import annotations

import json
import os
import time


def _try_summary_writer(log_dir: str):
    try:
        from tensorboardX import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir=log_dir)
    except Exception:
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore
        return SummaryWriter(log_dir=log_dir)
    except Exception:
        return None


class MetricsWriter:
    """Per-epoch scalar logging: JSONL + optional tensorboard mirror."""

    TAGS = {
        "train_loss": "train/loss_epoch", "train_f1": "train/F1_epoch",
        "train_dcg": "train/DCG_epoch", "test_loss": "test/loss_epoch",
        "test_f1": "test/F1_epoch", "test_dcg": "test/DCG_epoch",
    }

    def __init__(self, log_dir: str, run_name: str = "run", tensorboard: bool = True):
        self.dir = os.path.join(log_dir, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "metrics.jsonl")
        self._file = open(self.path, "a", buffering=1)
        self._tb = _try_summary_writer(self.dir) if tensorboard else None

    @staticmethod
    def _safe(v: float):
        """JSON has no Infinity/NaN tokens; map them to None."""
        v = float(v)
        return v if v == v and abs(v) != float("inf") else None

    def log(self, epoch: int, metrics: dict) -> None:
        row = {"epoch": epoch, "time": time.time()}
        row.update({k: self._safe(v) for k, v in metrics.items()})
        self._file.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for key, value in metrics.items():
                self._tb.add_scalar(self.TAGS.get(key, key), float(value), epoch)

    def log_step(self, step: int, tag: str, value: float) -> None:
        """Per-step scalar (reference run.py:146 'train/loss_step')."""
        self._file.write(json.dumps({"step": step, tag: value}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def log_summary(self, summary: dict) -> None:
        self._file.write(json.dumps(
            {"summary": {k: self._safe(v) for k, v in summary.items()}}) + "\n")

    def close(self) -> None:
        self._file.close()
        if self._tb is not None:
            self._tb.close()
