"""Verification-harness smoke tests (reference verify_BMT.py / verify_probe.py)
on tiny shapes."""

import numpy as np
import pytest

from rlt_tpu.config import TrainConfig
from rlt_tpu.data import synthetic_dataset


def tiny_cfg(**kw):
    base = dict(
        model_name="attncut", seq_len_override=12, input_size_override=3,
        synthetic_queries=20, batch_size=8, epochs=2,
        use_pallas=False, log_dir="/tmp/rlt_tpu_test_runs",
        lr=1e-3, weight_decay=0.0,
    )
    base.update(kw)
    return TrainConfig(**base)


@pytest.mark.parametrize("verify_type", ["c", "r"])
def test_verify_bmt_raw_features(verify_type):
    from rlt_tpu.verify_bmt import run_verification

    cfg = tiny_cfg()
    record = run_verification(cfg, verify_type=verify_type, ft=False)
    assert len(record) == cfg.epochs
    assert all(np.isfinite(record))
    if verify_type == "c":
        assert all(0.0 <= m <= 1.0 for m in record)


@pytest.mark.parametrize("model_name", ["attncut", "choopy"])
def test_verify_bmt_frozen_trunk(model_name):
    from rlt_tpu.verify_bmt import run_verification

    cfg = tiny_cfg(
        model_name=model_name,
        input_size_override=1 if model_name == "choopy" else 3,
        epochs=1,
    )
    record = run_verification(cfg, verify_type="c", ft=True)
    assert len(record) == 1 and np.isfinite(record[0])


def test_probe_trainer_two_phases(tmp_path):
    from rlt_tpu.verify_probe import ProbeTrainer

    cfg = tiny_cfg(model_name="probe_base", save_path=str(tmp_path))
    trainer = ProbeTrainer(cfg, epochs_base=1, epochs_probe=2)
    curves = trainer.run(ft=False)
    assert len(curves) == 2
    per_step = np.asarray(curves[0])
    assert per_step.shape[1] == 6  # six probes logged per step
    assert np.all(np.isfinite(per_step))
    assert len(trainer.f1_record) == 1


def test_train_persist_then_probe_frozen_trunk(tmp_path):
    """End-to-end: train attncut with model_persist, reload the best
    checkpoint as the frozen trunk for verification (reference flow:
    run.py:203-214 -> verify_BMT.py:133-137)."""
    from rlt_tpu.data import synthetic_dataset
    from rlt_tpu.train import Trainer
    from rlt_tpu.verify_bmt import run_verification

    cfg = tiny_cfg(model_persist=True, save_path=str(tmp_path), epochs=2)
    data = synthetic_dataset(num_queries=cfg.synthetic_queries,
                             seq_len=cfg.seq_len, num_features=cfg.input_size,
                             mean_relevant=4.0, seed=0)
    Trainer(cfg, data=data).run()

    probe_cfg = tiny_cfg(epochs=1, model_path=str(tmp_path / "attncut"))
    record = run_verification(probe_cfg, verify_type="c", ft=True, data=data)
    assert np.isfinite(record[0])
