"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from rlt_tpu.parallel import batch_sharding, data_parallel_mesh, replicated


def cpu_devices():
    try:
        return jax.devices("cpu")
    except RuntimeError:
        return []


needs_multi_cpu = pytest.mark.skipif(
    len(cpu_devices()) < 8, reason="needs 8 virtual CPU devices"
)


@needs_multi_cpu
def test_mesh_and_shardings():
    mesh = data_parallel_mesh(8, devices=cpu_devices()[:8])
    assert mesh.devices.size == 8
    x = np.zeros((16, 4), np.float32)
    xs = jax.device_put(x, batch_sharding(mesh))
    assert xs.sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)
    p = jax.device_put(np.zeros((3,), np.float32), replicated(mesh))
    assert p.sharding.is_fully_replicated


@needs_multi_cpu
def test_dryrun_multichip_full_train_step():
    """The driver entry must be self-contained: no monkeypatching. Here the
    process already has 8 virtual CPU devices, so the in-process path runs;
    on a TPU-attached env it re-execs a forced-CPU child instead."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_mesh_refuses_silent_downscale():
    """Requesting more devices than the backend has must raise, never
    silently build a smaller mesh (a 1-chip host would otherwise 'pass'
    an 8-chip dryrun)."""
    with pytest.raises(ValueError, match="need 1024 devices"):
        data_parallel_mesh(1024)


@needs_multi_cpu
def test_sharded_train_step_hlo_has_gradient_all_reduce():
    """Math equality alone would also hold for a compilation that reshards
    everything to one device; inspect the compiled HLO and require a
    parameter-shaped all-reduce (the gradient psum over the data axis)."""
    import re

    import __graft_entry__ as ge

    step, state, x, y, mesh = ge.build_dryrun_step(8, cpu_devices()[:8])
    with mesh:
        txt = step.lower(state, x, y).compile().as_text()
    ar_lines = [l for l in txt.splitlines() if "all-reduce" in l]
    assert ar_lines, "no all-reduce in the compiled sharded train step"
    # at least one all-reduce must carry a non-scalar f32 operand (a grad
    # tensor); scalar-only all-reduces would just be the loss mean
    assert any(re.search(r"f32\[\d", l) for l in ar_lines), ar_lines[:5]


@needs_multi_cpu
def test_trainer_epoch_hlo_has_all_reduce():
    """Same check on the real Trainer epoch program (train.py's jitted
    epoch_fn) with a sharded dataset."""
    from rlt_tpu.config import TrainConfig
    from rlt_tpu.data import synthetic_dataset
    from rlt_tpu.train import Trainer

    mesh = data_parallel_mesh(8, devices=cpu_devices()[:8])
    cfg = TrainConfig(
        model_name="attncut", seq_len_override=16, input_size_override=3,
        synthetic_queries=40, batch_size=16, epochs=1,
        use_pallas=False, log_dir="/tmp/rlt_tpu_test_runs",
    )
    data = synthetic_dataset(num_queries=40, seq_len=16, num_features=3,
                             mean_relevant=4.0, seed=0)
    trainer = Trainer(cfg, data=data, sharding=batch_sharding(mesh))
    key = jax.random.PRNGKey(0)
    txt = trainer.epoch_fn.lower(trainer.state, trainer.data, key).compile().as_text()
    assert "all-reduce" in txt


def test_entry_forward_compiles():
    import __graft_entry__ as ge

    fn, (params, x) = ge.entry()
    out = jax.jit(fn)(params, x)
    assert len(out) == 3  # [class, rerank, cut]
    assert out[-1].shape == (63, 300, 1)
    np.testing.assert_allclose(
        np.asarray(out[-1]).sum(axis=1), 1.0, atol=1e-4
    )  # cut head is a distribution over positions


@needs_multi_cpu
def test_trainer_data_parallel_on_cpu_mesh():
    from rlt_tpu.config import TrainConfig
    from rlt_tpu.data import synthetic_dataset
    from rlt_tpu.parallel import batch_sharding, data_parallel_mesh
    from rlt_tpu.train import Trainer

    mesh = data_parallel_mesh(8, devices=cpu_devices()[:8])
    cfg = TrainConfig(
        model_name="attncut", seq_len_override=16, input_size_override=3,
        synthetic_queries=40, batch_size=16, epochs=2,
        use_pallas=False, log_dir="/tmp/rlt_tpu_test_runs",
    )
    data = synthetic_dataset(num_queries=40, seq_len=16, num_features=3,
                             mean_relevant=4.0, seed=0)
    trainer = Trainer(cfg, data=data, sharding=batch_sharding(mesh))
    summary = trainer.run()
    assert np.isfinite(summary["best_f1"])


@needs_multi_cpu
def test_data_parallel_matches_single_device():
    """Sharding the batch over the mesh must not change the math — same seed,
    same data => same epoch metrics (up to reduction-order noise)."""
    from rlt_tpu.config import TrainConfig
    from rlt_tpu.data import synthetic_dataset
    from rlt_tpu.parallel import batch_sharding, data_parallel_mesh
    from rlt_tpu.train import Trainer

    cfg = TrainConfig(
        model_name="attncut", seq_len_override=16, input_size_override=3,
        synthetic_queries=32, batch_size=16, epochs=3, dropout=0.0,
        use_pallas=False, log_dir="/tmp/rlt_tpu_test_runs",
    )
    data = synthetic_dataset(num_queries=32, seq_len=16, num_features=3,
                             mean_relevant=4.0, seed=0)
    single = Trainer(cfg, data=data).run()
    mesh = data_parallel_mesh(8, devices=cpu_devices()[:8])
    sharded = Trainer(cfg, data=data, sharding=batch_sharding(mesh)).run()
    assert abs(single["best_f1"] - sharded["best_f1"]) < 1e-4
    assert abs(single["best_dcg"] - sharded["best_dcg"]) < 1e-3
