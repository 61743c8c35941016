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
    import __graft_entry__ as ge

    # route the dryrun onto the CPU mesh explicitly
    old = jax.config.jax_default_device
    try:
        jax.config.update("jax_default_device", cpu_devices()[0])
        import rlt_tpu.parallel as parallel_pkg
        from rlt_tpu.parallel import mesh as mesh_lib

        orig = mesh_lib.data_parallel_mesh

        def cpu_mesh(n_devices=None, devices=None):
            return orig(n_devices, devices=cpu_devices()[: (n_devices or 8)])

        # dryrun_multichip resolves `from rlt_tpu.parallel import
        # data_parallel_mesh` at call time, i.e. the PACKAGE attribute —
        # patch both bindings or the patch is dead code on a TPU-attached env
        mesh_lib.data_parallel_mesh = cpu_mesh
        parallel_pkg.data_parallel_mesh = cpu_mesh
        try:
            ge.dryrun_multichip(8)
        finally:
            mesh_lib.data_parallel_mesh = orig
            parallel_pkg.data_parallel_mesh = orig
    finally:
        jax.config.update("jax_default_device", old)


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
        use_pallas_attention=False, log_dir="/tmp/rlt_tpu_test_runs",
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
        use_pallas_attention=False, log_dir="/tmp/rlt_tpu_test_runs",
    )
    data = synthetic_dataset(num_queries=32, seq_len=16, num_features=3,
                             mean_relevant=4.0, seed=0)
    single = Trainer(cfg, data=data).run()
    mesh = data_parallel_mesh(8, devices=cpu_devices()[:8])
    sharded = Trainer(cfg, data=data, sharding=batch_sharding(mesh)).run()
    assert abs(single["best_f1"] - sharded["best_f1"]) < 1e-4
    assert abs(single["best_dcg"] - sharded["best_dcg"]) < 1e-3
