"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import re

import jax
import numpy as np
import pytest

from rlt_tpu.parallel import (
    batch_sharding,
    data_parallel_mesh,
    mesh_2d,
    param_shardings,
    replicated,
)


def collective_group_sizes(hlo_text: str) -> set:
    """Sizes of the replica groups of every all-reduce/all-gather/
    reduce-scatter in compiled HLO. Handles both group syntaxes XLA emits:
    literal `replica_groups={{0,1},{2,3}}` and iota
    `replica_groups=[2,4]<=[4,2]T(1,0)` (2 groups of 4)."""
    sizes = set()
    for line in hlo_text.splitlines():
        if not any(c in line for c in ("all-reduce", "all-gather",
                                       "reduce-scatter")):
            continue
        m = re.search(r"replica_groups=\{\{([\d,]+)\}", line)
        if m:
            sizes.add(len(m.group(1).split(",")))
        m = re.search(r"replica_groups=\[(\d+),(\d+)\]<=", line)
        if m:
            sizes.add(int(m.group(2)))
    return sizes


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


def test_dryrun_takes_subprocess_branch_when_default_backend_is_tpu(
        monkeypatch):
    """r02's driver artifact failed because "cpu in JAX_PLATFORMS" was taken
    to mean "eager ops run on CPU" — with JAX_PLATFORMS="axon,cpu" the axon
    TPU stays the default backend and the first eager op dies on the tunnel.
    The in-process path must require jax.default_backend() == "cpu"; any
    other default backend must select the forced-CPU subprocess re-exec."""
    import __graft_entry__ as ge

    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    monkeypatch.setattr(ge.jax, "default_backend", lambda: "tpu")
    assert ge._cpu_devices_if_safe() == []

    calls = []
    monkeypatch.setattr(ge, "_reexec_dryrun", lambda n: calls.append(n))
    ge.dryrun_multichip(8)
    assert calls == [8]


def test_dryrun_in_process_branch_requires_cpu_platform(monkeypatch):
    """JAX_PLATFORMS not naming cpu at all must also re-exec — querying
    devices would otherwise initialize the axon backend (tunnel handshake)."""
    import __graft_entry__ as ge

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert ge._cpu_devices_if_safe() == []


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


# ---------------------------------------------------------------------------
# 2-D (data, model) mesh: expert / tensor parallelism (parallel/sharding.py)
# ---------------------------------------------------------------------------


def test_mesh_2d_shape_and_refusal():
    devs = cpu_devices()
    if len(devs) >= 8:
        mesh = mesh_2d(8, model_parallel=2, devices=devs[:8])
        assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="must divide"):
        mesh_2d(8, model_parallel=3, devices=devs or None)
    with pytest.raises(ValueError, match="need 1024 devices"):
        mesh_2d(1024, model_parallel=2)


@needs_multi_cpu
def test_param_sharding_rules_tp_and_ep():
    """E=3 experts cannot split over a 2-way model axis -> Megatron FFN tp;
    E=4 -> whole-expert ep on the vmapped leading axis; towers/LSTM/gates
    stay replicated in both."""
    from jax.sharding import PartitionSpec as P

    import __graft_entry__ as ge

    def specs(num_experts):
        _, state, _, _, mesh = ge.build_dryrun_step(
            8, cpu_devices()[:8], model_parallel=2, num_experts=num_experts)
        return jax.tree.map(lambda a: a.sharding.spec, state.params), mesh

    tp, _ = specs(3)
    enc = tp["experts"]["attention_layer"]["layers_0"]
    assert enc["linear1"]["weight"] == P(None, "model", None)
    assert enc["linear1"]["bias"] == P(None, "model")
    assert enc["linear2"]["weight"] == P(None, None, "model")
    assert enc["linear2"]["bias"] == P()
    assert enc["self_attn"]["in_proj_weight"] == P()  # torch qkv interleaving
    assert tp["w_gates"] == P()
    assert tp["pre_encoding"]["weight_ih_l0"] == P()
    assert tp["tower_cut"]["linear"]["weight"] == P()

    ep, _ = specs(4)
    enc = ep["experts"]["attention_layer"]["layers_0"]
    assert enc["linear1"]["weight"] == P("model", None, None)
    assert enc["self_attn"]["in_proj_weight"] == P("model", None, None)
    assert ep["w_gates"] == P()


@needs_multi_cpu
def test_tp_and_ep_steps_match_data_parallel():
    """Same seed + data: the 2-D layouts must reproduce the 1-D data-parallel
    loss bit-for-bit up to reduction order (partitionable threefry keeps the
    dropout bits sharding-independent)."""
    import __graft_entry__ as ge

    devs = cpu_devices()[:8]

    def one_step(model_parallel, num_experts):
        step, state, x, y, mesh = ge.build_dryrun_step(
            8, devs, model_parallel=model_parallel, num_experts=num_experts)
        with mesh:
            _, loss = step(state, x, y)
        return float(loss)

    assert abs(one_step(2, 3) - one_step(1, 3)) < 1e-6  # tp vs dp
    assert abs(one_step(2, 4) - one_step(1, 4)) < 1e-6  # ep vs dp


@needs_multi_cpu
@pytest.mark.parametrize("num_experts", [3, 4], ids=["tp", "ep"])
def test_2d_hlo_has_model_and_data_axis_collectives(num_experts):
    """The compiled 2-D step must communicate over BOTH axes: size-2 groups
    (the model axis: FFN partial products / expert mixing) and size-4 groups
    (the data axis: gradient psum). A compilation that resharded everything
    to one device would have neither."""
    import __graft_entry__ as ge

    step, state, x, y, mesh = ge.build_dryrun_step(
        8, cpu_devices()[:8], model_parallel=2, num_experts=num_experts)
    with mesh:
        txt = step.lower(state, x, y).compile().as_text()
    sizes = collective_group_sizes(txt)
    assert 2 in sizes, f"no model-axis collective; group sizes: {sizes}"
    assert 4 in sizes, f"no data-axis collective; group sizes: {sizes}"


@needs_multi_cpu
def test_trainer_model_parallel_matches_single_device():
    """End-to-end Trainer on the (4, 2) mesh (mmoecut E=3 -> FFN tp) must
    reproduce the single-device run."""
    from rlt_tpu.config import TrainConfig
    from rlt_tpu.data import synthetic_dataset
    from rlt_tpu.train import Trainer

    cfg = TrainConfig(
        model_name="mmoecut", seq_len_override=16, input_size_override=3,
        synthetic_queries=32, batch_size=16, epochs=2, dropout=0.0,
        use_pallas=False, log_dir="/tmp/rlt_tpu_test_runs",
        data_parallel=True, model_parallel=2,
    )
    data = synthetic_dataset(num_queries=32, seq_len=16, num_features=3,
                             mean_relevant=4.0, seed=0)
    sharded = Trainer(cfg, data=data).run()
    import dataclasses

    single = Trainer(dataclasses.replace(cfg, data_parallel=False,
                                         model_parallel=1), data=data).run()
    assert abs(sharded["best_f1"] - single["best_f1"]) < 1e-4
    assert abs(sharded["best_dcg"] - single["best_dcg"]) < 1e-3


@needs_multi_cpu
@pytest.mark.parametrize("model_parallel", [1, 2], ids=["1d-dp", "2d-dp-tp"])
def test_sharded_checkpoint_resume(tmp_path, model_parallel):
    """Resume under a mesh (VERDICT r3 ask #5): restored tensors carry the
    ORIGINAL NamedShardings (a tp split must not silently degrade to
    replicated through the orbax roundtrip) and the resumed trajectory
    matches an uninterrupted run."""
    import dataclasses

    from rlt_tpu.config import TrainConfig
    from rlt_tpu.data import synthetic_dataset
    from rlt_tpu.train import Trainer

    cfg = TrainConfig(
        model_name="attncut", seq_len_override=16, input_size_override=3,
        synthetic_queries=32, batch_size=16, epochs=4,
        use_pallas=False, log_dir="/tmp/rlt_tpu_test_runs",
        data_parallel=True, model_parallel=model_parallel,
        model_persist=True, save_path=str(tmp_path / "interrupted"),
    )
    data = synthetic_dataset(num_queries=32, seq_len=16, num_features=3,
                             mean_relevant=4.0, seed=0)

    # uninterrupted 4-epoch run (its own save dir so snapshots don't mix)
    full = Trainer(dataclasses.replace(
        cfg, save_path=str(tmp_path / "full")), data=data)
    full.run()

    # interrupted after 2 epochs, then resumed to 4 from the snapshot
    Trainer(dataclasses.replace(cfg, epochs=2), data=data).run()
    resumed = Trainer(cfg, data=data)
    want_shardings = jax.tree.map(lambda a: a.sharding, resumed.state.params)
    resumed.run(resume=True)

    # (a) layouts intact: every restored tensor has its original sharding,
    # and on the 2-D mesh at least one is genuinely split over "model"
    got = jax.tree.leaves(
        jax.tree.map(lambda a, s: a.sharding.is_equivalent_to(s, ndim=a.ndim),
                     resumed.state.params, want_shardings))
    assert all(got)
    if model_parallel > 1:
        assert any(not a.sharding.is_fully_replicated
                   for a in jax.tree.leaves(resumed.state.params)), \
            "2-D run restored fully replicated — tp layout lost in resume"

    # (b) trajectory: interrupted+resumed == uninterrupted
    assert len(resumed.f1_record) == 4
    np.testing.assert_allclose(resumed.f1_record, full.f1_record, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7),
        resumed.state.params, full.state.params)
