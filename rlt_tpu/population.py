"""Population training: K independent trials as ONE vmapped XLA program.

The reference runs its hyper-parameter random search (run.py:349-364) and its
multi-seed evidence protocol (run.py:229-232 best / best-5) as a python loop
of full sequential training runs. On a TPU every one of those runs leaves
most of the chip idle — the per-trial matmuls are small (robust04: 4 train
batches of 63 lists/epoch; measured whole-model MFU 6-13%, RESULTS.md
"Speed-of-light accounting") — so the TPU-native shape of a search is to
stack K trials on a leading member axis and `jax.vmap` the SAME multi-epoch
program `Trainer._run_scanned` runs, turning K sequential trainings into one
compiled program whose matmuls are K× fatter.

Everything that varies per trial is traced, so one compilation serves the
whole population:

* **init / shuffle / dropout randomness** — per-member PRNG chain derived
  from `Member.seed` exactly as `Trainer.__init__` derives it (root key →
  params/dropout/epoch keys), so a population member reproduces the
  sequential run with that seed exactly up to float-reduction order (vmap
  batches every dot_general with a member axis, which reorders the f32
  accumulations — same algorithm, same rng bits, ~1e-6/step param drift).
* **data** — per-member corpora ride a stacked leading axis of the
  `DeviceDataset` pytree (`Trainer` regenerates the synthetic corpus from
  `cfg.seed`, so multi-seed sweeps vary data and init together; the stacked
  axis preserves that).
* **lr / weight_decay** — live in the optimizer state via
  `optax.inject_hyperparams` around the same torch-Adam-with-L2 chain
  `train.make_optimizer` builds (run.py:104 semantics).
* **mtcut task weights** — `rerank_weight` / `classi_weight`
  (losses.py:180-191) flow through `TrainState.hp["criterion"]` into every
  criterion call as traced scalars.
* **dropout rate** — `TrainState.hp["dropout_rate"]` overrides the models'
  static dropout attribute on the training forward (the reference's
  regularizer search axis, run.py:353-356).

The population path reuses `train.build_epoch_fn(jit=False)` — the identical
epoch/multi-epoch program — wrapped in `jax.vmap`, so there is exactly one
definition of a training step in the framework.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rlt_tpu import config as config_lib
from rlt_tpu import train as train_lib
from rlt_tpu.data import RankedListData, synthetic_dataset
from rlt_tpu.data.batching import DeviceDataset
from rlt_tpu.data.datasets import load_pkl_dataset, synthetic_config
from rlt_tpu.models import build_model
from rlt_tpu.utils import losses as losses_lib
from rlt_tpu.utils.platform import pallas_supported

logger = logging.getLogger("rlt_tpu")


@dataclasses.dataclass(frozen=True)
class Member:
    """One population member; None fields inherit the base TrainConfig.

    A member with only `seed` set reproduces `Trainer` at that seed (the
    multi-seed sweep protocol); the other fields are the reference's search
    axes (run.py:349-364)."""

    seed: int = 0
    lr: float | None = None
    weight_decay: float | None = None
    dropout: float | None = None
    rerank_weight: float | None = None
    class_weight: float | None = None


def make_traced_optimizer() -> optax.GradientTransformation:
    """torch Adam-with-L2 (train.make_optimizer, run.py:104) with lr and
    weight_decay as traced state so a vmapped population varies them
    per member. add_decayed_weights(0.0) is numerically the identity, so a
    member with weight_decay=0 matches the sequential path (which omits the
    transform entirely) exactly."""

    def factory(lr, weight_decay):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-lr),
        )

    return optax.inject_hyperparams(factory)(lr=0.0, weight_decay=0.0)


def _population_criterion(cfg: config_lib.TrainConfig):
    """(criterion, hp_criterion_fn): the criterion for this model with any
    per-member loss hyperparameters factored out into a traced-kwargs dict.

    Mirrors train.make_criterion's dispatch (run.py:59-102): only
    mtchoopy/mtattncut expose task weights to the search (run.py:79/:84);
    mmoecut/moecut/mtple pin 0.5/0.5 like the reference's MtCutLoss defaults.
    """
    name = cfg.model_name
    if name in ("mtchoopy", "mtattncut") and not cfg.loss_override:
        import functools

        crit = functools.partial(
            losses_lib.mtcut_loss, metric=cfg.criterion, num_tasks=cfg.num_tasks
        )

        def hp_criterion(m: Member) -> dict:
            return {
                "rerank_weight": np.float32(
                    cfg.rerank_weight if m.rerank_weight is None else m.rerank_weight),
                "classi_weight": np.float32(
                    cfg.class_weight if m.class_weight is None else m.class_weight),
            }

        return crit, hp_criterion
    return train_lib.make_criterion(cfg), lambda m: None


def _member_datasets(cfg: config_lib.TrainConfig, members: Sequence[Member],
                     data) -> list[RankedListData]:
    """Per-member corpora, mirroring Trainer.__init__'s data path: an explicit
    dataset is shared; otherwise each member regenerates the synthetic corpus
    from ITS seed (exactly what `Trainer(replace(cfg, seed=m.seed))` does)."""
    if isinstance(data, (list, tuple)):
        if len(data) != len(members):
            raise ValueError(
                f"{len(data)} datasets for {len(members)} members")
        return list(data)
    if data is not None:
        return [data] * len(members)
    if cfg.dataset_base:
        family = config_lib.loader_family(cfg.model_name, cfg.retrieve_data)
        shared = load_pkl_dataset(cfg.dataset_base, cfg.retrieve_data,
                                  cfg.dataset_name, family)
        return [shared] * len(members)
    by_seed = {
        seed: synthetic_dataset(
            num_queries=cfg.synthetic_queries, seq_len=cfg.seq_len,
            num_features=cfg.input_size, seed=seed,
            **synthetic_config(cfg.retrieve_data, cfg.dataset_name),
        )
        for seed in {m.seed for m in members}
    }
    return [by_seed[m.seed] for m in members]


def _stack_datasets(datasets: Sequence[RankedListData],
                    batch_size: int) -> DeviceDataset:
    """One DeviceDataset whose arrays carry a leading member axis. Static
    batch-plan fields must agree across members (synthetic corpora always do:
    the generator emits exactly num_queries rows split by round())."""
    shapes = {tuple(np.asarray(d.x_train).shape) for d in datasets}
    if len(shapes) != 1:
        raise ValueError(f"member corpora disagree on shape: {sorted(shapes)}")
    stack = lambda field: jnp.asarray(
        np.stack([np.asarray(getattr(d, field)) for d in datasets]))
    n_train = int(np.asarray(datasets[0].x_train).shape[0])
    n_test = int(np.asarray(datasets[0].x_test).shape[0])
    return DeviceDataset(
        x_train=stack("x_train"), y_train=stack("y_train"),
        x_test=stack("x_test"), y_test=stack("y_test"),
        batch_size=batch_size, n_train=n_train, n_test=n_test,
    )


def _draw_keys(epoch_key: jax.Array, n: int):
    """n epoch keys by the exact sequential-split chain Trainer uses
    (train.py: `self.epoch_key, sub = jax.random.split(self.epoch_key)`)."""

    def body(c, _):
        c, sub = jax.random.split(c)
        return c, sub

    return jax.lax.scan(body, epoch_key, None, length=n)


def train_population(cfg: config_lib.TrainConfig, members: Sequence[Member],
                     data=None, track_best_params: bool = False,
                     chunk_size: int | None = None, mesh=None) -> dict:
    """Train every member in vmapped lockstep; return per-member summaries.

    data: None (per-member synthetic / shared pkl corpus, like Trainer),
    one RankedListData (shared), or a list of per-member RankedListData.

    mesh: a jax.sharding.Mesh — shards the member axis over the mesh's
    first axis (members are embarrassingly parallel: K=64 trials on 8 chips
    run 8 member-groups concurrently with zero collectives). K must be a
    multiple of the mesh size. Composes with chunk_size (each chunk is
    sharded).

    chunk_size: HBM capacity valve — when set and K > chunk_size, the
    population runs as ceil(K / chunk_size) sequential vmapped programs of at
    most chunk_size members each (measured: mmoecut K=16 needs 19.4G on a
    15.75G v5e; K=8 fits — RESULTS.md "Population training"). Results are
    identical to the unchunked run member-for-member: members interact only
    through the vmap axis.

    Returns {"per_member": [summary dicts with Trainer._summarize's keys plus
    the member's hyperparameters], "f1_record": (K, epochs), "dcg_record":
    (K, epochs)[, "best_params": stacked pytree when track_best_params]}.
    """
    members = list(members)
    K = len(members)
    if K == 0:
        raise ValueError("empty population")

    if chunk_size is not None and K > chunk_size:
        if chunk_size < 1:
            raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
        chunks = [
            train_population(cfg, members[i:i + chunk_size],
                             data=(data[i:i + chunk_size]
                                   if isinstance(data, list) else data),
                             track_best_params=track_best_params, mesh=mesh)
            for i in range(0, K, chunk_size)
        ]
        out: dict[str, Any] = {
            "per_member": [r for c in chunks for r in c["per_member"]],
            "f1_record": np.concatenate([c["f1_record"] for c in chunks]),
            "dcg_record": np.concatenate([c["dcg_record"] for c in chunks]),
        }
        if track_best_params:
            out["best_params"] = jax.tree.map(
                lambda *xs: jnp.concatenate(xs),
                *[c["best_params"] for c in chunks])
        return out

    if any(m.rerank_weight is not None or m.class_weight is not None
           for m in members) and not (
            cfg.model_name in ("mtchoopy", "mtattncut") and not cfg.loss_override):
        raise ValueError(
            f"rerank/class weights only search {('mtchoopy', 'mtattncut')} "
            f"(run.py:79/:84); {cfg.model_name!r}'s criterion would silently "
            "ignore them")

    # Force threefry dropout bits: threefry is counter-based and therefore
    # vmap-width-invariant, so every member's mask stream is bit-identical
    # to its sequential Trainer run (the engine's equivalence contract,
    # pinned by tests/test_population.py). The fast rbg stream
    # (cfg.fast_dropout_rng, default for sequential training) is NOT vmap
    # invariant — XLA's RngBitGenerator batching rewrites the bit layout per
    # batch width — which would silently decouple population trajectories
    # from their sequential twins (and chunked runs from unchunked).
    cfg = dataclasses.replace(cfg, fast_dropout_rng=False)
    use_pallas = cfg.use_pallas and pallas_supported()
    model = build_model(
        cfg.model_name, seq_len=cfg.seq_len, input_size=cfg.input_size,
        dropout=cfg.dropout, num_tasks=cfg.num_tasks, use_pallas=use_pallas,
    )
    criterion, hp_criterion = _population_criterion(cfg)
    optimizer = make_traced_optimizer()
    _, multi_epoch_raw = train_lib.build_epoch_fn(
        model, criterion, optimizer, cfg, jit=False)

    data_dev = _stack_datasets(_member_datasets(cfg, members, data),
                               cfg.batch_size)

    # per-member hp pytree: identical structure across members (all are the
    # same model), stacked on the member axis. If ANY member overrides
    # dropout, every member carries a traced rate (those that don't override
    # get cfg.dropout) so the stacked pytrees agree in structure; a traced
    # rate equal to the static one reproduces the same mask bits (identical
    # bernoulli draw from the identical rng), so mixing is exact.
    any_dropout = any(m.dropout is not None for m in members)

    def _hp(m: Member):
        hp = {"criterion": hp_criterion(m)}
        if any_dropout:
            hp["dropout_rate"] = np.float32(
                cfg.dropout if m.dropout is None else m.dropout)
        return hp

    hp0 = _hp(members[0])
    hp_stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[_hp(m) for m in members]) if \
        jax.tree_util.tree_leaves(hp0) else hp0

    sample = jnp.zeros((1, cfg.seq_len, cfg.input_size), jnp.float32)

    def init_member(seed, lr, wd, hp):
        # exactly Trainer.__init__'s key derivation: root -> params key,
        # dropout key (becomes TrainState.rng), epoch key
        root = jax.random.PRNGKey(seed)
        pkey, dkey, epoch_key = jax.random.split(root, 3)
        params = model.init({"params": pkey, "dropout": dkey}, sample)["params"]
        opt_state = optimizer.init(params)
        # inject_hyperparams keeps hyperparams as state leaves; overwrite the
        # placeholders with this member's traced values
        opt_state.hyperparams["lr"] = jnp.asarray(lr, jnp.float32)
        opt_state.hyperparams["weight_decay"] = jnp.asarray(wd, jnp.float32)
        return train_lib.TrainState(params, opt_state, dkey, hp), epoch_key

    seeds = jnp.asarray([m.seed for m in members], jnp.uint32)
    lrs = jnp.asarray([cfg.lr if m.lr is None else m.lr for m in members],
                      jnp.float32)
    wds = jnp.asarray(
        [cfg.weight_decay if m.weight_decay is None else m.weight_decay
         for m in members], jnp.float32)
    state, epoch_keys = jax.jit(jax.vmap(init_member))(seeds, lrs, wds,
                                                       hp_stacked)

    if mesh is not None:
        # Members never interact, so sharding the leading member axis of
        # every stacked input over the mesh's first axis partitions the
        # whole vmapped program member-parallel with ZERO collectives (XLA
        # propagates the sharding through the epoch scan). Per-member math
        # is intra-shard, so results are bit-identical to the unsharded run
        # (tests/test_population.py::test_population_sharded_over_mesh).
        axis = mesh.axis_names[0]
        if K % mesh.devices.size != 0:
            raise ValueError(
                f"population size {K} must divide over the {mesh.devices.size}"
                f"-device mesh (whole members per device)")
        member_sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(axis))
        shard = lambda tree: jax.tree.map(  # noqa: E731
            lambda a: jax.device_put(a, member_sharding), tree)
        state, epoch_keys, data_dev = (shard(state), shard(epoch_keys),
                                       shard(data_dev))

    pop_fn = jax.jit(jax.vmap(multi_epoch_raw), donate_argnums=(0,))
    draw = jax.jit(jax.vmap(_draw_keys, in_axes=(0, None)),
                   static_argnums=(1,))

    n = cfg.epochs
    block = max(1, cfg.scan_block_epochs)
    best_f1 = np.full(K, -np.inf)
    best_dcg = np.full(K, -np.inf)
    f1_rec = np.zeros((K, 0))
    dcg_rec = np.zeros((K, 0))
    best_params_acc = None
    start = time.time()
    done = 0
    while done < n:
        m_ep = min(block, n - done)
        epoch_keys, keys = draw(epoch_keys, m_ep)  # keys: (K, m_ep, key)
        state, block_best_params, metrics = pop_fn(state, data_dev, keys)
        metrics = jax.device_get(
            {k: v for k, v in metrics.items() if k != "train_loss_steps"})
        f1_rec = np.concatenate([f1_rec, metrics["test_f1"]], axis=1)
        dcg_rec = np.concatenate([dcg_rec, metrics["test_dcg"]], axis=1)
        block_max = metrics["test_f1"].max(axis=1)
        if track_best_params:
            if best_params_acc is None:  # first block always improves on -inf
                best_params_acc = block_best_params
            else:
                improved = jnp.asarray(block_max > best_f1)
                pick = lambda new, old: jnp.where(
                    improved.reshape((K,) + (1,) * (old.ndim - 1)), new, old)
                best_params_acc = jax.tree.map(pick, block_best_params,
                                               best_params_acc)
        best_f1 = np.maximum(best_f1, block_max)
        best_dcg = np.maximum(best_dcg, metrics["test_dcg"].max(axis=1))
        done += m_ep
    logger.info("population of %d x %d epochs in %.2fs", K, n,
                time.time() - start)

    per_member = []
    for i, m in enumerate(members):
        top5_f1 = np.sort(f1_rec[i])[::-1][:5]
        top5_dcg = np.sort(dcg_rec[i])[::-1][:5]
        per_member.append({
            "member": dataclasses.asdict(m),
            "best_f1": float(best_f1[i]), "best_dcg": float(best_dcg[i]),
            "best5_f1": float(top5_f1.mean()),
            "best5_dcg": float(top5_dcg.mean()),
        })
    out: dict[str, Any] = {
        "per_member": per_member, "f1_record": f1_rec, "dcg_record": dcg_rec,
    }
    if track_best_params:
        out["best_params"] = best_params_acc
    return out
