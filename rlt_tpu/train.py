"""Training harness + CLI (reference run.py:26-372, rebuilt TPU-first).

Where the reference runs a python step loop with per-step host<->device copies
and CPU numpy metric decoding (run.py:120-146), here a whole epoch — every
train batch plus the full test pass — is ONE jitted XLA program (`lax.scan`
over a static batch plan, device-resident dataset, donated train state). The
host sees one scalar pytree per epoch. Dispatch, hyper-parameters, decode
rules, best/best-5 bookkeeping, model persistence, reward plots, and the
random-search harness mirror the reference exactly (citations inline).
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import logging
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from rlt_tpu import config as config_lib
from rlt_tpu.data import DeviceDataset, RankedListData, epoch_permutation, load_pkl_dataset, synthetic_dataset
from rlt_tpu.data.datasets import synthetic_config
from rlt_tpu.utils.platform import pallas_supported
from rlt_tpu.models import build_model, is_multi_head
from rlt_tpu.utils import losses as losses_lib
from rlt_tpu.utils import metrics as metrics_lib
from rlt_tpu.utils.logging import MetricsWriter
from rlt_tpu.utils.checkpoint import (
    load_params,
    load_train_state,
    save_params,
    save_train_state,
)

logger = logging.getLogger("rlt_tpu")


# ---------------------------------------------------------------------------
# Optimizer: torch optim.Adam semantics (run.py:104) — L2 weight decay is
# added to the gradient BEFORE the Adam moments (not decoupled AdamW).
# ---------------------------------------------------------------------------

def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    steps = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    steps += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-lr)]
    return optax.chain(*steps)


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    rng: jax.Array
    # optional per-trial traced hyperparameters (population training,
    # rlt_tpu/population.py): None for ordinary runs; a dict with an optional
    # "criterion" sub-dict of loss kwargs (e.g. mtcut task weights) and an
    # optional "dropout_rate" scalar, all carried as pytree leaves so one
    # compiled program serves every trial
    hp: Any = None


# ---------------------------------------------------------------------------
# Loss / decode dispatch (reference run.py:59-102, :131-142)
# ---------------------------------------------------------------------------

def make_criterion(cfg: config_lib.TrainConfig) -> Callable:
    """criterion(output, labels, valid) -> scalar, per run.py's dispatch.

    run.py:64 bicut -> BiCutLoss(metric=criterion); :68 choopy -> ChoopyLoss;
    :74 attncut -> DivLoss(div_type, augmented); :79/:84 mtchoopy/mtattncut ->
    MtCutLoss with the configured task weights; :90/:96/:102 mmoecut/moecut/
    mtple -> MtCutLoss WITHOUT weights (torch defaults 0.5/0.5).
    """
    name, metric = cfg.model_name, cfg.criterion
    if cfg.loss_override and name in ("choopy", "attncut"):
        # run.py:73-75 keeps AttnCutLoss / WassDistLoss as commented-out
        # alternatives to DivLoss; expose them as a first-class switch for
        # the models whose output IS a distribution over positions. BiCut's
        # (B, L, 2) per-position pair-softmax is not, so these losses would
        # be silently meaningless there — fall through to BiCutLoss instead.
        if cfg.loss_override == "wass":
            return losses_lib.wass_dist_loss
        if cfg.loss_override == "attncut":
            return functools.partial(losses_lib.attncut_loss, metric=metric)
        if cfg.loss_override == "choopy":
            return functools.partial(losses_lib.choopy_loss, metric=metric)
        if cfg.loss_override == "div":
            return functools.partial(
                losses_lib.div_loss, metric=metric, div_type=cfg.div_type,
                augmented=cfg.augmented_reward,
            )
        raise ValueError(f"unknown loss_override: {cfg.loss_override!r}")
    if name == "bicut":
        return functools.partial(losses_lib.bicut_loss, metric=metric)
    if name == "choopy":
        return functools.partial(losses_lib.choopy_loss, metric=metric)
    if name == "attncut":
        return functools.partial(
            losses_lib.div_loss, metric=metric, div_type=cfg.div_type,
            augmented=cfg.augmented_reward,
        )
    if name in ("mtchoopy", "mtattncut"):
        return functools.partial(
            losses_lib.mtcut_loss, metric=metric, rerank_weight=cfg.rerank_weight,
            classi_weight=cfg.class_weight, num_tasks=cfg.num_tasks,
        )
    if name in ("mmoecut", "moecut", "mtple"):
        return functools.partial(
            losses_lib.mtcut_loss, metric=metric, rerank_weight=0.5,
            classi_weight=0.5, num_tasks=cfg.num_tasks if name != "mtple" else 3,
        )
    # probe_base trains through rlt_tpu.verify_probe (it returns intermediates)
    raise ValueError(f"no criterion for model {name!r}")


def decode_ks(model_name: str, output) -> jax.Array:
    """Predicted cut per row (run.py:131-142): bicut's first-truncate rule;
    multi-task models decode the LAST head; single-task the lone head."""
    if model_name == "bicut":
        return metrics_lib.decode_cut_bicut(output)
    if is_multi_head(model_name):
        return metrics_lib.decode_cut(output[-1])
    return metrics_lib.decode_cut(output)


# ---------------------------------------------------------------------------
# The jitted epoch program
# ---------------------------------------------------------------------------

def _batch_metrics(model_name, output, y, valid):
    ks = decode_ks(model_name, output)
    f1 = metrics_lib.f1_at_k(y, ks, valid=valid)
    dcg = metrics_lib.dcg_at_k(y, ks, valid=valid)
    return f1, dcg


def build_epoch_fn(model, criterion, optimizer, cfg: config_lib.TrainConfig,
                   jit: bool = True):
    """Returns jitted `epoch_fn(state, data, key) -> (state, metrics)` where
    metrics = dict of epoch-mean train/test loss/F1/DCG (mean over batch means,
    matching run.py:148-153/:190-195's accumulation).

    jit=False returns the raw python callables so rlt_tpu.population can wrap
    them in `jax.vmap` (one compiled program for K trials) before jitting.

    When `state.hp` is set (population trials), its "criterion" sub-dict is
    splatted into every criterion call and its "dropout_rate" overrides the
    models' static dropout attribute on the training forward — both as traced
    values, so trials with different hyperparameters share one program."""

    model_name = cfg.model_name
    # mixed precision: cast params + inputs to the compute dtype inside the
    # loss (master weights stay fp32; autodiff casts the grads back). The MXU
    # runs bf16 matmuls at 2x fp32 throughput; losses stay fp32.
    cdtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def _cast_in(params, x):
        if cdtype is None:
            return params, x
        cast = lambda a: a.astype(cdtype) if a.dtype == jnp.float32 else a
        return jax.tree.map(cast, params), x.astype(cdtype)

    def _cast_out(output):
        if cdtype is None:
            return output
        to32 = lambda a: a.astype(jnp.float32)
        return [to32(o) for o in output] if isinstance(output, (list, tuple)) \
            else to32(output)

    def _bulk_rng(key):
        """Dropout-bit generator key. Key DERIVATION stays threefry (cheap
        scalar splits, the framework's reproducibility spine); only the bulk
        bernoulli BITS switch to the TPU-native RngBitGenerator stream —
        profiling showed threefry mask generation for the expert FFNs
        (pred[3,63,300,2048] per step) costing 3.7 ms of the 15.7 ms mmoecut
        step (RESULTS.md "whole-model time breakdown")."""
        if not cfg.fast_dropout_rng:
            return key
        data = jax.random.key_data(key)  # (2,) uint32 threefry payload
        return jax.random.wrap_key_data(jnp.tile(data, 2), impl="rbg")

    def loss_fn(params, x, y, valid, dropout_rng, hp):
        hp = hp or {}
        params_c, x_c = _cast_in(params, x)
        apply_kw = {}
        if hp.get("dropout_rate") is not None:
            apply_kw["dropout_rate"] = hp["dropout_rate"]
        output = _cast_out(model.apply(
            {"params": params_c}, x_c, deterministic=False,
            rngs={"dropout": _bulk_rng(dropout_rng)}, **apply_kw,
        ))
        crit_kw = hp.get("criterion") or {}
        return criterion(output, y, valid=valid, **crit_kw), output

    def train_step(state: TrainState, batch):
        idx, valid = batch["idx"], batch["valid"]
        x = batch["x"][idx]
        y = batch["y"][idx]
        rng, dropout_rng = jax.random.split(state.rng)
        (loss, output), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, y, valid, dropout_rng, state.hp
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # decode/metrics on the PRE-update forward, as the reference does
        f1, dcg = _batch_metrics(model_name, output, y, valid)
        return TrainState(params, opt_state, rng, state.hp), (loss, f1, dcg)

    def eval_step(params, batch, hp):
        idx, valid = batch["idx"], batch["valid"]
        x = batch["x"][idx]
        y = batch["y"][idx]
        params_c, x_c = _cast_in(params, x)
        output = _cast_out(model.apply({"params": params_c}, x_c, deterministic=True))
        crit_kw = (hp or {}).get("criterion") or {}
        loss = criterion(output, y, valid=valid, **crit_kw)
        f1, dcg = _batch_metrics(model_name, output, y, valid)
        return loss, f1, dcg

    def epoch_fn(state: TrainState, data: DeviceDataset, key: jax.Array):
        tr_key, te_key = jax.random.split(key)
        tr_idx, tr_valid = epoch_permutation(tr_key, data.n_train, data.batch_size)
        te_idx, te_valid = epoch_permutation(te_key, data.n_test, data.batch_size)

        def tr_body(st, b):
            st, out = train_step(st, {"idx": b[0], "valid": b[1],
                                      "x": data.x_train, "y": data.y_train})
            return st, out

        state, (tl, tf1, tdcg) = jax.lax.scan(tr_body, state, (tr_idx, tr_valid))

        def te_body(_, b):
            return None, eval_step(state.params, {"idx": b[0], "valid": b[1],
                                                  "x": data.x_test, "y": data.y_test},
                                   state.hp)

        _, (el, ef1, edcg) = jax.lax.scan(te_body, None, (te_idx, te_valid))

        metrics = {
            "train_loss": jnp.mean(tl), "train_f1": jnp.mean(tf1),
            "train_dcg": jnp.mean(tdcg),
            "test_loss": jnp.mean(el), "test_f1": jnp.mean(ef1),
            "test_dcg": jnp.mean(edcg),
            "train_loss_steps": tl,  # per-batch losses (run.py:146 loss_step)
        }
        return state, metrics

    def multi_epoch_fn(state: TrainState, data: DeviceDataset, keys: jax.Array):
        """All epochs in ONE XLA program: scan over per-epoch keys, track the
        best-test-F1 params on device, return stacked per-epoch metrics. The
        per-epoch python loop pays one host<->device round trip per epoch —
        ~1.5 s each through a tunneled TPU — so a 100-epoch run goes from
        minutes to ~2 s of device time with a single fetch at the end."""

        def body(carry, key):
            st, best_f1, best_params = carry
            st, metrics = epoch_fn(st, data, key)
            better = metrics["test_f1"] > best_f1
            best_f1 = jnp.where(better, metrics["test_f1"], best_f1)
            best_params = jax.tree.map(
                lambda new, old: jnp.where(better, new, old), st.params, best_params
            )
            return (st, best_f1, best_params), metrics

        init = (state, jnp.asarray(-jnp.inf), state.params)
        (state, best_f1, best_params), metrics = jax.lax.scan(body, init, keys)
        return state, best_params, metrics

    if not jit:
        return epoch_fn, multi_epoch_fn
    return (
        jax.jit(epoch_fn, donate_argnums=(0,)),
        jax.jit(multi_epoch_fn, donate_argnums=(0,)),
    )


# ---------------------------------------------------------------------------
# Trainer (reference Trainer, run.py:26-240)
# ---------------------------------------------------------------------------

class Trainer:
    def __init__(self, cfg: config_lib.TrainConfig, data: RankedListData | None = None,
                 sharding=None):
        self.cfg = cfg
        self.model_name = cfg.model_name
        self.mesh = None
        if cfg.data_parallel and sharding is None:
            from rlt_tpu.parallel import (batch_sharding, data_parallel_mesh,
                                          mesh_2d)

            self.mesh = (mesh_2d(model_parallel=cfg.model_parallel)
                         if cfg.model_parallel > 1 else data_parallel_mesh())
            sharding = batch_sharding(self.mesh)
        family = config_lib.loader_family(cfg.model_name, cfg.retrieve_data)
        if data is None:
            if cfg.dataset_base:
                data = load_pkl_dataset(cfg.dataset_base, cfg.retrieve_data,
                                        cfg.dataset_name, family)
            else:
                data = synthetic_dataset(
                    num_queries=cfg.synthetic_queries, seq_len=cfg.seq_len,
                    num_features=cfg.input_size, seed=cfg.seed,
                    **synthetic_config(cfg.retrieve_data, cfg.dataset_name),
                )
        self.data = DeviceDataset.from_host(data, cfg.batch_size, sharding=sharding)

        use_pallas = cfg.use_pallas and pallas_supported()
        self.model = build_model(
            cfg.model_name, seq_len=cfg.seq_len, input_size=cfg.input_size,
            dropout=cfg.dropout, num_tasks=cfg.num_tasks,
            use_pallas=use_pallas,
        )
        self.criterion = make_criterion(cfg)
        self.optimizer = make_optimizer(cfg.lr, cfg.weight_decay)

        root = jax.random.PRNGKey(cfg.seed)
        pkey, dkey, self.epoch_key = jax.random.split(root, 3)
        sample = jnp.zeros((1, cfg.seq_len, cfg.input_size), jnp.float32)
        params = self.model.init({"params": pkey, "dropout": dkey}, sample)["params"]
        if cfg.model_path:
            loaded = load_params(cfg.model_path)
            if loaded is not None:
                params = loaded
                logger.info("loaded params from %s", cfg.model_path)
            else:
                logger.warning(
                    "model_path %r has no loadable checkpoint; training from "
                    "fresh init", cfg.model_path,
                )
        if self.mesh is not None:
            from rlt_tpu.parallel import param_shardings, replicated

            # commit params with their per-tensor layouts (all replicated on
            # a 1-D data mesh; ep/tp splits over 'model' on a 2-D one). The
            # optimizer state inherits each param's sharding via zeros_like.
            params = jax.tree.map(jax.device_put, params,
                                  param_shardings(params, self.mesh))
            dkey = jax.device_put(dkey, replicated(self.mesh))
        self.state = TrainState(params, self.optimizer.init(params), dkey)

        self.epoch_fn, self.multi_epoch_fn = build_epoch_fn(
            self.model, self.criterion, self.optimizer, cfg
        )
        self.writer = MetricsWriter(cfg.log_dir, run_name=cfg.model_name)

        # evaluation bookkeeping (run.py:54-57). best_params always exists —
        # consumers (e.g. a non-improving resume) must never hit an
        # AttributeError; it starts as the initial params and tracks the
        # best-test-F1 snapshot on both the scanned and python-loop paths.
        self.best_params = self.state.params
        self.best_test_f1 = -float("inf")
        self.best_test_dcg = -float("inf")
        self.f1_record: list[float] = []
        self.dcg_record: list[float] = []

    def run(self, profile_dir: str | None = None, resume: bool = False,
            force_python_loop: bool = False) -> dict:
        """Epoch loop with best / best-5 tracking (run.py:222-232).

        profile_dir: when set, epochs 1-3 are captured with jax.profiler
        (the reference has no tracing at all, SURVEY §5.1).
        resume: restore params + optimizer state + epoch from the last
        `save_train_state` snapshot and continue (the reference can only
        fine-tune from best weights, SURVEY §5.4)."""
        cfg = self.cfg
        start_epoch = 0
        ckpt_base = f"{cfg.save_path}/{self.model_name}"
        if resume:
            payload = load_train_state(ckpt_base, like_state=self.state)
            if payload is not None:
                self.state = TrainState(payload["params"], payload["opt_state"],
                                        payload["rng"])
                self.epoch_key = jnp.asarray(payload["epoch_key"])
                start_epoch = int(payload["epoch"]) + 1
                records = payload.get("records", {})
                self.f1_record = list(records.get("f1_record", []))
                self.dcg_record = list(records.get("dcg_record", []))
                self.best_test_f1 = records.get("best_f1", self.best_test_f1)
                self.best_test_dcg = records.get("best_dcg", self.best_test_dcg)
                logger.info("resumed from %s at epoch %d", ckpt_base, start_epoch)
        logger.info("Train the %s model", self.model_name)
        if start_epoch >= cfg.epochs:
            # nothing left to train (e.g. resuming a completed run): report
            # the restored bookkeeping instead of a zero-epoch NaN summary
            return self._summarize()
        # the fully-scanned path needs no per-epoch host interaction; fall
        # back to the python epoch loop when the host must act per epoch
        # (figures, profiler windows). Persistence works in both: the loop
        # snapshots every epoch, the scanned path every scan block.
        # (force_python_loop exists so tests can pin scan-vs-loop equivalence)
        if not cfg.draw and profile_dir is None and not force_python_loop:
            return self._run_scanned(start_epoch)
        tracing = False
        for epoch in range(start_epoch, cfg.epochs):
            # trace epochs 1-3 (skipping epoch 0's compile); on resume the
            # window may start mid-range or not at all — only stop what was
            # actually started
            if profile_dir is not None and not tracing and 1 <= epoch < 4:
                jax.profiler.start_trace(profile_dir)
                tracing = True
            if tracing and epoch == 4:
                jax.profiler.stop_trace()
                tracing = False
            start = time.time()
            self.epoch_key, sub = jax.random.split(self.epoch_key)
            self.state, metrics = self.epoch_fn(self.state, self.data, sub)
            metrics = jax.device_get(metrics)
            loss_steps = metrics.pop("train_loss_steps")
            for s, step_loss in enumerate(np.asarray(loss_steps)):
                self.writer.log_step(
                    epoch * len(loss_steps) + s, "train/loss_step", float(step_loss)
                )
            self.writer.log(epoch, metrics)

            test_f1 = float(metrics["test_f1"])
            test_dcg = float(metrics["test_dcg"])
            self.f1_record.append(test_f1)
            self.dcg_record.append(test_dcg)
            if test_f1 > self.best_test_f1:
                self.best_test_f1 = test_f1
                self.best_params = self.state.params
                if cfg.model_persist:
                    save_params(ckpt_base, self.state.params)
            self.best_test_dcg = max(self.best_test_dcg, test_dcg)
            if cfg.model_persist:
                save_train_state(ckpt_base, self.state, epoch,
                                 epoch_key=self.epoch_key,
                                 records=self._records())

            if cfg.draw and epoch % 2 == 0:
                self._draw(epoch)
            logger.info(
                "Epoch %d (%.2fs): train loss=%.5f f1=%.5f dcg=%.5f | "
                "test loss=%.5f f1=%.5f dcg=%.5f",
                epoch, time.time() - start,
                metrics["train_loss"], metrics["train_f1"], metrics["train_dcg"],
                metrics["test_loss"], metrics["test_f1"], metrics["test_dcg"],
            )

        if tracing:
            jax.profiler.stop_trace()
        return self._summarize()

    def _records(self) -> dict:
        return {
            "f1_record": self.f1_record, "dcg_record": self.dcg_record,
            "best_f1": self.best_test_f1, "best_dcg": self.best_test_dcg,
        }

    def _summarize(self) -> dict:
        """best / best-5 summary (run.py:229-232), safe on empty records."""
        if self.f1_record:
            best5_f1 = float(np.mean(sorted(self.f1_record, reverse=True)[:5]))
            best5_dcg = float(np.mean(sorted(self.dcg_record, reverse=True)[:5]))
        else:
            best5_f1 = self.best_test_f1
            best5_dcg = self.best_test_dcg
        logger.info("best: f1=%.7f dcg=%.6f | best-5: f1=%.7f dcg=%.6f",
                    self.best_test_f1, self.best_test_dcg, best5_f1, best5_dcg)
        summary = {
            "best_f1": self.best_test_f1, "best_dcg": self.best_test_dcg,
            "best5_f1": best5_f1, "best5_dcg": best5_dcg,
        }
        self.writer.log_summary(summary)
        self.writer.close()  # the reference closes per run too (run.py:364)
        return summary

    def _run_scanned(self, start_epoch: int = 0) -> dict:
        """All remaining epochs as ONE jitted program + ONE host fetch.

        Identical math to the python loop (same per-epoch keys drawn in the
        same order); only the host-sync pattern differs — through a tunneled
        TPU this turns ~1.5 s/epoch of round trips into a single fetch."""
        cfg = self.cfg
        n = cfg.epochs - start_epoch
        # chunk the scan: one program invocation per block bounds the device
        # run length (very long single invocations can trip worker limits)
        # while still amortizing the per-call host round trip block-fold
        block = max(1, cfg.scan_block_epochs)
        start = time.time()
        done = 0
        # seed with any restored best so a resumed run never clobbers the
        # persisted best-F1 checkpoint with worse params
        best_block_f1 = self.best_test_f1
        while done < n:
            m = min(block, n - done)
            keys = []
            for _ in range(m):
                self.epoch_key, sub = jax.random.split(self.epoch_key)
                keys.append(sub)
            self.state, best_params, metrics = self.multi_epoch_fn(
                self.state, self.data, jnp.stack(keys))
            metrics = jax.device_get(metrics)

            loss_steps = np.asarray(metrics.pop("train_loss_steps"))  # (m, steps)
            for e in range(m):
                epoch = start_epoch + done + e
                for s in range(loss_steps.shape[1]):
                    self.writer.log_step(epoch * loss_steps.shape[1] + s,
                                         "train/loss_step", float(loss_steps[e, s]))
                row = {k: float(v[e]) for k, v in metrics.items()}
                self.writer.log(epoch, row)
                self.f1_record.append(row["test_f1"])
                self.dcg_record.append(row["test_dcg"])
            block_max = float(np.max(metrics["test_f1"]))
            done += m
            if block_max > best_block_f1:
                best_block_f1 = block_max
                self.best_params = best_params  # device-side best-F1 snapshot
                if cfg.model_persist:
                    save_params(f"{cfg.save_path}/{self.model_name}", best_params)
            self.best_test_f1 = max(self.best_test_f1, best_block_f1)
            self.best_test_dcg = max(self.best_test_dcg,
                                     float(np.max(metrics["test_dcg"])))
            if cfg.model_persist:
                # resume granularity = one scan block
                save_train_state(f"{cfg.save_path}/{self.model_name}", self.state,
                                 start_epoch + done - 1, epoch_key=self.epoch_key,
                                 records=self._records())
        logger.info("%d epochs in %.2fs (scanned programs of <=%d epochs)",
                    n, time.time() - start, block)
        return self._summarize()

    def _draw(self, epoch: int) -> None:
        from rlt_tpu.utils.plots import plot_reward_vs_prediction

        params = self.state.params
        x, y = self.data.x_test, self.data.y_test
        output = self.model.apply({"params": params}, x, deterministic=True)
        if self.model_name == "bicut":
            # run.py:132-136 + :190-191: the reference plots the binary
            # argmax decision sequence, not p(truncate)
            cut = jnp.argmax(output, axis=2).astype(jnp.float32)
        else:
            cut = output[-1] if is_multi_head(self.model_name) else output
        plot_reward_vs_prediction(
            np.asarray(y), np.asarray(cut[..., 0] if cut.ndim == 3 else cut),
            metric=self.cfg.criterion, epoch=epoch,
            model_name=self.model_name, div_type=self.cfg.div_type,
            aug_reward=self.cfg.augmented_reward,
        )


# ---------------------------------------------------------------------------
# CLI + hyper-parameter search (reference main(), run.py:301-372)
# ---------------------------------------------------------------------------

def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="rlt_tpu truncation model trainer")
    d = config_lib.TrainConfig()
    p.add_argument("--retrieve-data", type=str, default=d.retrieve_data)
    p.add_argument("--dataset-name", type=str, default=d.dataset_name)
    p.add_argument("--dataset-base", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=d.batch_size)
    p.add_argument("--model-name", type=str, default=d.model_name)
    p.add_argument("--augmented-reward", type=int, default=1)
    p.add_argument("--div-type", type=str, default=d.div_type)
    p.add_argument("--criterion", type=str, default=d.criterion)
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--model-persist", type=int, default=0)
    p.add_argument("--save-path", type=str, default=d.save_path)
    p.add_argument("--log-dir", type=str, default=d.log_dir)
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--lr", type=float, default=d.lr)
    p.add_argument("--draw", type=int, default=0)
    p.add_argument("--weight-decay", type=float, default=d.weight_decay)
    p.add_argument("--dropout", type=float, default=d.dropout)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--parameter-record", type=str, default=d.parameter_record)
    p.add_argument("--parameter-search", type=int, default=0)
    p.add_argument("--regularizer-search", type=int, default=0)
    p.add_argument("--mt-search", type=int, default=0)
    p.add_argument("--search-times", type=int, default=d.search_times)
    p.add_argument("--num-tasks", type=float, default=3)
    p.add_argument("--rerank-weight", type=float, default=d.rerank_weight)
    p.add_argument("--class-weight", type=float, default=d.class_weight)
    p.add_argument("--no-preset", action="store_true",
                   help="skip the built-in hyper-parameter presets")
    p.add_argument("--profile-dir", type=str, default=None,
                   help="capture a jax.profiler trace of epochs 1-3 here")
    p.add_argument("--loss-override", type=str, default=None,
                   help="single-task loss switch: attncut|choopy|div|wass")
    p.add_argument("--resume", type=int, default=0,
                   help="resume params+optimizer+epoch from the last snapshot")
    p.add_argument("--conf-file", type=str, default=None,
                   help="reference-format hyper_parameter_*.conf to apply")
    p.add_argument("--data-parallel", type=int, default=0,
                   help="shard the batch over all visible chips (Mesh('data'))")
    p.add_argument("--model-parallel", type=int, default=d.model_parallel,
                   help="with --data-parallel 1: size of the second mesh axis "
                        "(expert-parallel MMOE stacks / Megatron FFN tp — "
                        "rlt_tpu/parallel/sharding.py)")
    p.add_argument("--compute-dtype", type=str, default=d.compute_dtype,
                   choices=("float32", "bfloat16"),
                   help="matmul input dtype; bfloat16 runs the MXU at 2x "
                        "(measured 1.1-1.6x whole-epoch, convergence within "
                        "0.15%% — RESULTS.md). float32 default preserves "
                        "torch-parity semantics")
    p.add_argument("--population", type=int, default=0,
                   help="with --parameter-search 1: train K search trials at "
                        "a time as one vmapped program instead of K "
                        "sequential runs (rlt_tpu/population.py); combine "
                        "with --data-parallel 1 to shard the member axis "
                        "over all visible chips (whole members per chip)")
    return p


def config_from_args(args) -> config_lib.TrainConfig:
    cfg = config_lib.TrainConfig(
        retrieve_data=args.retrieve_data, dataset_name=args.dataset_name,
        dataset_base=args.dataset_base, batch_size=args.batch_size,
        model_name=args.model_name, num_tasks=args.num_tasks,
        dropout=args.dropout, criterion=args.criterion, div_type=args.div_type,
        loss_override=args.loss_override,
        augmented_reward=bool(args.augmented_reward),
        rerank_weight=args.rerank_weight, class_weight=args.class_weight,
        epochs=args.epochs, lr=args.lr, weight_decay=args.weight_decay,
        seed=args.seed, model_path=args.model_path,
        model_persist=bool(args.model_persist), save_path=args.save_path,
        log_dir=args.log_dir, draw=bool(args.draw),
        parameter_search=bool(args.parameter_search),
        regularizer_search=bool(args.regularizer_search),
        mt_search=bool(args.mt_search), search_times=args.search_times,
        parameter_record=args.parameter_record,
        compute_dtype=args.compute_dtype,
        data_parallel=bool(args.data_parallel),
        model_parallel=args.model_parallel,
    )
    # config-file override chain (run.py:339-347)
    if args.conf_file:
        cfg = config_lib.load_conf_file(cfg, args.conf_file)
    elif not args.no_preset:
        cfg = config_lib.apply_preset(cfg)
    return cfg


def draw_search_trials(cfg: config_lib.TrainConfig) -> list[dict]:
    """The reference's trial distributions (run.py:349-364) as a list of
    config-override dicts, drawn with the exact rng chain the sequential
    search uses — so the sequential and population engines train the SAME
    trials for a given (cfg.seed, search mode, search_times)."""
    rng = np.random.default_rng(cfg.seed)
    task_weight_range = np.logspace(-2, 1, num=250, base=10)
    trials = []
    for i in range(cfg.search_times):
        if cfg.regularizer_search:
            trials.append({
                "dropout": float(rng.uniform(0.05, 0.5)),
                "weight_decay": float(rng.uniform(0.001, 0.02)),
            })
        elif cfg.mt_search:
            rw = float(rng.uniform(0.01, 10)) if i >= 50 else float(task_weight_range[i])
            cw = float(rng.uniform(0.01, 10)) if i >= 50 else float(task_weight_range[i])
            trials.append({"rerank_weight": rw, "class_weight": cw})
        else:
            trials.append({})
    return trials


def _search_record_path(cfg: config_lib.TrainConfig) -> str:
    # the reference derives the record name in search mode (run.py:350);
    # an explicitly set parameter_record wins here
    if cfg.parameter_record is not None:
        return cfg.parameter_record
    return (
        f"{cfg.model_name}_{cfg.retrieve_data}_{cfg.dataset_name}_"
        f"{cfg.criterion}_params.log"
    )


def _search_record_line(trial: config_lib.TrainConfig, result: dict) -> str:
    return (
        f"dropout: {trial.dropout}, L2_weight: {trial.weight_decay}, "
        f"rerank_weight: {trial.rerank_weight}, class_weight: {trial.class_weight}, "
        f"best_f1: {result['best_f1']}, best_dcg: {result['best_dcg']}"
    )


def parameter_search(cfg: config_lib.TrainConfig, population: int = 0) -> None:
    """Random/logspace hyper-parameter search (run.py:349-364).

    population=0 trains the trials sequentially like the reference;
    population=K trains them K at a time as ONE vmapped program
    (rlt_tpu/population.py) — same trials, same record lines, but the chip
    sees K× fatter matmuls instead of K sequential mostly-idle runs.

    With cfg.data_parallel the population's member axis is additionally
    sharded over a 1-D device mesh (whole members per chip, zero
    collectives). train_population requires K to divide the mesh, so each
    chunk gets a mesh over the LARGEST divisor of its size that the backend
    can supply (a trailing chunk of 3 on 8 chips runs on 3; a chunk of 1
    runs unsharded) — never an error mid-search, never a silent no-shard
    when sharding is possible."""
    trials = draw_search_trials(cfg)
    record = _search_record_path(cfg)

    def write(trial, result):
        with open(record, "a+") as f:
            f.write("\n" + _search_record_line(trial, result))

    if population > 1:
        from rlt_tpu.population import Member, train_population

        n_dev = 0
        if cfg.data_parallel:
            from rlt_tpu.parallel import data_parallel_mesh

            n_dev = len(jax.devices())

        def chunk_mesh(k: int):
            m = min(k, n_dev)
            while m > 1 and k % m:
                m -= 1
            if m <= 1:
                return None
            logger.info("population chunk of %d sharded over %d devices",
                        k, m)
            return data_parallel_mesh(m)

        for lo in range(0, len(trials), population):
            chunk = trials[lo:lo + population]
            members = [Member(seed=cfg.seed, **ov) for ov in chunk]
            logger.info("population search trials %d..%d: %s", lo,
                        lo + len(chunk) - 1, members)
            out = train_population(cfg, members,
                                   mesh=chunk_mesh(len(chunk)) if n_dev else None)
            for ov, row in zip(chunk, out["per_member"]):
                write(dataclasses.replace(cfg, **ov), row)
        return

    for i, ov in enumerate(trials):
        trial = dataclasses.replace(cfg, **ov)
        logger.info("search trial %d: %s", i, trial)
        write(trial, Trainer(trial).run())


def main(argv=None) -> dict | None:
    logging.basicConfig(level=logging.INFO)
    args = build_argparser().parse_args(argv)
    cfg = config_from_args(args)
    logger.info("%s", cfg)
    if cfg.parameter_search:
        parameter_search(cfg, population=args.population)
        return None
    return Trainer(cfg).run(profile_dir=args.profile_dir, resume=bool(args.resume))


if __name__ == "__main__":
    main()
