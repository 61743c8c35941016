"""Representation probing (reference verify_probe.py).

Phase 1 trains a 2-expert ProbeBase on the multi-task cut loss (the base's
final heads only, verify_probe.py:92-130). Phase 2 freezes the base and trains
six probe towers — classification + rerank probes on the pre-encoding
representation and on each expert's output — logging per-step AUC / rerank-DCG
(verify_probe.py:170-228). TPU-first: the six probes share one optimizer over
disjoint parameter subtrees (mathematically identical to the reference's six
Adams) and the frozen-base forward + all six probe updates fuse into a single
jitted step."""

from __future__ import annotations

import argparse
import logging
import time

import jax
import jax.numpy as jnp
import optax

from rlt_tpu.config import TrainConfig
from rlt_tpu.data import DeviceDataset, epoch_permutation, load_pkl_dataset, synthetic_dataset
from rlt_tpu.models import Probe, ProbeBase
from rlt_tpu.train import TrainState, make_optimizer
from rlt_tpu.utils import losses as losses_lib
from rlt_tpu.utils import metrics as metrics_lib
from rlt_tpu.utils.checkpoint import load_params, save_params
from rlt_tpu.utils.logging import MetricsWriter
from rlt_tpu.data.datasets import synthetic_config
from rlt_tpu.utils.platform import pallas_supported

logger = logging.getLogger("rlt_tpu.verify_probe")

PROBE_TAGS = (
    "probe/pre_encoding_classification", "probe/pre_encoding_rerank",
    "probe/expert0_classification", "probe/expert0_rerank",
    "probe/expert1_classification", "probe/expert1_rerank",
)


class ProbeTrainer:
    def __init__(self, cfg: TrainConfig, epochs_base: int = 20,
                 epochs_probe: int = 180, data=None):
        self.cfg = cfg
        self.epochs_base = epochs_base
        self.epochs_probe = epochs_probe
        if data is None:
            if cfg.dataset_base:
                from rlt_tpu.config import loader_family

                # probe_base follows the MMOE family's loaders (Probe.py
                # consumes the same pkls as MMOECut)
                family = loader_family("probe_base", cfg.retrieve_data)
                data = load_pkl_dataset(cfg.dataset_base, cfg.retrieve_data,
                                        cfg.dataset_name, family)
            else:
                data = synthetic_dataset(num_queries=cfg.synthetic_queries,
                                         seq_len=cfg.seq_len,
                                         num_features=cfg.input_size,
                                         seed=cfg.seed,
                                         **synthetic_config(cfg.retrieve_data, cfg.dataset_name))
        self.data = DeviceDataset.from_host(data, cfg.batch_size)

        use_pallas = cfg.use_pallas and pallas_supported()
        self.base = ProbeBase(seq_len=cfg.seq_len, num_tasks=cfg.num_tasks,
                              input_size=cfg.input_size, dropout=cfg.dropout,
                              num_experts=2, use_pallas=use_pallas)
        self.probe = Probe()
        self.criterion_base = lambda out, y, valid=None: losses_lib.mtcut_loss(
            out, y, metric=cfg.criterion, rerank_weight=0.5, classi_weight=0.5,
            num_tasks=cfg.num_tasks, valid=valid,
        )
        self.optimizer = make_optimizer(cfg.lr, cfg.weight_decay)

        key = jax.random.PRNGKey(cfg.seed)
        pk, dk, self.key = jax.random.split(key, 3)
        sample = jnp.zeros((1, cfg.seq_len, cfg.input_size), jnp.float32)
        base_params = self.base.init({"params": pk, "dropout": dk}, sample)["params"]
        if cfg.model_path:
            loaded = load_params(cfg.model_path, like=base_params)
            if loaded is not None:
                base_params = loaded
                logger.info("loaded ProbeBase from %s", cfg.model_path)
        self.base_state = TrainState(base_params, self.optimizer.init(base_params), dk)

        ei, eo, _ = self.base.apply({"params": base_params}, sample, True)
        probe_params = self.probe.init(pk, ei, eo)["params"]
        self.probe_state = TrainState(probe_params, self.optimizer.init(probe_params), dk)

        self.writer = MetricsWriter(cfg.log_dir, run_name="probe")
        self.best_test_f1 = -float("inf")
        self.best_test_dcg = -float("inf")
        self.f1_record: list[float] = []
        self.dcg_record: list[float] = []

        self._build_steps()

    def _build_steps(self):
        base, probe, optimizer = self.base, self.probe, self.optimizer
        criterion = self.criterion_base
        dd = self.data

        def base_loss(params, x, y, valid, rng):
            out = base.apply({"params": params}, x, deterministic=False,
                             rngs={"dropout": rng})
            return criterion(out[-1], y, valid=valid), out

        def base_train_step(st, batch):
            (idx, valid) = batch
            x, y = dd.x_train[idx], dd.y_train[idx]
            rng, sub = jax.random.split(st.rng)
            (loss, out), grads = jax.value_and_grad(base_loss, has_aux=True)(
                st.params, x, y, valid, sub)
            updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
            st = TrainState(optax.apply_updates(st.params, updates), opt_state, rng)
            ks = metrics_lib.decode_cut(out[-1][-1])
            return st, (loss, metrics_lib.f1_at_k(y, ks, valid=valid),
                        metrics_lib.dcg_at_k(y, ks, valid=valid))

        def base_eval_step(params, batch):
            (idx, valid) = batch
            x, y = dd.x_test[idx], dd.y_test[idx]
            out = base.apply({"params": params}, x, True)
            loss = criterion(out[-1], y, valid=valid)
            ks = metrics_lib.decode_cut(out[-1][-1])
            return (loss, metrics_lib.f1_at_k(y, ks, valid=valid),
                    metrics_lib.dcg_at_k(y, ks, valid=valid))

        @jax.jit
        def base_epoch(st, key):
            k1, k2 = jax.random.split(key)
            tr = epoch_permutation(k1, dd.n_train, dd.batch_size)
            te = epoch_permutation(k2, dd.n_test, dd.batch_size)
            st, (tl, tf1, tdcg) = jax.lax.scan(base_train_step, st, tr)
            _, (el, ef1, edcg) = jax.lax.scan(
                lambda c, b: (None, base_eval_step(st.params, b)), None, te)
            return st, {
                "train_loss": jnp.mean(tl), "train_f1": jnp.mean(tf1),
                "train_dcg": jnp.mean(tdcg), "test_loss": jnp.mean(el),
                "test_f1": jnp.mean(ef1), "test_dcg": jnp.mean(edcg),
            }

        def probe_losses(params, ei, eo, y, valid):
            c1, r1, ce1, ce2, re1, re2 = probe.apply({"params": params}, ei, eo)
            loss = (
                losses_lib.bce_loss(c1, y, valid=valid)
                + losses_lib.rerank_loss(r1, y, valid=valid)
                + losses_lib.bce_loss(ce1, y, valid=valid)
                + losses_lib.bce_loss(ce2, y, valid=valid)
                + losses_lib.rerank_loss(re1, y, valid=valid)
                + losses_lib.rerank_loss(re2, y, valid=valid)
            )
            return loss, (c1, r1, ce1, ce2, re1, re2)

        def probe_train_step(st, batch, base_params):
            (idx, valid) = batch
            x, y = dd.x_train[idx], dd.y_train[idx]
            ei, eo, _ = base.apply({"params": base_params}, x, True)
            ei, eo = jax.lax.stop_gradient((ei, eo))
            (_, outs), grads = jax.value_and_grad(probe_losses, has_aux=True)(
                st.params, ei, eo, y, valid)
            updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
            st = TrainState(optax.apply_updates(st.params, updates), opt_state, st.rng)
            c1, r1, ce1, ce2, re1, re2 = outs
            step_metrics = jnp.stack([
                metrics_lib.taskc_metric(y, c1, valid=valid),
                metrics_lib.taskr_metric(y, r1, valid=valid),
                metrics_lib.taskc_metric(y, ce1, valid=valid),
                metrics_lib.taskr_metric(y, re1, valid=valid),
                metrics_lib.taskc_metric(y, ce2, valid=valid),
                metrics_lib.taskr_metric(y, re2, valid=valid),
            ])
            return st, step_metrics

        @jax.jit
        def probe_epoch(st, base_params, key):
            tr = epoch_permutation(key, dd.n_train, dd.batch_size)
            st, per_step = jax.lax.scan(
                lambda s, b: probe_train_step(s, b, base_params), st, tr)
            return st, per_step  # (num_batches, 6)

        self._base_epoch = base_epoch
        self._probe_epoch = probe_epoch

    def run(self, ft: bool = False):
        cfg = self.cfg
        if not ft:
            logger.info("Train the Base model")
            for epoch in range(self.epochs_base):
                start = time.time()
                self.key, sub = jax.random.split(self.key)
                self.base_state, m = self._base_epoch(self.base_state, sub)
                m = jax.device_get(m)
                self.writer.log(epoch, {f"base_{k}": v for k, v in m.items()})
                test_f1, test_dcg = float(m["test_f1"]), float(m["test_dcg"])
                self.f1_record.append(test_f1)
                self.dcg_record.append(test_dcg)
                if test_f1 > self.best_test_f1:
                    self.best_test_f1 = test_f1
                    save_params(f"{cfg.save_path}/probe_base", self.base_state.params)
                self.best_test_dcg = max(self.best_test_dcg, test_dcg)
                logger.info("base epoch %d (%.2fs): test f1=%.5f dcg=%.5f",
                            epoch, time.time() - start, test_f1, test_dcg)

        logger.info("Train the probes")
        probe_curves = []
        for epoch in range(self.epochs_probe):
            self.key, sub = jax.random.split(self.key)
            self.probe_state, per_step = self._probe_epoch(
                self.probe_state, self.base_state.params, sub)
            per_step = jax.device_get(per_step)
            probe_curves.append(per_step)
            for s in range(per_step.shape[0]):
                self.writer.log(
                    epoch * per_step.shape[0] + s,
                    dict(zip(PROBE_TAGS, per_step[s])),
                )
        self.writer.close()
        return probe_curves


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="rlt_tpu representation probing")
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--dataset-name", type=str, default="drmm_tks")
    p.add_argument("--dataset-base", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--criterion", type=str, default="f1")
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--ft", type=int, default=1)
    p.add_argument("--epochs-base", type=int, default=20)
    p.add_argument("--epochs-probe", type=int, default=180)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight-decay", type=float, default=0.005)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    cfg = TrainConfig(
        retrieve_data=args.retrieve_data, dataset_name=args.dataset_name,
        dataset_base=args.dataset_base, batch_size=args.batch_size,
        model_name="probe_base", criterion=args.criterion,
        dropout=args.dropout, lr=args.lr, weight_decay=args.weight_decay,
        seed=args.seed, model_path=args.model_path,
    )
    trainer = ProbeTrainer(cfg, epochs_base=args.epochs_base,
                           epochs_probe=args.epochs_probe)
    return trainer.run(ft=bool(args.ft) and args.model_path is not None)


if __name__ == "__main__":
    main()
