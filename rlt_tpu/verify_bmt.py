"""Auxiliary-task learnability verification (reference verify_BMT.py).

Trains a standalone TaskC (classification, BCE, per-query AUC) or TaskR
(rerank, hinge, rerank-DCG) head either on raw ranked-list features (--ft 0)
or on the frozen trunk representation of a trained AttnCut / Choopy model
(--ft 1, verify_BMT.py:66-75) — evidence that the truncation trunk encodes the
auxiliary-task signal. TPU-first: the frozen-trunk forward and the head's
train step fuse into one jitted program; `jax.lax.stop_gradient` replaces the
torch `no_grad` trunk block."""

from __future__ import annotations

import argparse
import functools
import logging
import time

import jax
import jax.numpy as jnp
import optax

from rlt_tpu.config import TrainConfig
from rlt_tpu.data import DeviceDataset, epoch_permutation, synthetic_dataset, load_pkl_dataset
from rlt_tpu.models import AttnCut, Choopy, TaskC, TaskR
from rlt_tpu.models.layers import LSTM, TransformerEncoder
from rlt_tpu.train import TrainState, make_optimizer
from rlt_tpu.utils import losses as losses_lib
from rlt_tpu.utils import metrics as metrics_lib
from rlt_tpu.utils.checkpoint import load_params
from rlt_tpu.data.datasets import synthetic_config

logger = logging.getLogger("rlt_tpu.verify_bmt")


def trunk_apply(model_name: str, params, x, *, seq_len: int, dropout: float,
                use_pallas: bool = False):
    """Frozen-trunk representation (verify_BMT.py:66-75): AttnCut = BiLSTM +
    attention; Choopy = learned-PE concat + attention. No decision head."""
    if model_name == "attncut":
        h = LSTM(128, 2).apply({"params": params["encoding_layer"]}, x)
        h = TransformerEncoder(256, 4, 1, dropout=dropout, use_pallas=use_pallas).apply(
            {"params": params["attention_layer"]}, h, True
        )
        return h
    if model_name == "choopy":
        pe = params["position_encoding"]
        pe = jnp.broadcast_to(pe, (x.shape[0],) + pe.shape)
        h = jnp.concatenate([x, pe], axis=2)
        return TransformerEncoder(128, 8, 3, dropout=dropout, use_pallas=use_pallas).apply(
            {"params": params["attention_layer"]}, h, True
        )
    raise ValueError(f"no trunk for {model_name!r}")


def run_verification(cfg: TrainConfig, verify_type: str = "r", ft: bool = False,
                     data=None) -> list[float]:
    """Returns the per-epoch train metric record (verify_BMT.py:96,145)."""
    if data is None:
        if cfg.dataset_base:
            from rlt_tpu.config import loader_family

            family = loader_family(cfg.model_name, cfg.retrieve_data)
            data = load_pkl_dataset(cfg.dataset_base, cfg.retrieve_data,
                                    cfg.dataset_name, family)
        else:
            data = synthetic_dataset(num_queries=cfg.synthetic_queries,
                                     seq_len=cfg.seq_len,
                                     num_features=cfg.input_size, seed=cfg.seed,
                                     **synthetic_config(cfg.retrieve_data, cfg.dataset_name))
    dd = DeviceDataset.from_host(data, cfg.batch_size)

    head = TaskC() if verify_type == "c" else TaskR()
    criterion = losses_lib.bce_loss if verify_type == "c" else losses_lib.rerank_loss
    metric_fn = metrics_lib.taskc_metric if verify_type == "c" else metrics_lib.taskr_metric
    metric_name = "auc" if verify_type == "c" else "DCG"

    trunk_params = None
    if ft:
        cut_model = (
            AttnCut(input_size=cfg.input_size, dropout=cfg.dropout)
            if cfg.model_name == "attncut"
            else Choopy(seq_len=cfg.seq_len, dropout=cfg.dropout)
        )
        key = jax.random.PRNGKey(cfg.seed)
        sample = jnp.zeros((1, cfg.seq_len, cfg.input_size), jnp.float32)
        trunk_params = cut_model.init({"params": key, "dropout": key}, sample)["params"]
        if cfg.model_path:
            loaded = load_params(cfg.model_path, like=trunk_params)
            if loaded is not None:
                trunk_params = loaded
                logger.info("loaded frozen trunk from %s", cfg.model_path)

    def features(x):
        if not ft:
            return x
        h = trunk_apply(cfg.model_name, trunk_params, x, seq_len=cfg.seq_len,
                        dropout=cfg.dropout)
        return jax.lax.stop_gradient(h)

    key = jax.random.PRNGKey(cfg.seed + 1)
    feat_dim = 128 if (ft and cfg.model_name == "choopy") else (
        256 if ft else cfg.input_size)
    head_params = head.init(key, jnp.zeros((1, cfg.seq_len, feat_dim)))["params"]
    optimizer = make_optimizer(cfg.lr, cfg.weight_decay)
    state = TrainState(head_params, optimizer.init(head_params), key)

    def loss_fn(params, x, y, valid):
        out = head.apply({"params": params}, features(x))
        return criterion(out, y, valid=valid), out

    def train_step(st, batch):
        (idx, valid), x_all, y_all = batch
        x, y = x_all[idx], y_all[idx]
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params, x, y, valid)
        updates, opt_state = optimizer.update(grads, st.opt_state, st.params)
        st = TrainState(optax.apply_updates(st.params, updates), opt_state, st.rng)
        return st, (loss, metric_fn(y, out, valid=valid))

    def eval_step(params, batch):
        (idx, valid), x_all, y_all = batch
        x, y = x_all[idx], y_all[idx]
        loss, out = loss_fn(params, x, y, valid)
        return loss, metric_fn(y, out, valid=valid)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(st, key):
        k1, k2 = jax.random.split(key)
        tr = epoch_permutation(k1, dd.n_train, dd.batch_size)
        te = epoch_permutation(k2, dd.n_test, dd.batch_size)
        st, (tl, tm) = jax.lax.scan(
            lambda s, b: train_step(s, (b, dd.x_train, dd.y_train)), st,
            tr)
        _, (el, em) = jax.lax.scan(
            lambda c, b: (None, eval_step(st.params, (b, dd.x_test, dd.y_test))),
            None, te)
        return st, {"train_loss": jnp.mean(tl), "train_metric": jnp.mean(tm),
                    "test_loss": jnp.mean(el), "test_metric": jnp.mean(em)}

    record = []
    key = jax.random.PRNGKey(cfg.seed + 2)
    for epoch in range(cfg.epochs):
        start = time.time()
        key, sub = jax.random.split(key)
        state, m = epoch_fn(state, sub)
        m = jax.device_get(m)
        record.append(float(m["train_metric"]))
        logger.info(
            "Epoch %d (%.2fs): train loss=%.5f %s=%.6f | test loss=%.5f %s=%.6f",
            epoch, time.time() - start, m["train_loss"], metric_name,
            m["train_metric"], m["test_loss"], metric_name, m["test_metric"],
        )
    print(record)
    return record


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="rlt_tpu auxiliary-task verification")
    p.add_argument("--retrieve-data", type=str, default="robust04")
    p.add_argument("--dataset-name", type=str, default="drmm_tks")
    p.add_argument("--dataset-base", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=20)
    p.add_argument("--model-name", type=str, default="attncut")
    p.add_argument("--verify-type", type=str, default="r")
    p.add_argument("--model-path", type=str, default=None)
    p.add_argument("--ft", type=int, default=0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=3e-5)
    p.add_argument("--weight-decay", type=float, default=0.0015)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    cfg = TrainConfig(
        retrieve_data=args.retrieve_data, dataset_name=args.dataset_name,
        dataset_base=args.dataset_base, batch_size=args.batch_size,
        model_name=args.model_name, dropout=args.dropout, epochs=args.epochs,
        lr=args.lr, weight_decay=args.weight_decay, seed=args.seed,
        model_path=args.model_path,
    )
    return run_verification(cfg, verify_type=args.verify_type, ft=bool(args.ft))


if __name__ == "__main__":
    main()
