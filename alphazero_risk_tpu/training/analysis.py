"""Analysis mode: k-fold cross-validation over saved training samples.

Mirrors reference ``AlphaZeroNN::trainCrossValidation``
(alphazero_nn.cpp:412-577): split the sample store into k folds, train a
fresh model on k-1 folds with dynamic epochs (stop after 3 epochs without
>= 1% validation improvement), report per-fold validation losses.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from . import actor as A
from .learner import create_train_state, make_epoch_fn
from .replay import ReplayBuffer


def _val_losses(net, cfg, state, data, batch_size):
    n = jax.tree.leaves(data)[0].shape[0]
    nb = max(n // batch_size, 1)
    pi_total = v_total = 0.0
    for i in range(nb):
        idx = jnp.arange(i * batch_size, min((i + 1) * batch_size, n))
        sub = jax.tree.map(lambda x: x[idx], data)
        sb = A.SampleBatch(valid=None, **{k: sub[k] for k in sub})
        feats = A.features_of_samples(sb, cfg)
        logits, value = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            feats, train=False)
        logp = jax.nn.log_softmax(logits, -1)
        pi_total += float(-(sub["policy"] * logp).sum(-1).mean())
        v_total += float(jnp.mean(jnp.square(value - sub["value"])))
    return pi_total / nb, v_total / nb


def cross_validate(cfg: Config, samples_path: str, folds: int = 5,
                   max_epochs: int = 30, seed: int = 0,
                   patience: int = 3, threshold: float = 0.01) -> Dict:
    buf = ReplayBuffer(cfg)
    if not buf.load(samples_path):
        return {"error": f"no samples at {samples_path}"}
    n = len(buf)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    fold_sizes = [n // folds] * folds
    report = {"folds": [], "samples": n}
    offset = 0
    for f in range(folds):
        val_idx = perm[offset:offset + fold_sizes[f]]
        train_idx = np.concatenate([perm[:offset],
                                    perm[offset + fold_sizes[f]:]])
        offset += fold_sizes[f]
        data_all = {k: jnp.asarray(v) for k, v in buf.data.items()}
        dtrain = jax.tree.map(lambda x: x[jnp.asarray(train_idx)], data_all)
        dval = jax.tree.map(lambda x: x[jnp.asarray(val_idx)], data_all)

        net, tx, state = create_train_state(cfg, jax.random.PRNGKey(seed + f))

        def prepare(data, idx):
            sub = jax.tree.map(lambda x: x[idx], data)
            sb = A.SampleBatch(valid=None, **{k: sub[k] for k in sub})
            return {"features": A.features_of_samples(sb, cfg),
                    "policy": sub["policy"].astype(jnp.float32),
                    "value": sub["value"]}

        epoch = jax.jit(make_epoch_fn(net, tx, cfg, prepare_batch=prepare))
        best, stale, history = float("inf"), 0, []
        key = jax.random.PRNGKey(1000 + f)
        for e in range(max_epochs):
            key, sub = jax.random.split(key)
            state, _ = epoch(state, dtrain, sub)
            pi_l, v_l = _val_losses(net, cfg, state, dval, cfg.batch_size)
            total = pi_l + v_l
            history.append({"epoch": e, "val_pi": pi_l, "val_v": v_l})
            if total < best * (1 - threshold):
                best, stale = total, 0
            else:
                stale += 1
                if stale >= patience:
                    break
        report["folds"].append({"fold": f, "best_val": best,
                                "epochs": len(history),
                                "history": history})
    return report
