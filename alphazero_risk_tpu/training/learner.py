"""Learner: loss, optimizer, and jitted epoch training.

Replaces the reference's TF-session training path
(``alphazero_nn.cpp:351-410``): shuffled minibatch Adam epochs over the
replay buffer, loss = softmax-CE(policy) + MSE(value) + 1e-3 L2
(``build_graph.py:92-103``).  The whole epoch runs on device as one
``lax.scan`` over minibatches — no per-batch host round trips.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import Config
from ..models.resnet import AZNet, build_network


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(cfg: Config, key: jax.Array
                       ) -> Tuple[AZNet, optax.GradientTransformation,
                                  TrainState]:
    net = build_network(cfg)
    dummy = jnp.zeros((1, 7, 6, cfg.num_features), jnp.float32)
    variables = net.init(key, dummy, train=False)
    tx = optax.adam(cfg.learning_rate)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
    return net, tx, state


def l2_penalty(params) -> jax.Array:
    """tf.keras.regularizers.l2 semantics: coeff * sum(w**2) over conv/dense
    kernels (BN scales/biases are not regularized in the reference)."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if name == "kernel":
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return total


def loss_fn(net: AZNet, cfg: Config, params, batch_stats,
            batch: Dict[str, jax.Array]):
    (logits, value), mutated = net.apply(
        {"params": params, "batch_stats": batch_stats},
        batch["features"], train=True, mutable=["batch_stats"])
    logp = jax.nn.log_softmax(logits, axis=-1)
    pi_loss = -(batch["policy"] * logp).sum(-1).mean()
    v_loss = jnp.mean(jnp.square(value - batch["value"]))
    l2 = cfg.l2_coeff * l2_penalty(params)
    total = pi_loss + v_loss + l2
    aux = {"pi_loss": pi_loss, "v_loss": v_loss, "l2": l2,
           "batch_stats": mutated["batch_stats"]}
    return total, aux


def make_update_fn(net: AZNet, tx: optax.GradientTransformation,
                   cfg: Config):
    def update(state: TrainState, batch: Dict[str, jax.Array]):
        grad_fn = jax.value_and_grad(
            lambda p: loss_fn(net, cfg, p, state.batch_stats, batch),
            has_aux=True)
        (total, aux), grads = grad_fn(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=aux["batch_stats"],
                                  opt_state=opt_state)
        metrics = {"loss": total, "pi_loss": aux["pi_loss"],
                   "v_loss": aux["v_loss"]}
        return new_state, metrics
    return update


def make_epoch_fn(net: AZNet, tx: optax.GradientTransformation, cfg: Config,
                  prepare_batch=None):
    """One epoch = shuffle + scan of minibatch updates, fully on device.

    Mirrors reference ``AlphaZeroNN::train`` (alphazero_nn.cpp:351-410):
    per-epoch reshuffle, ``N // batch_size`` batches (remainder dropped),
    returns mean policy/value losses for the epoch log.

    ``prepare_batch(data, idx) -> {features, policy, value}`` lets callers
    keep the replay compact on device and expand feature planes per
    minibatch (the reference stores compact NNInputData and expands at
    tensor-build time too, alphazero_nn.cpp:31-67).
    """
    update = make_update_fn(net, tx, cfg)
    if prepare_batch is None:
        def prepare_batch(data, idx):
            return jax.tree.map(lambda x: x[idx], data)

    def epoch(state: TrainState, data, key: jax.Array):
        n = jax.tree.leaves(data)[0].shape[0]
        nb = n // cfg.batch_size
        perm = jax.random.permutation(key, n)[: nb * cfg.batch_size]
        perm = perm.reshape(nb, cfg.batch_size)

        def body(st, idx):
            return update(st, prepare_batch(data, idx))

        state, metrics = jax.lax.scan(body, state, perm)
        return state, jax.tree.map(jnp.mean, metrics)

    return epoch


def make_ring_epoch_fn(net: AZNet, tx: optax.GradientTransformation,
                       cfg: Config, prepare_batch=None):
    """``make_epoch_fn`` over a device-resident ring buffer.

    ``data`` holds ``cap`` physical slots of which the logical window
    ``[start, start+size) mod cap`` is valid (training/device_replay.py);
    the shuffled epoch must draw only from that window while every shape
    stays static.  A masked argsort turns one uniform vector into a
    permutation of the valid window (invalid slots sort last), and a
    ``fori_loop`` with the dynamic trip count ``size // batch_size``
    replaces the scan — no recompilation when the buffer grows.
    """
    update = make_update_fn(net, tx, cfg)
    if prepare_batch is None:
        def prepare_batch(data, idx):
            return jax.tree.map(lambda x: x[idx], data)

    def epoch(state: TrainState, data, start, size, key: jax.Array):
        cap = jax.tree.leaves(data)[0].shape[0]
        nb_max = cap // cfg.batch_size
        steps = size // cfg.batch_size
        r = jax.random.uniform(key, (cap,))
        # valid logical indices first, in uniform-random order
        order = jnp.argsort(r + (jnp.arange(cap) >= size))
        phys = (start + order[: nb_max * cfg.batch_size]) % cap
        perm = phys.reshape(nb_max, cfg.batch_size)

        def body(i, carry):
            st, pi_sum, v_sum = carry
            st, metrics = update(st, prepare_batch(data, perm[i]))
            return st, pi_sum + metrics["pi_loss"], v_sum + metrics["v_loss"]

        state, pi_sum, v_sum = jax.lax.fori_loop(
            0, steps, body, (state, jnp.zeros(()), jnp.zeros(())))
        denom = jnp.maximum(steps, 1).astype(jnp.float32)
        nan = jnp.float32(jnp.nan)
        metrics = {
            "pi_loss": jnp.where(steps > 0, pi_sum / denom, nan),
            "v_loss": jnp.where(steps > 0, v_sum / denom, nan),
        }
        return state, metrics

    return epoch


def make_predict_fn(net: AZNet, cfg: Config):
    """Batched inference with invalid-move masking + renormalization
    (reference ``NNOutputData::normalize``, alphazero_nn_data.cpp:3-27)."""

    def predict(params, batch_stats, features: jax.Array,
                legal_mask: jax.Array):
        logits, value = net.apply(
            {"params": params, "batch_stats": batch_stats},
            features, train=False)
        masked = jnp.where(legal_mask, logits, -jnp.inf)
        probs = jax.nn.softmax(masked, axis=-1)
        return probs, value

    return predict
