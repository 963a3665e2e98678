"""Device-resident replay ring vs the host buffer (same semantics).

The ring (training/device_replay.py) must ingest identical actor output
to identical retained samples as the host ``ReplayBuffer`` — including
value backfill, MIN/MAX trim with ``old_game_index`` preference, ring
wraparound, npz interchange — and the learner's ring epoch must train
on exactly the valid window."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_risk_tpu.config import Config
from alphazero_risk_tpu.training import actor as A
from alphazero_risk_tpu.training.device_replay import DeviceReplay
from alphazero_risk_tpu.training.replay import ReplayBuffer


def tiny_cfg(**kw):
    base = dict(blocks=1, filters=16, value_hidden=16, batch_size=16,
                samples_storage_min_batches=2,
                samples_storage_max_batches=8)
    base.update(kw)
    return Config(**base)


def fake_actor_batch(key, t=7, b=5):
    """Random stacked SampleBatch + status as an actor would emit."""
    ks = jax.random.split(key, 6)
    pi = jax.random.dirichlet(ks[0], jnp.ones((43,)), (t, b))
    return A.SampleBatch(
        owner=jax.random.randint(ks[1], (t, b, 42), -1, 2).astype(jnp.int8),
        army=jax.random.randint(ks[2], (t, b, 42), 0, 32).astype(jnp.int8),
        cur_player=jax.random.randint(ks[3], (t, b), 0, 2).astype(jnp.int8),
        phase=jnp.zeros((t, b), jnp.int8),
        round=jnp.ones((t, b), jnp.int16),
        reinforcements=jnp.zeros((t, b), jnp.int16),
        attacks_during_turn=jnp.zeros((t, b), jnp.int16),
        can_draw_card=jnp.zeros((t, b), bool),
        policy=pi.astype(jnp.float16),
        value=jnp.zeros((t, b), jnp.float32),
        valid=jax.random.bernoulli(ks[4], 0.8, (t, b)),
    ), jax.random.randint(ks[5], (b,), -1, 2)


def ingest_both(cfg, n_rounds, seed=0):
    host, dev = ReplayBuffer(cfg), DeviceReplay(cfg)
    key = jax.random.PRNGKey(seed)
    for i in range(n_rounds):
        key, sub = jax.random.split(key)
        samples, status = fake_actor_batch(sub)
        a1 = host.extend_from_actor(samples, status)
        a2 = dev.extend_from_actor(samples, status)
        assert a1 == a2, (i, a1, a2)
    return host, dev


def assert_same_window(host, dev):
    hw = host.sample_arrays()
    dw = dev.sample_arrays()
    n = min(len(host), dev.cap)
    for k in hw:
        np.testing.assert_array_equal(hw[k][-n:], dw[k][-n:], err_msg=k)


def test_ingest_matches_host_buffer():
    cfg = tiny_cfg()
    host, dev = ingest_both(cfg, 3)
    assert len(host) == len(dev)
    assert_same_window(host, dev)
    # value backfill happened (some nonzero z from decided games)
    assert np.abs(dev.sample_arrays()["value"]).sum() > 0


def test_ring_wraparound_keeps_newest():
    cfg = tiny_cfg(samples_storage_max_batches=2)  # cap = 32 samples
    host, dev = ingest_both(cfg, 6)
    host.trim()   # host enforces max lazily; ring enforces it at write
    assert len(dev) == dev.cap == 32
    assert_same_window(host, dev)


def test_trim_old_game_preference():
    cfg = tiny_cfg()
    host, dev = ingest_both(cfg, 4)
    host.mark_old_games()
    dev.mark_old_games()
    h2, d2 = fake_actor_batch(jax.random.PRNGKey(99))
    host.extend_from_actor(h2, d2)
    dev.extend_from_actor(h2, d2)
    host.trim(), dev.trim()
    # counts of trim() itself may differ (the ring applies the MAX rule
    # at write time) but the retained windows must be identical
    assert len(host) == len(dev)
    assert_same_window(host, dev)
    # a second trim with no interleaving overflow applies the old-game
    # rule identically on both
    host.mark_old_games(), dev.mark_old_games()
    assert host.trim() == dev.trim()
    assert len(host) == len(dev)
    assert_same_window(host, dev)


def test_npz_interchange(tmp_path):
    cfg = tiny_cfg()
    host, dev = ingest_both(cfg, 3)
    p = os.path.join(tmp_path, "ring.npz")
    dev.save(p)
    back = ReplayBuffer(cfg)
    assert back.load(p)
    np.testing.assert_array_equal(back.data["policy"],
                                  dev.sample_arrays()["policy"])
    dev2 = DeviceReplay(cfg)
    assert dev2.load(p)
    assert len(dev2) == len(dev)
    assert_same_window(back, dev2)


def test_ring_epoch_trains():
    from alphazero_risk_tpu.training.learner import (create_train_state,
                                                     make_ring_epoch_fn)

    cfg = tiny_cfg(batch_size=8)
    _, dev = ingest_both(cfg, 3)
    net, tx, state = create_train_state(cfg, jax.random.PRNGKey(0))

    def prepare(data, idx):
        sub = jax.tree.map(lambda x: x[idx], data)
        sb = A.SampleBatch(valid=None, **{k: sub[k] for k in sub})
        return {"features": A.features_of_samples(sb, cfg),
                "policy": sub["policy"].astype(jnp.float32),
                "value": sub["value"]}

    epoch = jax.jit(make_ring_epoch_fn(net, tx, cfg, prepare_batch=prepare))
    data, start, size = dev.epoch_view()
    state2, m = epoch(state, data, start, size, jax.random.PRNGKey(1))
    assert int(state2.step) == int(size) // cfg.batch_size > 0
    assert np.isfinite(float(m["pi_loss"]))
    # growing the buffer must NOT recompile (dynamic trip count)
    n0 = epoch._cache_size() if hasattr(epoch, "_cache_size") else None
    dev.extend_from_actor(*fake_actor_batch(jax.random.PRNGKey(7)))
    data, start, size = dev.epoch_view()
    state3, m2 = epoch(state2, data, start, size, jax.random.PRNGKey(2))
    if n0 is not None:
        assert epoch._cache_size() == n0
    assert np.isfinite(float(m2["pi_loss"]))


def test_trainer_device_replay_iteration(tmp_path):
    """One full self-play iteration with the ring wired into the Trainer."""
    from alphazero_risk_tpu.training.trainer import Trainer

    cfg = Config(blocks=1, filters=16, value_hidden=16,
                 mcts_simulations=2, max_depth=6,
                 batch_size=16, env_batch_per_device=4,
                 train_iteration_games=4, epochs=1, compare_games=4,
                 samples_storage_min_batches=1,
                 samples_storage_max_batches=256,
                 max_game_steps=384, actor_chunk_steps=48,
                 device_replay=True,
                 checkpoint_dir=os.path.join(tmp_path, "ckpt"),
                 data_dir=os.path.join(tmp_path, "data"),
                 log_dir=os.path.join(tmp_path, "log"))
    t = Trainer(cfg, seed=3)
    assert isinstance(t.replay, DeviceReplay)
    added = t.generate_selfplay()
    assert added > 0 and len(t.replay) == added
    t.replay.trim()
    pi, v = t.train_epochs()
    assert np.isfinite(pi) and np.isfinite(v)
    improved = t.gate()
    assert improved in (True, False)
    # persistence path used by resume
    t.replay.save(os.path.join(tmp_path, "data", "s.npz"))
    t2 = Trainer(cfg, seed=4)
    assert t2.replay.load(os.path.join(tmp_path, "data", "s.npz"))
    assert len(t2.replay) == len(t.replay)
