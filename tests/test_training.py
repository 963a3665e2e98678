"""Trainer / replay / learner tests (tiny configs)."""

import os

import jax
import numpy as np

from alphazero_risk_tpu.config import Config
from alphazero_risk_tpu.training import actor as A
from alphazero_risk_tpu.training.replay import ReplayBuffer
from alphazero_risk_tpu.training.trainer import Trainer
from alphazero_risk_tpu.agents import mirrored_initial_states

TINY = Config(blocks=1, filters=16, value_hidden=16, mcts_simulations=4,
              max_depth=8, batch_size=32, env_batch_per_device=8,
              train_iteration_games=8, compare_games=8, epochs=1,
              benchmark_games_random=4, benchmark_games_script=4,
              max_game_steps=150, samples_storage_min_batches=2,
              samples_storage_max_batches=4)


def fake_samples(n, cfg):
    rng = np.random.default_rng(0)
    pol = rng.random((n, 43)).astype(np.float32)
    pol /= pol.sum(-1, keepdims=True)
    return {
        "owner": rng.integers(0, 3, (n, 42)).astype(np.int8),
        "army": rng.integers(1, 33, (n, 42)).astype(np.int8),
        "cur_player": rng.integers(0, 2, n).astype(np.int8),
        "phase": rng.integers(0, 6, n).astype(np.int8),
        "round": rng.integers(1, 59, n).astype(np.int16),
        "reinforcements": rng.integers(0, 20, n).astype(np.int16),
        "attacks_during_turn": rng.integers(0, 8, n).astype(np.int16),
        "can_draw_card": rng.integers(0, 2, n).astype(bool),
        "policy": pol,
        "value": rng.choice([-1.0, 0.0, 1.0], n).astype(np.float32),
    }


def test_replay_trim_semantics():
    cfg = TINY  # min = 64, max = 128
    buf = ReplayBuffer(cfg)
    buf.extend(fake_samples(100, cfg))
    assert buf.trim() == 0          # below max, no old marker
    buf.mark_old_games()            # old_game_index = 99
    buf.extend(fake_samples(60, cfg))
    # 160 > max(128): drop oldest 32 regardless of marker
    assert buf.trim() == 32
    assert len(buf) == 128
    # now above min(64) with marker: drop min(old_index, excess)
    assert buf.old_game_index == 67
    dropped = buf.trim()
    assert dropped == 64
    assert len(buf) == 64


def test_replay_save_load(tmp_path):
    buf = ReplayBuffer(TINY)
    buf.extend(fake_samples(10, TINY))
    p = str(tmp_path / "s.npz")
    buf.save(p)
    buf2 = ReplayBuffer(TINY)
    assert buf2.load(p)
    assert len(buf2) == 10
    assert np.allclose(buf2.data["policy"], buf.data["policy"])


def test_scripted_data_generation():
    cfg = TINY
    state0 = mirrored_initial_states(jax.random.PRNGKey(0), 4)
    out = jax.jit(lambda s, k: A.run_scripted_episodes(
        s, k, cfg, 200, (A.OPP_SCRIPT, A.OPP_RANDOM)))(
        state0, jax.random.PRNGKey(1))
    valid = np.asarray(out.samples.valid)
    assert valid.sum() > 100
    pi = np.asarray(out.samples.policy)
    # scripted records are one-hot
    assert np.allclose(pi[valid].max(-1), 1.0)
    buf = ReplayBuffer(cfg)
    n = buf.extend_from_actor(out.samples, out.status)
    assert n == valid.sum()


def test_trainer_iteration(tmp_path):
    os.chdir(tmp_path)
    t = Trainer(TINY, seed=0)
    t.generate_selfplay()
    assert len(t.replay) > 50
    pi_l, v_l = t.train_epochs()
    assert np.isfinite(pi_l) and np.isfinite(v_l)
    improved = t.gate()
    assert isinstance(improved, bool)
    if improved:
        assert t.ckpt.exists("best")


def test_trainer_resume_mid_train(tmp_path):
    """Restart-mid-train: iteration numbering continues, the RNG key is
    NOT reseeded identically, and weights/replay round-trip
    (trainer meta sidecar; completes the reference's restart-the-binary
    resume, alphazero_trainer.cpp:14-15)."""
    os.chdir(tmp_path)
    cfg = TINY.replace(compare_games=0)   # gate always accepts
    t = Trainer(cfg, seed=0)
    t.train(iterations=2, resume=False, do_benchmark=False)
    key_after = np.asarray(t.key).tolist()
    assert t.ckpt.exists("iter-1")

    t2 = Trainer(cfg, seed=0)
    key_fresh = np.asarray(t2.key).tolist()
    t2.train(iterations=1, resume=True, do_benchmark=False)
    # continued numbering: next checkpoint role is iter-2, not iter-0
    assert t2.ckpt.exists("iter-2")
    # the restored key is the persisted mid-train key, not the seed
    assert key_after != key_fresh
    assert len(t2.replay) > 0            # replay restored


def test_learner_loss_decreases(tmp_path):
    os.chdir(tmp_path)
    t = Trainer(TINY, seed=1)
    t.replay.extend(fake_samples(256, TINY))
    losses = [t.train_epochs(epochs=1)[0] for _ in range(4)]
    assert losses[-1] < losses[0], losses


def test_trainer_fast_infer_path(tmp_path):
    """Folded fast inference wired through benchmark + gate; fold cache
    must refresh when actor weights change."""
    os.chdir(tmp_path)
    cfg = TINY.replace(fast_infer=True, benchmark_games_script=2,
                       benchmark_games_random=2, compare_games=4,
                       max_game_steps=120, actor_chunk_steps=60)
    t = Trainer(cfg, seed=2)
    f1 = t._gen_folded()
    assert t._gen_folded() is f1          # cached
    res = t.benchmark()
    assert res[0]["games"] == 2
    t.replay.extend(fake_samples(64, cfg))
    t.train_epochs(epochs=1)
    improved = t.gate(revert_on_fail=False)
    assert isinstance(improved, bool)
    if improved:
        assert t._folded_gen is None or t._gen_folded() is not f1


def test_play_fast_path(tmp_path):
    """Benchmark/play path (opponent fast-forward, no records) end-to-end."""
    os.chdir(tmp_path)
    from alphazero_risk_tpu.training import actor as A
    t = Trainer(TINY.replace(max_game_steps=900, actor_chunk_steps=64),
                seed=3)
    res = t.play(A.OPP_RANDOM, 4)
    assert res["games"] == 4
    assert res["unfinished"] == 0
    assert res["p0_wins"] + res["p1_wins"] + res["draws"] == 4


def test_sequential_verdict_math():
    from alphazero_risk_tpu.training.trainer import sequential_verdict

    # insufficient evidence: below the decided-games floor
    assert sequential_verdict(90, 0, 0.55) is None
    # clear accept / clear reject once past the floor
    assert sequential_verdict(90, 10, 0.55) is True
    assert sequential_verdict(30, 70, 0.55) is False
    # borderline stays undecided at moderate n
    assert sequential_verdict(55, 45, 0.55) is None
    # symmetric gate at 0.5
    assert sequential_verdict(80, 20, 0.5) is True
    assert sequential_verdict(20, 80, 0.5) is False


def test_sequential_verdict_matches_full_length():
    """Replay simulated arena streams: whenever the sequential test stops
    early, its decision must equal the full-length threshold decision."""
    from alphazero_risk_tpu.training.trainer import sequential_verdict

    rng = np.random.default_rng(7)
    total = 384
    stops, agree = 0, 0
    for p in (0.30, 0.40, 0.48, 0.62, 0.70):
        for trial in range(20):
            outcomes = rng.random(total) < p
            full = outcomes.sum() >= total * 0.55
            w = l = 0
            early = None
            n_at_stop = total
            for i, won in enumerate(outcomes):
                w, l = w + int(won), l + int(not won)
                early = sequential_verdict(w, l, 0.55)
                if early is not None:
                    n_at_stop = i + 1
                    break
            if early is not None:
                stops += 1
                agree += int(early == full)
                assert n_at_stop < total
    # far-from-threshold streams must stop early, and essentially always
    # agree with the full-length verdict
    assert stops >= 60, stops
    assert agree / stops >= 0.99, (agree, stops)


def test_gate_early_stop_plumbing(tmp_path):
    """Early-stop wiring end-to-end on a tiny arena: aggressive stopping
    parameters, gate returns a bool and records the event."""
    os.chdir(tmp_path)
    cfg = TINY.replace(compare_games=8, arena_early_stop=True,
                       arena_early_stop_z=0.1,
                       arena_early_stop_min_games=2,
                       max_game_steps=150, actor_chunk_steps=25)
    t = Trainer(cfg, seed=5)
    t.replay.extend(fake_samples(64, cfg))
    t.train_epochs(epochs=1)
    improved = t.gate(revert_on_fail=False)
    assert isinstance(improved, bool)
    import json
    events = [json.loads(ln) for ln in
              open(t.logs.dir + "/events.jsonl")]
    assert any(e.get("kind") == "gate_early_stop" for e in events)


def test_params_npz_roundtrip(tmp_path):
    """float16 params snapshot: save -> load restores shapes/dtypes with
    half-precision-level weight agreement."""
    os.chdir(tmp_path)
    t = Trainer(TINY, seed=9)
    path = str(tmp_path / "w.npz")
    t.ckpt.save_params_npz(path, t.train_state)
    t2 = Trainer(TINY, seed=10)   # different random init
    restored = t2.ckpt.load_params_npz(path, t2.train_state)
    a = jax.tree.leaves(t.train_state.params)
    b = jax.tree.leaves(restored.params)
    assert all(x.dtype == y.dtype and x.shape == y.shape
               for x, y in zip(a, b))
    err = max(float(abs(x - y).max()) for x, y in zip(a, b))
    assert err < 2e-3, err
    bs_a = jax.tree.leaves(t.train_state.batch_stats)
    bs_b = jax.tree.leaves(restored.batch_stats)
    assert all(float(abs(x - y).max()) < 2e-3
               for x, y in zip(bs_a, bs_b))


def test_train_epochs_chunked_upload():
    """Buffers above train_upload_max_samples train as fixed-size
    device-resident chunks (one compile) instead of one giant upload
    (which OOMed the real chip at the reference's 5000+5000 data mix)."""
    cfg = TINY.replace(train_upload_max_samples=96)
    t = Trainer(cfg, seed=0)
    t.replay.extend(fake_samples(250, cfg))   # 3 chunks: 96/96/58+wrap
    pi, v = t.train_epochs(epochs=2)
    assert np.isfinite(pi) and np.isfinite(v)
    # and the small-buffer path is untouched
    t2 = Trainer(TINY, seed=0)
    t2.replay.extend(fake_samples(64, TINY))
    pi2, v2 = t2.train_epochs(epochs=1)
    assert np.isfinite(pi2) and np.isfinite(v2)
