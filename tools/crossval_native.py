"""Large-scale randomized cross-validation: JAX engine vs native riskcore.

Runs thousands of full random games in lockstep through the vectorized JAX
engine (``env/rules.py``) and the native C++ engine
(``native/riskcore.cpp``), feeding both identical (action, dice) streams
and diffing every state field after every micro-step.  The native engine
exists precisely for this (riskcore.cpp header); this tool scales the
4-game oracle parity test to tail-of-distribution coverage.

Complementary to tools/refparity.py (JAX vs the REAL reference C++): the
native engine is ~100x faster per game than the reference shim, so this
is the volume sweep; refparity is the ground-truth anchor.

Usage:
  python tools/crossval_native.py --games 10000
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIELDS = ("owner", "army", "phase", "round", "cur_player",
          "reinforcements", "cards", "card_sets_played", "mob_from",
          "mob_to", "can_draw_card", "attacks_during_turn")


def _native_snapshot(states) -> dict:
    """Stack native CRiskState structs into [B, ...] numpy arrays."""
    b = len(states)
    out = {
        "owner": np.empty((b, 42), np.int32),
        "army": np.empty((b, 42), np.int32),
        "cards": np.empty((b, 2), np.int32),
    }
    scal = {k: np.empty((b,), np.int32) for k in FIELDS
            if k not in out}
    for g, s in enumerate(states):
        out["owner"][g] = np.frombuffer(s.owner, np.int8)
        out["army"][g] = np.frombuffer(s.army, np.int8)
        out["cards"][g] = list(s.cards)
        scal["phase"][g] = s.phase
        scal["round"][g] = s.round
        scal["cur_player"][g] = s.cur_player
        scal["reinforcements"][g] = s.reinforcements
        scal["card_sets_played"][g] = s.card_sets_played
        scal["mob_from"][g] = s.mob_from
        scal["mob_to"][g] = s.mob_to
        scal["can_draw_card"][g] = s.can_draw_card
        scal["attacks_during_turn"][g] = s.attacks_during_turn
    out.update(scal)
    return out


def run_batch(batch: int, seed: int, max_steps: int = 2000) -> int:
    """One lockstep batch of full games; raises on first divergence.
    Returns total micro-steps validated."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from alphazero_risk_tpu.config import Config, STATUS_NOT_ENDED
    from alphazero_risk_tpu.env import rules
    from alphazero_risk_tpu.env.state import GameState, tree_select
    from alphazero_risk_tpu.native import NativeEngine

    cfg = Config()
    eng = NativeEngine(cfg)
    rng = np.random.default_rng(seed)

    perms = [rng.permutation(42).astype(np.int32) for _ in range(batch)]
    natives = [eng.new_game(p) for p in perms]
    snap = _native_snapshot(natives)
    b = batch
    state = GameState(
        owner=jnp.asarray(snap["owner"]), army=jnp.asarray(snap["army"]),
        phase=jnp.asarray(snap["phase"]), round=jnp.asarray(snap["round"]),
        cur_player=jnp.asarray(snap["cur_player"]),
        reinforcements=jnp.asarray(snap["reinforcements"]),
        cards=jnp.asarray(snap["cards"]),
        card_sets_played=jnp.asarray(snap["card_sets_played"]),
        mob_from=jnp.asarray(snap["mob_from"]),
        mob_to=jnp.asarray(snap["mob_to"]),
        can_draw_card=jnp.asarray(snap["can_draw_card"] != 0),
        attacks_during_turn=jnp.asarray(snap["attacks_during_turn"]),
        player_cards=jnp.zeros((b, 2, 42), bool),
        drawn_cards=jnp.zeros((b, 42), bool))

    step_fn = jax.jit(lambda s, a, d: rules.step(s, a, d, cfg))
    legal_fn = jax.jit(lambda s: rules.legal_actions(s, cfg))
    status_fn = jax.jit(lambda s: rules.game_status(s, cfg))

    live = np.ones(b, bool)
    total = 0
    for step in range(max_steps):
        if not live.any():
            break
        jax_legal = np.asarray(legal_fn(state))
        actions = np.full(b, 42, np.int32)
        dice = rng.integers(1, 7, (b, 5)).astype(np.int32)
        for g in range(b):
            if not live[g]:
                continue
            cmask = eng.legal_actions(natives[g]) != 0
            assert (cmask == jax_legal[g]).all(), (
                f"game {g} step {step}: legal masks diverged\n"
                f"  native: {np.where(cmask)[0]}\n"
                f"  jax:    {np.where(jax_legal[g])[0]}")
            acts = np.where(cmask)[0]
            actions[g] = int(acts[rng.integers(len(acts))])
            eng.step(natives[g], int(actions[g]), dice[g])
        new_state = step_fn(state, jnp.asarray(actions), jnp.asarray(dice))
        state = tree_select(jnp.asarray(live), new_state, state)

        snap = _native_snapshot(natives)
        jsnap = {k: np.asarray(getattr(state, k)) for k in FIELDS}
        jsnap["can_draw_card"] = jsnap["can_draw_card"].astype(np.int32)
        for k in FIELDS:
            rows = (snap[k].reshape(b, -1)
                    == jsnap[k].reshape(b, -1)).all(-1) | ~live
            assert rows.all(), (
                f"step {step}: field '{k}' diverged in games "
                f"{np.where(~rows)[0][:8]}\n"
                f"  native: {snap[k][~rows][:4]}\n"
                f"  jax:    {jsnap[k][~rows][:4]}")
        jstat = np.asarray(status_fn(state))
        nstat = np.array([eng.status(s) for s in natives])
        assert ((jstat == nstat) | ~live).all(), (step, jstat, nstat)
        total += int(live.sum())
        live &= nstat == STATUS_NOT_ENDED
    assert not live.any(), "games not finished"
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")  # CPU-only tool; must precede
    from alphazero_risk_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    done = 0
    total_steps = 0
    t0 = time.time()
    while done < args.games:
        b = min(args.batch, args.games - done)
        total_steps += run_batch(b, args.seed + done)
        done += b
        print(f"{done}/{args.games} games bit-exact "
              f"({total_steps} micro-steps, {time.time()-t0:.0f}s)",
              flush=True)
    print(f"OK: {done} games, {total_steps} micro-steps JAX == riskcore")


if __name__ == "__main__":
    main()
