"""Trajectory-exact cross-validation against the REAL reference engine.

Drives the reference's own rules code (state.cpp / alphazero_moves.cpp,
compiled unmodified via native/refparity) and the JAX engine
(``alphazero_risk_tpu.env.rules``) through identical (action, dice)
streams and diffs the full state field-wise after every micro-step.
This closes BASELINE.md's "env transitions trajectory-exact vs reference
under fixed seed" north star with the reference's actual C++ — not a
builder-written oracle.

Protocol per game batch:
  1. reference ``State::newGame`` with a seeded engine; the exported deal
     initializes the JAX ``GameState`` (same owners/armies/pool),
  2. each lockstep micro-step: assert the 43-way legal masks agree
     (``UtilityNN::getValidMoves`` vs ``rules.legal_actions``), pick one
     random legal action, execute ``UtilityNN::makeMove`` recording every
     dice draw, replay the same action with the same dice through
     ``rules.step``, compare every field + game status.

Usage:
  python tools/refparity.py --games 16 --seeds 3
"""

from __future__ import annotations

import argparse
import ctypes
import os
import subprocess
import sys
from typing import List

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LIB_DIR = os.path.join(REPO, "native", "refparity")
LIB = os.path.join(LIB_DIR, "librefparity.so")

N_EXPORT = 109
PH_NAMES = ["SETUP", "SETUP_NEUTRAL", "REINFORCEMENT", "ATTACK",
            "ATTACK_MOBILIZATION", "FORTIFY"]


def load_lib() -> ctypes.CDLL:
    if not os.path.exists(LIB):
        subprocess.run(["make", "-C", LIB_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(LIB)
    lib.ref_new_game.restype = ctypes.c_void_p
    lib.ref_new_game.argtypes = [ctypes.c_uint64]
    lib.ref_free.argtypes = [ctypes.c_void_p]
    lib.ref_export.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int64)]
    lib.ref_legal_mask.restype = ctypes.c_uint64
    lib.ref_legal_mask.argtypes = [ctypes.c_void_p]
    lib.ref_game_status.restype = ctypes.c_int
    lib.ref_game_status.argtypes = [ctypes.c_void_p]
    lib.ref_make_move.restype = ctypes.c_int
    lib.ref_make_move.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.c_int]
    lib.ref_last_error.restype = ctypes.c_char_p
    lib.ref_consistency_check.argtypes = [ctypes.c_void_p]
    return lib


class RefGame:
    """One reference-engine game behind the C ABI."""

    def __init__(self, lib: ctypes.CDLL, seed: int):
        self.lib = lib
        self.h = lib.ref_new_game(seed)

    def close(self):
        if self.h:
            self.lib.ref_free(self.h)
            self.h = None

    def export(self) -> np.ndarray:
        out = (ctypes.c_int64 * N_EXPORT)()
        self.lib.ref_export(self.h, out)
        return np.ctypeslib.as_array(out).copy()

    def legal(self) -> np.ndarray:
        m = int(self.lib.ref_legal_mask(self.h))
        return np.array([(m >> i) & 1 for i in range(43)], bool)

    def status(self) -> int:
        return int(self.lib.ref_game_status(self.h))

    def make_move(self, action: int) -> List[int]:
        """Returns the dice values drawn (in draw order)."""
        buf = (ctypes.c_int32 * 64)()
        n = self.lib.ref_make_move(self.h, action, buf, 32)
        if n < 0:
            raise RuntimeError(
                f"reference move {action} failed: "
                f"{self.lib.ref_last_error().decode()}")
        pairs = np.ctypeslib.as_array(buf)[:2 * n].reshape(n, 2)
        assert (pairs[:, 0] == 1).all(), (
            f"non-dice RNG draw during makeMove: {pairs}")
        return pairs[:, 1].tolist()


def state_from_exports(exports: List[np.ndarray], cfg):
    """Batched JAX GameState from reference snapshots."""
    import jax.numpy as jnp

    from alphazero_risk_tpu.env.state import GameState

    e = np.stack(exports)           # [B, N_EXPORT]
    b = e.shape[0]

    def li(v):                      # LandIndex: 43 (None) -> -1
        return np.where(v >= 42, -1, v).astype(np.int32)

    return GameState(
        owner=jnp.asarray(e[:, 0:42], jnp.int32),
        army=jnp.asarray(e[:, 42:84], jnp.int32),
        phase=jnp.asarray(e[:, 88], jnp.int32),
        round=jnp.asarray(e[:, 84], jnp.int32),
        cur_player=jnp.asarray(e[:, 85], jnp.int32),
        reinforcements=jnp.asarray(e[:, 87], jnp.int32),
        cards=jnp.asarray(e[:, 93:95], jnp.int32),
        card_sets_played=jnp.asarray(e[:, 86], jnp.int32),
        mob_from=jnp.asarray(li(e[:, 89])),
        mob_to=jnp.asarray(li(e[:, 90])),
        can_draw_card=jnp.asarray(e[:, 91] != 0),
        attacks_during_turn=jnp.asarray(e[:, 92], jnp.int32),
        player_cards=jnp.zeros((b, 2, 42), bool),
        drawn_cards=jnp.zeros((b, 42), bool),
    )


def compare(export: np.ndarray, js: dict, game: int, step: int,
            ref_status: int):
    """Field-wise diff of one reference snapshot vs one JAX state row."""
    def chk(name, ref_v, jax_v):
        ref_v = np.asarray(ref_v)
        jax_v = np.asarray(jax_v)
        assert np.array_equal(ref_v, jax_v), (
            f"game {game} step {step}: field '{name}' diverged\n"
            f"  reference: {ref_v}\n  jax:       {jax_v}\n"
            f"  phase={PH_NAMES[int(export[88])]} round={export[84]}")

    chk("owner", export[0:42], js["owner"])
    chk("army", export[42:84], js["army"])
    chk("round", export[84], js["round"])
    chk("cur_player", export[85], js["cur_player"])
    chk("card_sets_played", export[86], js["card_sets_played"])
    chk("reinforcements", export[87], js["reinforcements"])
    chk("phase", export[88], js["phase"])
    chk("mob_from", -1 if export[89] >= 42 else export[89], js["mob_from"])
    chk("mob_to", -1 if export[90] >= 42 else export[90], js["mob_to"])
    chk("can_draw_card", export[91] != 0, js["can_draw_card"])
    chk("attacks_during_turn", export[92], js["attacks_during_turn"])
    chk("cards", export[93:95], js["cards"])
    chk("status", ref_status, js["status"])


def run_trajectories(games: int, seed0: int, max_steps: int = 2000,
                     check_masks_every: int = 1, verbose: bool = False):
    """Run ``games`` reference games to completion in lockstep with the JAX
    engine; raises on the first divergence.  Returns per-game step counts.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from alphazero_risk_tpu.config import Config
    from alphazero_risk_tpu.env import rules
    from alphazero_risk_tpu.env.state import tree_select

    cfg = Config()  # defaults mirror the reference build exactly
    lib = load_lib()
    refs = [RefGame(lib, seed0 + g) for g in range(games)]
    state = state_from_exports([r.export() for r in refs], cfg)

    step_fn = jax.jit(lambda s, a, d: rules.step(s, a, d, cfg))
    legal_fn = jax.jit(lambda s: rules.legal_actions(s, cfg))
    status_fn = jax.jit(lambda s: rules.game_status(s, cfg))

    rng = np.random.default_rng(seed0 * 7919 + 13)
    live = np.ones(games, bool)
    steps_done = np.zeros(games, np.int64)

    for step in range(max_steps):
        if not live.any():
            break
        jax_legal = np.asarray(legal_fn(state))
        actions = np.zeros(games, np.int32)
        dice = np.ones((games, 5), np.int32)
        for g, r in enumerate(refs):
            if not live[g]:
                actions[g] = 42
                continue
            ref_legal = r.legal()
            if step % check_masks_every == 0:
                assert (ref_legal == jax_legal[g]).all(), (
                    f"game {g} step {step}: legal masks diverged\n"
                    f"  reference: {np.where(ref_legal)[0]}\n"
                    f"  jax:       {np.where(jax_legal[g])[0]}")
            acts = np.where(ref_legal)[0]
            a = int(acts[rng.integers(len(acts))])
            actions[g] = a
            pre = None
            if a != 42:
                pre = int(np.asarray(state.army)[g, a])  # defender army
            draws = r.make_move(a)
            if draws:
                d0 = pre
                def_n = 2 if d0 >= 2 else 1
                att_n = len(draws) - def_n
                assert 1 <= att_n <= 3, (att_n, def_n, draws)
                dice[g, :att_n] = draws[:att_n]
                dice[g, 3:3 + def_n] = draws[att_n:]
        new_state = step_fn(state, jnp.asarray(actions),
                            jnp.asarray(dice))
        state = tree_select(jnp.asarray(live), new_state, state)

        st = np.asarray(status_fn(state))
        snap = {k: np.asarray(getattr(state, k))
                for k in ("owner", "army", "phase", "round", "cur_player",
                          "reinforcements", "cards", "card_sets_played",
                          "mob_from", "mob_to", "can_draw_card",
                          "attacks_during_turn")}
        for g, r in enumerate(refs):
            if not live[g]:
                continue
            steps_done[g] += 1
            row = {k: v[g] for k, v in snap.items()}
            row["status"] = st[g]
            compare(r.export(), row, g, step, r.status())
            if r.status() != -1:
                live[g] = False
                if verbose:
                    print(f"game {g}: finished after {steps_done[g]} "
                          f"steps, status {r.status()}", flush=True)

    assert not live.any(), f"games not finished after {max_steps} steps"
    for r in refs:
        r.close()
    return steps_done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=16)
    ap.add_argument("--seeds", type=int, default=1,
                    help="number of independent batches")
    ap.add_argument("--seed0", type=int, default=1000)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    total_steps = 0
    for s in range(args.seeds):
        steps = run_trajectories(args.games,
                                 args.seed0 + s * args.games,
                                 verbose=args.verbose)
        total_steps += int(steps.sum())
        print(f"batch {s}: {args.games} games trajectory-exact "
              f"({int(steps.sum())} micro-steps, "
              f"mean {steps.mean():.0f}/game)", flush=True)
    print(f"OK: {args.seeds * args.games} games, {total_steps} micro-steps "
          f"bit-exact vs the reference engine")


if __name__ == "__main__":
    main()
