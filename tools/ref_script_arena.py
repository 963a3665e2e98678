"""Bound ScriptPlayer drift against the reference's OWN ScriptPlayer.

Every headline win rate in RESULTS.md is "vs ScriptPlayer" — measured
against this repo's reimplementation, which documents tie-break
deviations from the reference (agents/script_agent.py:17-23: DFS
pre-order fortify ties, unspecified-sort continent ties).  This tool
measures that drift against the real thing: the reference's
ScriptPlayer::takeTurn (script_player.cpp:17-227), compiled unmodified
into native/refparity and driven through the shim's persistent-player
exports.

Protocol (turn-level lockstep agreement):
  - The CANONICAL game evolves entirely inside the reference engine:
    one persistent ScriptPlayer per seat (Game::addPlayer semantics —
    the priority vector's order carries across turns through std::sort
    ties), takeTurn per turn, recording every RNG draw.
  - At every NON-setup turn, the repo's vectorized script agent
    (agents/script_agent.script_step) replays the same turn from the
    same start state, consuming the SAME recorded dice stream; the
    end-of-turn states are diffed field-wise.  Agreement means the two
    ScriptPlayers made identical decisions (dice streams align only if
    every attack choice matches).
  - Setup turns compare only the strategic placement (the +2 land);
    the neutral drop is Utility::randomMask — randomness, not strategy.
  - On divergence the canonical (reference) state stands, the turn is
    tallied by phase-of-first-divergence, and the game continues — so
    one early mismatch cannot contaminate the rest of the game's turns.

Usage: python tools/ref_script_arena.py --games 64 [--out FILE.jsonl]
"""

from __future__ import annotations

import argparse
import ctypes
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.refparity import LIB_DIR, N_EXPORT, load_lib, state_from_exports  # noqa: E402

MAX_TURN_MICROSTEPS = 512


def load_script_lib() -> ctypes.CDLL:
    lib = load_lib()
    lib.ref_clone.restype = ctypes.c_void_p
    lib.ref_clone.argtypes = [ctypes.c_void_p]
    lib.ref_script_new.restype = ctypes.c_void_p
    lib.ref_script_free.argtypes = [ctypes.c_void_p]
    lib.ref_script_take_turn.restype = ctypes.c_int
    lib.ref_script_take_turn.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    return lib


class RefScriptGame:
    """One reference game with a persistent ScriptPlayer per seat."""

    def __init__(self, lib: ctypes.CDLL, seed: int):
        self.lib = lib
        self.h = lib.ref_new_game(seed)
        self.sp = [lib.ref_script_new(), lib.ref_script_new()]

    def close(self):
        for s in self.sp:
            self.lib.ref_script_free(s)
        self.lib.ref_free(self.h)

    def export(self) -> np.ndarray:
        out = (ctypes.c_int64 * N_EXPORT)()
        self.lib.ref_export(self.h, out)
        return np.ctypeslib.as_array(out).copy()

    def status(self) -> int:
        return int(self.lib.ref_game_status(self.h))

    def take_turn_traced(self, seat: int):
        """takeTurn + the recorded draws, via the shim trace buffer."""
        buf = (ctypes.c_int32 * 4096)()
        n = self.lib.ref_script_take_turn_traced(
            self.sp[seat], self.h, buf, 2048)
        if n < 0:
            raise RuntimeError(
                f"reference takeTurn failed: "
                f"{self.lib.ref_last_error().decode()}")
        pairs = np.ctypeslib.as_array(buf)[:2 * n].reshape(n, 2).copy()
        return pairs


PH_NAMES = ["SETUP", "SETUP_NEUTRAL", "REINFORCEMENT", "ATTACK",
            "ATTACK_MOBILIZATION", "FORTIFY"]
FIELDS = ("owner", "army", "round", "cur_player", "reinforcements",
          "phase", "cards", "card_sets_played", "can_draw_card",
          "attacks_during_turn")

# ref_prim op codes (shim.cpp)
OP_PLAY_CARDS, OP_REINF, OP_ATTACK, OP_ATTACK_REINF = 0, 1, 2, 3
OP_FORTIFY, OP_NEXT_TURN, OP_SETUP, OP_SETUP_NEUTRAL = 4, 5, 6, 7


def repo_sp_turn(lib, game, seat, cfg, step_rec, rng):
    """Play the repo ScriptPlayer's turn THROUGH the reference engine:
    decisions come from agents/script_agent.script_step_recorded on a
    JAX mirror of the canonical state; each decision executes as the
    matching State primitive (ref_prim), dice drawn by the engine."""
    import jax.numpy as jnp

    from alphazero_risk_tpu.agents import script_agent
    from alphazero_risk_tpu.config import (PH_ATTACK,
                                           PH_ATTACK_MOBILIZATION,
                                           PH_FORTIFY, PH_REINFORCEMENT,
                                           PH_SETUP, PH_SETUP_NEUTRAL)

    def prim(op, a=0, b=0, c=0):
        r = lib.ref_prim(game.h, op, a, b, c)
        if r < 0:
            raise RuntimeError(f"ref_prim op {op} ({a},{b},{c}): "
                               f"{lib.ref_last_error().decode()}")
        return r

    carry = script_agent.init_carry(1)
    reset = jnp.ones((1,), bool)
    dummy_dice = jnp.ones((1, 5), jnp.int32)
    for micro in range(MAX_TURN_MICROSTEPS):
        if game.status() != -1:
            return
        snap = game.export()
        if int(snap[85]) != seat:
            return
        js = state_from_exports([snap], cfg)
        phase = int(snap[88])
        if phase == PH_REINFORCEMENT and int(carry.attack_to[0]) < 0:
            prim(OP_PLAY_CARDS)   # once per turn, at the pin
            snap = game.export()
            js = state_from_exports([snap], cfg)
        u = jnp.asarray(rng.random((1, 4)), jnp.float32)
        js2, ncarry, (action, _rec) = step_rec(
            js, carry, reset, u, dummy_dice)
        a = int(action[0])
        if phase == PH_SETUP:
            prim(OP_SETUP, a)
        elif phase == PH_SETUP_NEUTRAL:
            prim(OP_SETUP_NEUTRAL, a)
            return  # setup takeTurn pair complete: turn passes
        elif phase == PH_REINFORCEMENT:
            army = int(np.asarray(js.army)[0, a])
            amt = min(int(cfg.min_unit_move),
                      int(np.asarray(js.reinforcements)[0]),
                      int(cfg.land_army_max) - army)
            prim(OP_REINF, a, 0, max(amt, 1))
        elif phase == PH_ATTACK:
            prim(OP_ATTACK, int(ncarry.attack_from[0]), a)
        elif phase == PH_ATTACK_MOBILIZATION:
            mf = int(np.asarray(js.mob_from)[0])
            amt = min(int(np.asarray(js.army)[0, mf]) - 1,
                      int(cfg.min_unit_move))
            prim(OP_ATTACK_REINF, 0, 0, max(amt, 1))
        elif phase == PH_FORTIFY:
            # derive (from, to, amount) from the JAX-side army diff
            # (end_turn moves no armies, so any diff IS the fortify)
            d = (np.asarray(js2.army) - np.asarray(js.army))[0]
            dec, inc = np.where(d < 0)[0], np.where(d > 0)[0]
            if len(dec) == 1 and len(inc) == 1:
                prim(OP_FORTIFY, int(dec[0]), int(inc[0]),
                     int(d[inc[0]]))
            prim(OP_NEXT_TURN)
            return
        carry = ncarry
        reset = jnp.zeros((1,), bool)
    raise RuntimeError("repo SP turn exceeded micro-step cap")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=64)
    ap.add_argument("--seed0", type=int, default=5000)
    ap.add_argument("--out", default="experiments/r5/ref_script_agreement.jsonl")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--head2head", action="store_true",
                    help="instead of agreement: play repo-SP vs the "
                    "reference SP (mirrored seat pairs, engine dice) and "
                    "report the win-rate delta — the strength bound on "
                    "ScriptPlayer drift")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from alphazero_risk_tpu.agents import script_agent
    from alphazero_risk_tpu.config import (PH_ATTACK, PH_SETUP,
                                           STATUS_NOT_ENDED, Config)
    from alphazero_risk_tpu.env import rules

    cfg = Config()
    lib = load_script_lib()
    lib.ref_script_take_turn_traced.restype = ctypes.c_int
    lib.ref_script_take_turn_traced.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]

    step_fn = jax.jit(lambda s, c, r, u, d: script_agent.script_step(
        s, c, r, u, d, cfg))
    status_fn = jax.jit(lambda s: rules.game_status(s, cfg))

    if args.head2head:
        lib.ref_prim.restype = ctypes.c_int
        lib.ref_prim.argtypes = [ctypes.c_void_p] + [ctypes.c_int] * 4
        step_rec = jax.jit(
            lambda s, c, r, u, d: script_agent.script_step_recorded(
                s, c, r, u, d, cfg))
        rng = np.random.default_rng(args.seed0 * 31 + 7)
        wins = {"repo": 0, "ref": 0, "draw": 0}
        t = {"games": 0, "turns": 0}
        for g in range(args.games):
            repo_seat = g % 2                 # mirrored pairing
            game = RefScriptGame(lib, args.seed0 + g // 2)
            for turn in range(4000):
                st = game.status()
                if st != -1:
                    break
                seat = int(game.export()[85])
                if seat == repo_seat:
                    repo_sp_turn(lib, game, seat, cfg, step_rec, rng)
                else:
                    game.take_turn_traced(seat)
                t["turns"] += 1
            t["games"] += 1
            if st == repo_seat:
                wins["repo"] += 1
            elif st in (0, 1):
                wins["ref"] += 1
            else:
                wins["draw"] += 1
            game.close()
            if (g + 1) % 16 == 0:
                print(f"{g + 1}/{args.games}: repo {wins['repo']} "
                      f"ref {wins['ref']} draw {wins['draw']}", flush=True)
        n = max(wins["repo"] + wins["ref"], 1)
        rec = {"mode": "head2head", **t, **wins,
               "repo_win_rate": round(wins["repo"] / n, 5),
               "se_95pp": round(196.0 * (0.25 / n) ** 0.5, 2)}
        print(json.dumps(rec), flush=True)
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return

    tally = {"games": 0, "turns": 0, "agree": 0, "setup_agree": 0,
             "setup_turns": 0, "diverge_by_phase": {}, "ref_wins": [0, 0],
             "turn_cap_hits": 0}

    for g in range(args.games):
        game = RefScriptGame(lib, args.seed0 + g)
        for turn in range(4000):
            if game.status() != -1:
                break
            snap0 = game.export()
            seat, phase0 = int(snap0[85]), int(snap0[88])
            pairs = game.take_turn_traced(seat)
            snap1 = game.export()

            if phase0 == PH_SETUP:
                # compare only the strategic +2 placement
                tally["setup_turns"] += 1
                delta = snap1[42:84] - snap0[42:84]
                strat = np.where((delta == 2) & (snap0[0:42] == seat))[0]
                js = state_from_exports([snap0], cfg)
                m = rules.player_masks(js, cfg)
                t_set = script_agent._select_target(m.owned, m.attack_lands)
                f_set = script_agent._select_from(js, t_set, m.owned)
                if len(strat) == 1 and int(f_set[0]) == int(strat[0]):
                    tally["setup_agree"] += 1
                elif args.verbose:
                    print(f"game {g} turn {turn}: setup placement "
                          f"ref={strat} repo={int(f_set[0])}")
                continue

            # ---- non-setup turn: repo SP replays with the same dice ----
            tally["turns"] += 1
            dice_q = [int(v) for k, v in pairs if k == 1]
            qi = 0
            js = state_from_exports([snap0], cfg)
            carry = script_agent.init_carry(1)
            reset = jnp.ones((1,), bool)
            ok = True
            for micro in range(MAX_TURN_MICROSTEPS):
                st = int(np.asarray(status_fn(js))[0])
                if st != STATUS_NOT_ENDED or int(js.cur_player[0]) != seat:
                    break
                dice = np.ones((1, 5), np.int32)
                if int(js.phase[0]) == PH_ATTACK:
                    a = np.asarray(js.army)[0]
                    own = np.asarray(js.owner)[0]
                    # the repo agent's choice this step (recomputed in
                    # script_step); dice needs depend on it
                    m = rules.player_masks(js, cfg)
                    # mirror script_step's ATTACK pin logic cheaply: use
                    # carry if valid else re-derive
                    to_c = int(carry.attack_to[0])
                    fr_c = int(carry.attack_from[0])
                    pinned_ok = (to_c >= 0 and own[to_c] != seat
                                 and fr_c >= 0 and a[fr_c] >= 2
                                 and own[fr_c] == seat)
                    if not pinned_ok:
                        to_c = int(script_agent._select_target(
                            m.owned, m.attack_lands_with_army)[0])
                        fr_c = int(script_agent._select_from(
                            js, jnp.asarray([to_c]), m.owned_with_army)[0])
                    att_n = int(min(3, a[fr_c] - 1))
                    def_n = int(min(2, a[to_c]))
                    need = att_n + def_n
                    if att_n < 1 or qi + need > len(dice_q):
                        ok = False  # desynced from the reference's draws
                        break
                    dice[0, :att_n] = dice_q[qi:qi + att_n]
                    dice[0, 3:3 + def_n] = dice_q[qi + att_n:qi + need]
                    qi += need
                u = np.full((1, 4), 0.5, np.float32)
                js, carry = step_fn(js, carry, reset,
                                    jnp.asarray(u), jnp.asarray(dice))
                reset = jnp.zeros((1,), bool)
            else:
                tally["turn_cap_hits"] += 1
                ok = False

            if ok and qi != len(dice_q):
                ok = False  # consumed a different number of dice
            if ok:
                ref_js = state_from_exports([snap1], cfg)
                for f in FIELDS:
                    if not np.array_equal(np.asarray(getattr(js, f))[0],
                                          np.asarray(getattr(ref_js, f))[0]):
                        ok = False
                        if args.verbose:
                            print(f"game {g} turn {turn} "
                                  f"({PH_NAMES[phase0]}): field {f} "
                                  f"ref={np.asarray(getattr(ref_js, f))[0]} "
                                  f"repo={np.asarray(getattr(js, f))[0]}")
                        break
            if ok:
                tally["agree"] += 1
            else:
                ph = PH_NAMES[phase0]
                tally["diverge_by_phase"][ph] = (
                    tally["diverge_by_phase"].get(ph, 0) + 1)
        tally["games"] += 1
        if game.status() in (0, 1):
            tally["ref_wins"][game.status()] += 1
        game.close()
        if (g + 1) % 8 == 0:
            print(f"{g + 1}/{args.games} games: "
                  f"{tally['agree']}/{tally['turns']} turns agree "
                  f"({100.0 * tally['agree'] / max(tally['turns'], 1):.2f}%)",
                  flush=True)

    tally["turn_agreement"] = round(
        tally["agree"] / max(tally["turns"], 1), 5)
    tally["setup_agreement"] = round(
        tally["setup_agree"] / max(tally["setup_turns"], 1), 5)
    print(json.dumps(tally), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(tally) + "\n")


if __name__ == "__main__":
    main()
