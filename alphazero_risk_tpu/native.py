"""ctypes binding to the native riskcore engine (native/libriskcore.so).

The native engine is the host-side runtime: CPU match generation
(script/random games), large-scale randomized cross-validation of the
vectorized JAX engine, and the data path for the replay store.  Gracefully
degrades to the pure-Python oracle when the shared library has not been
built (build: ``make -C native`` or
``g++ -O3 -shared -fPIC -std=c++20 riskcore.cpp -o libriskcore.so``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from .config import Config, NUM_LANDS

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "native",
                 "libriskcore.so"),
    os.path.join(os.path.dirname(__file__), "libriskcore.so"),
]


class CRiskState(ctypes.Structure):
    _fields_ = [
        ("owner", ctypes.c_int8 * NUM_LANDS),
        ("army", ctypes.c_int8 * NUM_LANDS),
        ("phase", ctypes.c_int8),
        ("round", ctypes.c_int16),
        ("cur_player", ctypes.c_int8),
        ("reinforcements", ctypes.c_int16),
        ("cards", ctypes.c_int16 * 2),
        ("card_sets_played", ctypes.c_int16),
        ("mob_from", ctypes.c_int8),
        ("mob_to", ctypes.c_int8),
        ("can_draw_card", ctypes.c_int8),
        ("attacks_during_turn", ctypes.c_int16),
    ]


class CRiskConfig(ctypes.Structure):
    _fields_ = [
        ("land_army_max", ctypes.c_int),
        ("min_unit_move", ctypes.c_int),
        ("max_game_rounds", ctypes.c_int),
        ("allow_yield", ctypes.c_int),
        ("limit_reinforcement", ctypes.c_int),
        ("limit_attack", ctypes.c_int),
        ("fast_mobilization", ctypes.c_int),
    ]


def _c_config(cfg: Config) -> CRiskConfig:
    return CRiskConfig(
        land_army_max=cfg.land_army_max,
        min_unit_move=cfg.min_unit_move,
        max_game_rounds=cfg.max_game_rounds,
        allow_yield=int(cfg.allow_yield),
        limit_reinforcement=int(cfg.limit_reinforcement_moves),
        limit_attack=int(cfg.limit_attack_moves),
        fast_mobilization=int(cfg.fast_attack_mobilization),
    )


def load_library() -> Optional[ctypes.CDLL]:
    """Load libriskcore.so, building it on demand (the binary is not
    tracked in git; native/Makefile compiles it in ~2s)."""
    if not any(os.path.exists(os.path.abspath(p)) for p in _LIB_PATHS):
        import subprocess
        native_dir = os.path.join(os.path.dirname(__file__), "..",
                                  "native")
        if os.path.exists(os.path.join(native_dir, "Makefile")):
            proc = subprocess.run(["make", "-C", native_dir],
                                  capture_output=True, text=True)
            if proc.returncode != 0:
                # a broken toolchain must not SILENTLY degrade
                # cross-validation to the slow Python oracle
                import sys
                tail = "\n".join(
                    (proc.stderr or "").strip().splitlines()[-5:])
                print("WARNING: libriskcore.so build failed "
                      f"(rc={proc.returncode}); native engine "
                      f"unavailable:\n{tail}", file=sys.stderr)
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.risk_game_status.restype = ctypes.c_int
            lib.risk_game_status.argtypes = [ctypes.POINTER(CRiskState),
                                             ctypes.POINTER(CRiskConfig)]
            lib.risk_new_game.argtypes = [ctypes.POINTER(CRiskState),
                                          ctypes.POINTER(ctypes.c_int32)]
            lib.risk_legal_actions.argtypes = [
                ctypes.POINTER(CRiskState), ctypes.POINTER(CRiskConfig),
                ctypes.POINTER(ctypes.c_uint8)]
            lib.risk_step.argtypes = [
                ctypes.POINTER(CRiskState), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(CRiskConfig)]
            lib.risk_play_games.restype = ctypes.c_long
            lib.risk_play_games.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
                ctypes.POINTER(CRiskConfig),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.risk_state_size.restype = ctypes.c_int
            assert lib.risk_state_size() == ctypes.sizeof(CRiskState), (
                "ABI mismatch between libriskcore and native.py")
            return lib
    return None


class NativeEngine:
    """Scalar engine handle over the C library."""

    def __init__(self, cfg: Config):
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError(
                "libriskcore.so not built; run `make -C native`")
        self.cfg = cfg
        self.ccfg = _c_config(cfg)

    def new_game(self, permutation: np.ndarray) -> CRiskState:
        s = CRiskState()
        perm = np.ascontiguousarray(permutation, np.int32)
        self.lib.risk_new_game(
            ctypes.byref(s),
            perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return s

    def legal_actions(self, s: CRiskState) -> np.ndarray:
        mask = np.zeros(43, np.uint8)
        self.lib.risk_legal_actions(
            ctypes.byref(s), ctypes.byref(self.ccfg),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return mask.astype(bool)

    def step(self, s: CRiskState, action: int, dice: np.ndarray) -> None:
        d = np.ascontiguousarray(dice, np.int32)
        self.lib.risk_step(
            ctypes.byref(s), int(action),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ctypes.byref(self.ccfg))

    def status(self, s: CRiskState) -> int:
        return self.lib.risk_game_status(ctypes.byref(s),
                                         ctypes.byref(self.ccfg))

    def play_games(self, agent0: str, agent1: str, n_games: int,
                   seed: int) -> Tuple[np.ndarray, np.ndarray, int]:
        """Native script/random matches (agent in {'sp', 'rp'}).  Returns
        (statuses[n], rounds[n], total_micro_steps)."""
        kind = {"sp": 0, "rp": 1}
        results = np.zeros(n_games, np.int32)
        rounds = np.zeros(n_games, np.int32)
        steps = self.lib.risk_play_games(
            kind[agent0], kind[agent1], n_games, seed,
            ctypes.byref(self.ccfg),
            results.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rounds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return results, rounds, int(steps)


def available() -> bool:
    return load_library() is not None
