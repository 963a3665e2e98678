"""Runtime invariant checking for debugging.

The pure-functional engine makes the reference's incremental-mask
consistency checks (state.cpp:1181-1429) unnecessary — there is no
incremental state to drift.  What remains worth asserting are the game
invariants themselves; this module is the debug-build analogue, used from
tests and ad-hoc debugging (not in hot paths).
"""

from __future__ import annotations

import numpy as np

from ..config import (
    Config,
    NEUTRAL_PLAYER,
    PH_ATTACK_MOBILIZATION,
    PH_SETUP,
    PH_SETUP_NEUTRAL,
)
from .state import GameState


def validate(state: GameState, cfg: Config) -> None:
    """Raise AssertionError with a precise message on any violated game
    invariant, for every game in the batch."""
    owner = np.asarray(state.owner)
    army = np.asarray(state.army)
    phase = np.asarray(state.phase)
    reinf = np.asarray(state.reinforcements)
    cards = np.asarray(state.cards)
    mob_from = np.asarray(state.mob_from)
    mob_to = np.asarray(state.mob_to)

    assert ((owner >= 0) & (owner <= NEUTRAL_PLAYER)).all(), "owner range"
    assert (army >= 0).all() and (army <= cfg.land_army_max).all(), \
        f"army out of [0, {cfg.land_army_max}]"
    in_setup = (phase == PH_SETUP) | (phase == PH_SETUP_NEUTRAL)
    assert (army[~in_setup] >= 1).all(), "empty land outside setup"
    assert (reinf >= 0).all(), "negative reinforcements"
    assert (cards >= 0).all(), "negative card counts"

    in_mob = phase == PH_ATTACK_MOBILIZATION
    assert ((mob_from[in_mob] >= 0) & (mob_to[in_mob] >= 0)).all(), \
        "mobilization phase without endpoints"
    if in_mob.any():
        rows = np.nonzero(in_mob)[0]
        assert (army[rows, mob_from[rows]] >= 2).all(), \
            "mobilization source must keep an army to move"
    # total armies are conserved except through battles/reinforcements —
    # spot-checked by trajectory parity tests; here just bound them.
    totals = army.sum(-1)
    assert (totals <= 3 * cfg.land_army_max * 42).all()
