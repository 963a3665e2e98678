"""Interactive game viewer: step through a live match in the terminal.

TPU-framework replacement for the reference's ImGui board GUI with its
"Next turn" button (``src/risk_game/board/board_gui.cpp:5-125``, Windows
DX11, bit-rotted upstream): renders the ASCII board after every turn (or
every micro-decision with ``--micro``) and waits for Enter.  Runs the
scalar oracle engine (``env/oracle.py``) so stepping is instant — no
device, no compile.

Usage: python -m alphazero_risk_tpu.cli -m watch --p1 sp --p2 rp
"""

from __future__ import annotations

import random
from typing import Optional

from ..config import Config, STATUS_DRAW, STATUS_NOT_ENDED
from ..env import oracle
from ..agents import oracle_agents
from .board import render_text


def _randoms(rng: random.Random):
    u = [rng.random() for _ in range(4)]
    dice = [rng.randint(1, 6) for _ in range(5)]
    return u, dice


def watch_game(p1: str = "sp", p2: str = "rp", seed: int = 0,
               cfg: Optional[Config] = None, micro: bool = False,
               pause: bool = True, max_steps: int = 5000) -> int:
    """Play one scripted/random game, rendering each turn.  Returns the
    final status (0/1 winner, -2 draw)."""
    cfg = cfg or Config()
    rng = random.Random(seed)
    perm = list(range(42))
    rng.shuffle(perm)
    s = oracle.new_game(perm)
    carries = {0: oracle_agents.OracleScriptCarry(),
               1: oracle_agents.OracleScriptCarry()}
    kinds = {0: p1, 1: p2}
    fresh = {0: True, 1: True}

    def show(step, last):
        print(render_text(s.owner, s.army, s.phase, s.cur_player, s.round,
                          s.reinforcements))
        print(f"[micro-step {step}] last mover: {last}")
        if pause:
            try:
                input("-- Enter for next "
                      f"{'micro-step' if micro else 'turn'} "
                      "(Ctrl-C to stop) --")
            except EOFError:
                pass

    step = 0
    while oracle.game_status(s, cfg) == STATUS_NOT_ENDED \
            and step < max_steps:
        p = s.cur_player
        u, dice = _randoms(rng)
        if kinds[p] == "sp":
            carries[p] = oracle_agents.script_step(
                s, carries[p], fresh[p], u, dice, cfg)
            fresh[p] = False
        else:
            oracle_agents.random_step(s, u, dice, cfg)
        step += 1
        moved_on = s.cur_player != p
        if moved_on:
            fresh[s.cur_player] = True
        if micro or moved_on:
            show(step, f"player {p} ({kinds[p]})")

    status = oracle.game_status(s, cfg)
    if status == STATUS_DRAW:
        print(f"=== draw after {s.round} rounds ===")
    elif status == STATUS_NOT_ENDED:
        print(f"=== stopped at step cap {max_steps} ===")
    else:
        print(f"=== player {status} ({kinds[int(status)]}) wins in "
              f"round {s.round} ===")
    return int(status)
