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


def watch_game_az(p1: str, p2: str, seed: int = 0,
                  cfg: Optional[Config] = None,
                  ckpt_dir: str = "checkpoints", roles=("latest", "best"),
                  micro: bool = False, pause: bool = True,
                  max_steps: int = 3000) -> int:
    """Step through a game with at least one AlphaZero seat: B=1 batched
    JAX engine + MCTS on CPU, rendering after every decision — full parity
    with the reference GUI's purpose of viewing any Game including AZ
    (board_gui.cpp:5-125).  az-vs-az loads ``roles[0]``/``roles[1]``."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ..env import rules
    from ..env.state import new_game
    from ..training import actor as A
    from ..training.checkpoints import CheckpointManager
    from ..training.learner import create_train_state
    from ..agents.script_agent import init_carry

    cfg = cfg or Config()
    kinds = {0: p1, 1: p2}
    az_seats = (p1 == "az", p2 == "az")
    opp = {"sp": A.OPP_SCRIPT, "rp": A.OPP_RANDOM}.get(
        p1 if p1 != "az" else p2, A.OPP_SCRIPT)

    net, _, ts = create_train_state(cfg, jax.random.PRNGKey(seed))
    mgr = CheckpointManager(cfg, ckpt_dir)
    ts = mgr.restore(roles[0], ts)
    if az_seats[0] and az_seats[1]:
        other = mgr.restore(roles[1], ts)
        paired = A.make_paired_eval_fn(net, cfg)
        efn = lambda s, m, use_a: paired(  # noqa: E731
            ts.params, ts.batch_stats, other.params, other.batch_stats,
            use_a, s, m)
        step1 = jax.jit(lambda s0, c, pr, k: A.run_episodes(
            efn, s0, k, cfg, 1, sample_moves=False, paired_eval=True,
            carry_in=c, prev_in=pr))
    else:
        ev = A.make_eval_fn(net, cfg)
        efn = lambda s, m: ev(ts.params, ts.batch_stats, s, m)  # noqa: E731
        step1 = jax.jit(lambda s0, c, pr, k: A.run_episodes(
            efn, s0, k, cfg, 1, opponent=opp, az_seats=az_seats,
            sample_moves=False, record_all=True, carry_in=c, prev_in=pr))

    key = jax.random.PRNGKey(seed)
    key, k0 = jax.random.split(key)
    state = new_game(k0, 1)
    carry = init_carry(1)
    prev = jnp.full((1,), -1, jnp.int32)
    print("compiling the stepper (one-time, ~10-30s on CPU)...",
          flush=True)

    def show(step, last, pi):
        print(render_text(np.asarray(state.owner)[0],
                          np.asarray(state.army)[0],
                          int(state.phase[0]), int(state.cur_player[0]),
                          int(state.round[0]),
                          int(state.reinforcements[0])))
        if pi is not None:
            top = np.argsort(pi)[::-1][:3]
            moves = ", ".join(
                f"{'skip' if a == 42 else a}:{pi[a]:.2f}"
                for a in top if pi[a] > 0)
            print(f"[micro-step {step}] last mover: {last}  pi: {moves}")
        else:
            print(f"[micro-step {step}] last mover: {last}")
        if pause:
            try:
                input("-- Enter for next "
                      f"{'micro-step' if micro else 'turn'} "
                      "(Ctrl-C to stop) --")
            except EOFError:
                pass

    step = 0
    while step < max_steps:
        mover = int(state.cur_player[0])
        key, sub = jax.random.split(key)
        out = step1(state, carry, prev, sub)
        pi = np.asarray(out.samples.policy)[0, 0]
        state, carry, prev = out.state, out.carry, out.prev_player
        step += 1
        moved_on = int(state.cur_player[0]) != mover
        if micro or moved_on:
            show(step, f"player {mover} ({kinds[mover]})", pi)
        if int(out.status[0]) != STATUS_NOT_ENDED:
            break

    status = int(rules.game_status(state, cfg)[0])
    if status == STATUS_DRAW:
        print(f"=== draw after {int(state.round[0])} rounds ===")
    elif status == STATUS_NOT_ENDED:
        print(f"=== stopped at step cap {max_steps} ===")
    else:
        print(f"=== player {status} ({kinds[status]}) wins in round "
              f"{int(state.round[0])} ===")
    return status
