"""Lockstep match driver for scripted/random agents.

Replaces the reference's thread-per-game ``GameGroup::playGames``
(game.cpp:238-312): B games advance one micro-decision per iteration of a
single jitted loop; finished games freeze.  Mirrored pairs share one initial
deal with ownership inverted and the starting player swapped
(game.cpp:170-191).

The AlphaZero agent has its own driver (it interleaves MCTS); this one
covers script/random matchups — the reference's benchmark and
data-generation paths.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import Config, STATUS_NOT_ENDED
from ..env import rules
from ..env.state import GameState, invert_players, new_game, tree_select
from . import random_agent, script_agent
from .common import draw_step_randoms

AGENT_SCRIPT = 0
AGENT_RANDOM = 1


class MatchResult(NamedTuple):
    status: jax.Array        # [B] final status
    rounds: jax.Array        # [B] final round
    steps: jax.Array         # scalar iterations used
    started_by: jax.Array    # [B] starting player


def mirrored_initial_states(key: jax.Array, batch: int) -> GameState:
    """B games = B/2 independent deals, each played from both sides."""
    assert batch % 2 == 0
    half = new_game(key, batch // 2)
    mirrored = invert_players(half).replace(
        cur_player=jnp.ones((batch // 2,), jnp.int32))
    return jax.tree.map(lambda a, b: jnp.concatenate([a, b]), half, mirrored)


def _agent_step(agent_kind: int, state: GameState,
                carry: script_agent.ScriptCarry, reset, u, dice, cfg):
    if agent_kind == AGENT_SCRIPT:
        return script_agent.script_step(state, carry, reset, u, dice, cfg)
    return random_agent.random_step(state, u, dice, cfg), carry


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def play_match(key: jax.Array, state: GameState, agent0: int, agent1: int,
               cfg: Config, max_steps: int) -> MatchResult:
    """Play until every game ends (or max_steps).  agent0 sits in seat 0."""
    b = state.batch_size
    started_by = state.cur_player

    def cond(loop):
        state, carry, prev_player, key, t = loop
        live = rules.game_status(state, cfg) == STATUS_NOT_ENDED
        return live.any() & (t < max_steps)

    def body(loop):
        state, carry, prev_player, key, t = loop
        key, sub = jax.random.split(key)
        u, dice = draw_step_randoms(sub, b)
        reset = state.cur_player != prev_player

        s0, c0 = _agent_step(agent0, state, carry, reset, u, dice, cfg)
        if agent1 == agent0:
            s1, c1 = s0, c0
        else:
            s1, c1 = _agent_step(agent1, state, carry, reset, u, dice, cfg)
        mover0 = state.cur_player == 0
        nstate = tree_select(mover0, s0, s1)
        ncarry = tree_select(mover0, c0, c1)
        return nstate, ncarry, state.cur_player, key, t + 1

    init = (state, script_agent.init_carry(b),
            jnp.full((b,), -1, jnp.int32), key, jnp.zeros((), jnp.int32))
    state, carry, prev, key, t = jax.lax.while_loop(cond, body, init)
    return MatchResult(status=rules.game_status(state, cfg),
                       rounds=state.round, steps=t, started_by=started_by)


def summarize(result: MatchResult):
    """Win/draw tallies matching reference ``GameResults``
    (game.cpp:193-235)."""
    status = result.status
    import numpy as np
    status = np.asarray(status)
    started = np.asarray(result.started_by)
    return {
        "games": int(status.shape[0]),
        "p0_wins": int((status == 0).sum()),
        "p1_wins": int((status == 1).sum()),
        "draws": int((status == -2).sum()),
        "unfinished": int((status == -1).sum()),
        "p0_win_started": int(((status == 0) & (started == 0)).sum()),
        "p1_win_started": int(((status == 1) & (started == 1)).sum()),
    }
