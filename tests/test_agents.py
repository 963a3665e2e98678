"""Agent tests: scalar-vs-vectorized parity and behavioral sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_risk_tpu.config import Config, STATUS_NOT_ENDED
from alphazero_risk_tpu.agents import oracle_agents
from alphazero_risk_tpu.agents import (
    AGENT_RANDOM,
    AGENT_SCRIPT,
    mirrored_initial_states,
    play_match,
    summarize,
)
from alphazero_risk_tpu.agents.random_agent import random_step
from alphazero_risk_tpu.agents.script_agent import init_carry, script_step
from alphazero_risk_tpu.env import oracle
from alphazero_risk_tpu.env.state import new_game

BATCH = 4


def make_oracle_games(state):
    return [oracle.OracleState(owner=[int(x) for x in state.owner[b]],
                               army=[1] * 42) for b in range(state.batch_size)]


def assert_equal(vec, games, t, fields=("owner", "army", "phase", "round",
                                        "cur_player", "reinforcements",
                                        "cards", "card_sets_played",
                                        "mob_from", "mob_to")):
    for name in fields:
        a = np.asarray(getattr(vec, name))
        b = np.asarray([getattr(g, name) for g in games])
        assert (a == b).all(), (
            f"step {t}: {name} diverged\n{a}\nvs\n{b}")


def run_parity(agent_vec, agent_scalar, seed, steps=900):
    cfg = Config()
    rng = np.random.default_rng(seed)
    state = new_game(jax.random.PRNGKey(seed), BATCH)
    games = make_oracle_games(state)
    carry = init_carry(BATCH)
    ocarries = [oracle_agents.OracleScriptCarry() for _ in range(BATCH)]
    prev_player = np.full(BATCH, -1, np.int32)

    step_jit = jax.jit(agent_vec,
                       static_argnums=3 if agent_vec is random_step else 5)

    for t in range(steps):
        statuses = [oracle.game_status(g, cfg) for g in games]
        if all(s != STATUS_NOT_ENDED for s in statuses):
            break
        u = rng.random((BATCH, 4)).astype(np.float32)
        dice = rng.integers(1, 7, (BATCH, 5)).astype(np.int32)
        if agent_vec is random_step:
            state = step_jit(state, jnp.asarray(u), jnp.asarray(dice), cfg)
            for b, g in enumerate(games):
                agent_scalar(g, list(u[b]), [int(d) for d in dice[b]], cfg)
        else:
            reset = jnp.asarray(np.asarray(
                [int(g.cur_player) for g in games]) != prev_player)
            state, carry = step_jit(state, carry, reset,
                                    jnp.asarray(u), jnp.asarray(dice), cfg)
            for b, g in enumerate(games):
                r = bool(np.asarray(reset)[b])
                ocarries[b] = agent_scalar(g, ocarries[b], r, list(u[b]),
                                           [int(d) for d in dice[b]], cfg)
            prev_player = np.asarray([int(g.cur_player) for g in games])
        assert_equal(state, games, t)
    else:
        pytest.fail("games did not finish in step budget")


@pytest.mark.parametrize("seed", [0, 3])
def test_random_agent_parity(seed):
    run_parity(random_step, oracle_agents.random_step, seed)


@pytest.mark.parametrize("seed", [1, 4])
def test_script_agent_parity(seed):
    run_parity(script_step, oracle_agents.script_step, seed)


def test_script_beats_random():
    cfg = Config()
    state = mirrored_initial_states(jax.random.PRNGKey(11), 32)
    res = play_match(jax.random.PRNGKey(12), state, AGENT_SCRIPT,
                     AGENT_RANDOM, cfg, 3000)
    s = summarize(res)
    assert s["unfinished"] == 0
    # The scripted strategy must dominate uniform-random play.
    assert s["p0_wins"] >= 0.8 * s["games"], s


def test_watch_mode_runs_headless(capsys):
    """The interactive viewer (utils/watch.py) must play a full scripted
    game headless (reference board GUI replacement)."""
    from alphazero_risk_tpu.utils.watch import watch_game

    status = watch_game("sp", "rp", seed=5, pause=False)
    out = capsys.readouterr().out
    assert status in (0, 1, -2)
    assert "wins in round" in out or "draw" in out
    assert "NORTH_AMERICA" in out
