"""Golden-trajectory tests: vectorized engine vs the scalar oracle.

Random legal actions with a shared dice stream must produce bit-identical
states in both engines at every micro-step.  This replaces the reference's
debug-build consistency checks (state.cpp:1181-1429) with a stronger
cross-implementation property test (SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alphazero_risk_tpu.config import Config, STATUS_NOT_ENDED
from alphazero_risk_tpu.env import oracle
from alphazero_risk_tpu.env import rules
from alphazero_risk_tpu.env.state import GameState, new_game

BATCH = 4
STEPS = 700


def oracle_to_arrays(games):
    return GameState(
        player_cards=jnp.array([g.player_cards for g in games], bool),
        drawn_cards=jnp.array([g.drawn_cards for g in games], bool),
        owner=jnp.array([g.owner for g in games], jnp.int32),
        army=jnp.array([g.army for g in games], jnp.int32),
        phase=jnp.array([g.phase for g in games], jnp.int32),
        round=jnp.array([g.round for g in games], jnp.int32),
        cur_player=jnp.array([g.cur_player for g in games], jnp.int32),
        reinforcements=jnp.array([g.reinforcements for g in games],
                                 jnp.int32),
        cards=jnp.array([g.cards for g in games], jnp.int32),
        card_sets_played=jnp.array([g.card_sets_played for g in games],
                                   jnp.int32),
        mob_from=jnp.array([g.mob_from for g in games], jnp.int32),
        mob_to=jnp.array([g.mob_to for g in games], jnp.int32),
        can_draw_card=jnp.array([g.can_draw_card for g in games], bool),
        attacks_during_turn=jnp.array(
            [g.attacks_during_turn for g in games], jnp.int32),
    )


def assert_states_equal(vec: GameState, games, step_idx):
    ref = oracle_to_arrays(games)
    for name in ("owner", "army", "phase", "round", "cur_player",
                 "reinforcements", "cards", "card_sets_played", "mob_from",
                 "mob_to", "can_draw_card", "attacks_during_turn",
                 "player_cards", "drawn_cards"):
        a = np.asarray(getattr(vec, name))
        b = np.asarray(getattr(ref, name))
        assert (a == b).all(), (
            f"step {step_idx}: field {name} diverged:\n{a}\nvs oracle\n{b}")


@pytest.mark.parametrize("seed,cfg", [
    (0, Config()),
    (1, Config()),
    (2, Config(simple_cards=False)),
    (3, Config(simple_cards=False, limit_reinforcement_moves=False)),
    (4, Config(limit_attack_moves=True)),
])
def test_trajectory_parity(seed, cfg):
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    state = new_game(key, BATCH)

    games = []
    for b in range(BATCH):
        perm = [int(l) for l in np.argsort(np.asarray(state.owner[b]) * 0 +
                                           np.arange(42))]
        # reconstruct a permutation consistent with the dealt owners:
        # oracle only needs the owner pattern, so build one directly.
        g = oracle.OracleState(owner=[int(x) for x in state.owner[b]],
                               army=[1] * 42)
        games.append(g)

    step_jit = jax.jit(rules.step, static_argnums=3)
    legal_jit = jax.jit(rules.legal_actions, static_argnums=1)
    status_jit = jax.jit(rules.game_status, static_argnums=1)

    for t in range(STEPS):
        vec_mask = np.asarray(legal_jit(state, cfg))
        statuses = [oracle.game_status(g, cfg) for g in games]
        actions = np.zeros(BATCH, np.int32)
        for b, g in enumerate(games):
            om = oracle.legal_actions(g, cfg)
            if statuses[b] == STATUS_NOT_ENDED:
                assert (vec_mask[b] == np.array(om)).all(), (
                    f"step {t} game {b} phase {g.phase}: legal masks differ\n"
                    f"vec   : {np.nonzero(vec_mask[b])[0]}\n"
                    f"oracle: {np.nonzero(np.array(om))[0]}")
            choices = np.nonzero(om)[0]
            actions[b] = rng.choice(choices)
        dice = rng.integers(1, 7, size=(BATCH, 5)).astype(np.int32)
        u_card = rng.random(BATCH).astype(np.float32)

        vec_status = np.asarray(status_jit(state, cfg))
        assert vec_status.tolist() == statuses, f"status diverged at {t}"

        state = step_jit(state, jnp.asarray(actions), jnp.asarray(dice), cfg,
                         None if cfg.simple_cards else jnp.asarray(u_card))
        for b, g in enumerate(games):
            oracle.step(g, int(actions[b]), [int(d) for d in dice[b]], cfg,
                        float(u_card[b]))
        assert_states_equal(state, games, t)
        if all(st != STATUS_NOT_ENDED for st in statuses):
            break
    else:
        pytest.fail("games did not terminate within step budget")


def test_games_terminate_and_army_bounds():
    cfg = Config()
    rng = np.random.default_rng(7)
    state = new_game(jax.random.PRNGKey(7), BATCH)
    games = [oracle.OracleState(owner=[int(x) for x in state.owner[b]],
                                army=[1] * 42) for b in range(BATCH)]
    for t in range(4000):
        done = True
        for g in games:
            if oracle.game_status(g, cfg) != STATUS_NOT_ENDED:
                continue
            done = False
            om = oracle.legal_actions(g, cfg)
            a = rng.choice(np.nonzero(om)[0])
            oracle.step(g, int(a), [int(d) for d in
                                    rng.integers(1, 7, 5)], cfg)
            assert max(g.army) <= cfg.land_army_max
            assert min(g.army) >= 1 or g.phase <= 1
        if done:
            break
    assert done, "oracle games did not terminate"


def test_fast_tiebreak_mode_plays_full_games():
    """exact_fortify_tiebreak=False (the ~2x-faster env mode) must still
    play complete legal games; it may differ from the exact mode only at
    fortify-source army ties."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from alphazero_risk_tpu.config import Config
    from alphazero_risk_tpu.env import rules
    from alphazero_risk_tpu.env.state import new_game

    cfg = Config(exact_fortify_tiebreak=False)
    state = new_game(jax.random.PRNGKey(11), 8)

    @jax.jit
    def play(s, k):
        ka, kd = jax.random.split(k)
        a = jax.random.categorical(
            ka, jnp.where(rules.legal_actions(s, cfg), 0.0, -1e9))
        return rules.step_key(s, a.astype(jnp.int32), kd, cfg)

    key = jax.random.PRNGKey(12)
    for _ in range(1500):
        key, sub = jax.random.split(key)
        state = play(state, sub)
    status = np.asarray(rules.game_status(state, cfg))
    assert (status != -1).all(), status
