"""Native engine (libriskcore) cross-validation against the Python oracle.

Three independent implementations of the rules — the vectorized JAX engine,
the scalar Python oracle, and the C++ engine — must agree; oracle<->JAX
parity is covered in test_parity.py, this file closes the triangle.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from alphazero_risk_tpu.config import Config, STATUS_NOT_ENDED
from alphazero_risk_tpu.env import oracle

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module")
def engine():
    if not (NATIVE_DIR / "libriskcore.so").exists():
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True)
    from alphazero_risk_tpu.native import NativeEngine
    return NativeEngine(Config())


def c_state_fields(s):
    return dict(owner=list(s.owner), army=list(s.army), phase=s.phase,
                round=s.round, cur_player=s.cur_player,
                reinforcements=s.reinforcements, cards=list(s.cards),
                card_sets_played=s.card_sets_played, mob_from=s.mob_from,
                mob_to=s.mob_to, can_draw=bool(s.can_draw_card),
                attacks=s.attacks_during_turn)


def o_state_fields(g):
    return dict(owner=g.owner, army=g.army, phase=g.phase, round=g.round,
                cur_player=g.cur_player, reinforcements=g.reinforcements,
                cards=g.cards, card_sets_played=g.card_sets_played,
                mob_from=g.mob_from, mob_to=g.mob_to,
                can_draw=g.can_draw_card, attacks=g.attacks_during_turn)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_oracle_trajectory_parity(engine, seed):
    cfg = Config()
    rng = np.random.default_rng(seed)
    perm = rng.permutation(42).astype(np.int32)
    cs = engine.new_game(perm)
    og = oracle.new_game([int(x) for x in perm])
    for t in range(1500):
        o_status = oracle.game_status(og, cfg)
        assert engine.status(cs) == o_status
        if o_status != STATUS_NOT_ENDED:
            break
        cmask = engine.legal_actions(cs)
        omask = np.array(oracle.legal_actions(og, cfg))
        assert (cmask == omask).all(), f"step {t}: legal masks differ"
        action = int(rng.choice(np.nonzero(omask)[0]))
        dice = rng.integers(1, 7, 5).astype(np.int32)
        engine.step(cs, action, dice)
        oracle.step(og, action, [int(d) for d in dice], cfg)
        a, b = c_state_fields(cs), o_state_fields(og)
        for k in a:
            assert list(np.ravel(a[k])) == list(np.ravel([b[k]])) or \
                a[k] == b[k], f"step {t}: field {k}: {a[k]} != {b[k]}"
    else:
        pytest.fail("game did not terminate")


@pytest.mark.slow
def test_native_jax_crossval_at_scale(engine):
    """Large-scale randomized cross-validation: 10K full games, every
    micro-step of the JAX engine diffed field-wise against riskcore
    (identical action/dice streams).  Catches tail-of-distribution rules
    bugs the small parity tests can't."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.crossval_native import run_batch

    total = 0
    done = 0
    while done < 10_000:
        b = min(512, 10_000 - done)
        total += run_batch(b, seed=done)
        done += b
    assert total > 2_000_000     # ~300+ micro-steps per game


def test_native_match_runner(engine):
    res, rounds, steps = engine.play_games("sp", "rp", 200, 11)
    assert (res != STATUS_NOT_ENDED).all()
    assert (res == 0).sum() >= 190  # script must crush random
    assert steps > 10000
    res2, _, _ = engine.play_games("sp", "sp", 200, 12)
    # mirrored self-matches must be roughly balanced
    assert abs(int((res2 == 0).sum()) - int((res2 == 1).sum())) < 80
