"""Trajectory-exact cross-validation vs the REAL reference engine.

Compiles the reference's own rules sources (state.cpp, land.cpp,
alphazero_moves.cpp, game_helper.cpp — unmodified, via native/refparity's
symlink shadow tree with a recording RNG) and locksteps full games against
``alphazero_risk_tpu.env.rules.step``: identical (action, dice) streams,
full state diffed field-wise after every micro-step, legal masks compared
before every move.  This is the BASELINE.md "trajectory-exact vs reference
under fixed seed" north star closed with the reference's actual C++, not a
builder-written oracle.
"""

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


def _can_build() -> bool:
    return os.path.isdir(REF) and shutil.which("g++") is not None


needs_ref = pytest.mark.skipif(not _can_build(),
                               reason="reference tree or g++ unavailable")


@needs_ref
def test_reference_trajectory_exact():
    from tools.refparity import run_trajectories

    steps = run_trajectories(games=6, seed0=4242)
    assert (steps > 50).all()        # real full games, not trivial stubs
    assert steps.sum() > 600


@needs_ref
@pytest.mark.slow
def test_reference_trajectory_exact_large():
    """Large-scale randomized cross-validation (VERDICT round-2 item 7):
    hundreds of full games, every micro-step bit-exact."""
    from tools.refparity import run_trajectories

    total = 0
    for s in range(4):
        steps = run_trajectories(games=64, seed0=10_000 + 64 * s)
        total += int(steps.sum())
    assert total > 50_000


@needs_ref
def test_reference_shim_builds_clean():
    """The shim rebuilds from scratch (catches reference-tree drift)."""
    out = subprocess.run(["make", "-C",
                          os.path.join(REPO, "native", "refparity")],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
