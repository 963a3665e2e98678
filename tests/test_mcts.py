"""MCTS mechanics + search-quality integration tests."""

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_risk_tpu.config import Config
from alphazero_risk_tpu.agents import mirrored_initial_states
from alphazero_risk_tpu.env import rules
from alphazero_risk_tpu.env.state import new_game
from alphazero_risk_tpu.mcts import search as M
from alphazero_risk_tpu.mcts.outcomes import OUTCOME_PROBS
from alphazero_risk_tpu.training import actor as A


def heuristic_eval(state, legal):
    """Uniform prior + army/land-share value — a stand-in for the network
    (cf. the reference's debug random NN, alphazero_nn_data.cpp:29-49,
    but deterministic)."""
    probs = legal / jnp.maximum(legal.sum(-1, keepdims=True), 1)
    own = state.owner == state.cur_player[:, None]
    en = state.owner == (1 - state.cur_player)[:, None]
    ta = (state.army * own).sum(-1)
    ea = (state.army * en).sum(-1)
    lo = own.sum(-1)
    le = en.sum(-1)
    v = 0.5 * (ta - ea) / jnp.maximum(ta + ea, 1) + 0.5 * (lo - le) / 42.0
    return probs.astype(jnp.float32), v.astype(jnp.float32)


def test_outcome_probs_table():
    assert OUTCOME_PROBS.shape == (3, 2, 3)
    assert np.allclose(OUTCOME_PROBS.sum(-1), 1.0)
    # 1-die battles have no 2-loss outcome
    assert (OUTCOME_PROBS[0, :, 2] == 0).all()
    assert (OUTCOME_PROBS[:, 0, 2] == 0).all()
    # more attacker dice always helps
    assert OUTCOME_PROBS[2, 1, 0] > OUTCOME_PROBS[1, 1, 0]


def test_search_mechanics():
    cfg = Config(mcts_simulations=12, max_depth=20)
    root = new_game(jax.random.PRNGKey(0), 4)
    res = jax.jit(lambda r, k: M.search(r, k, cfg, heuristic_eval))(
        root, jax.random.PRNGKey(1))
    counts = np.asarray(res.visit_counts)
    assert (counts.sum(-1) == cfg.mcts_simulations).all()
    legal = np.asarray(rules.legal_actions(root, cfg))
    assert (counts[~legal] == 0).all()
    assert np.allclose(np.asarray(res.pi.sum(-1)), 1.0)
    nf = np.asarray(res.tree.next_free)
    assert (nf <= cfg.num_nodes).all()


def test_mcts_beats_random():
    cfg = Config(mcts_simulations=8, max_depth=16)
    state0 = mirrored_initial_states(jax.random.PRNGKey(3), 8)
    run = jax.jit(lambda s, k: A.run_episodes(
        heuristic_eval, s, k, cfg, 700, opponent=A.OPP_RANDOM,
        az_seats=(True, False), sample_moves=False))
    out = run(state0, jax.random.PRNGKey(9))
    st = np.asarray(out.status)
    assert (st != -1).all(), "episodes did not finish"
    assert (st == 0).sum() >= 7, f"MCTS should crush random, got {st}"


def test_backfill_values():
    cfg = Config(mcts_simulations=4, max_depth=8)
    state0 = new_game(jax.random.PRNGKey(5), 4)
    out = jax.jit(lambda s, k: A.run_episodes(
        heuristic_eval, s, k, cfg, 30, sample_moves=True))(
        state0, jax.random.PRNGKey(6))
    filled = A.backfill_values(out.samples, out.status)
    z = np.asarray(filled.value)
    st = np.asarray(out.status)
    # unfinished games -> 0 targets; finished -> +-1 matching mover
    for b in range(4):
        if st[b] < 0:
            assert (z[:, b] == 0).all()
    pis = np.asarray(out.samples.policy)
    valid = np.asarray(out.samples.valid)
    assert np.allclose(pis[valid].sum(-1), 1.0)


def test_tree_reuse_reroot():
    cfg = Config(mcts_simulations=12, max_depth=20, tree_reuse=True)
    root = new_game(jax.random.PRNGKey(2), 3)
    res = jax.jit(lambda r, k: M.search(r, k, cfg, heuristic_eval))(
        root, jax.random.PRNGKey(4))
    tree = res.tree
    b = 3
    rows = np.arange(b)
    children = np.asarray(tree.children)
    roots = np.asarray(tree.root)

    # pick a played edge that has an expanded child for each game
    actions = np.zeros(b, np.int32)
    outcomes = np.zeros(b, np.int32)
    for i in range(b):
        a, o = np.argwhere(children[i, roots[i]] >= 0)[0]
        actions[i], outcomes[i] = a, o
    old_child = children[rows, roots, actions, outcomes]
    old_visit = np.asarray(tree.visit)[rows, old_child]
    old_prior = np.asarray(tree.prior)[rows, old_child]

    new_tree, reused = jax.jit(
        lambda t, a, o: M.reroot(t, a, o, cfg))(
        tree, jnp.asarray(actions), jnp.asarray(outcomes))
    assert np.asarray(reused).all()
    nr = np.asarray(new_tree.root)
    nf = np.asarray(new_tree.next_free)
    assert (nr < nf).all()
    # stats carried over to the new root
    assert (np.asarray(new_tree.visit)[rows, nr] == old_visit).all()
    assert np.allclose(np.asarray(new_tree.prior)[rows, nr], old_prior)
    assert (np.asarray(new_tree.parent)[rows, nr] == -1).all()
    # all child links point inside the kept region
    nch = np.asarray(new_tree.children)
    for i in range(b):
        kept = nch[i, :nf[i]]
        assert (kept[kept >= 0] < nf[i]).all()
        assert (nch[i, nf[i]:] == -1).all()
    # carried root state must equal the played child's state
    for field in ("owner", "army", "phase", "cur_player"):
        old = np.asarray(getattr(tree.states, field))[rows, old_child]
        new = np.asarray(getattr(new_tree.states, field))[rows, nr]
        assert (old == new).all(), field


def test_selfplay_with_reuse_runs_and_is_legal():
    from alphazero_risk_tpu.training import actor as A
    cfg = Config(mcts_simulations=8, max_depth=12, tree_reuse=True)
    state0 = new_game(jax.random.PRNGKey(5), 4)
    out = jax.jit(lambda s, k: A.run_episodes(
        heuristic_eval, s, k, cfg, 60, sample_moves=True))(
        state0, jax.random.PRNGKey(6))
    valid = np.asarray(out.samples.valid)
    pi = np.asarray(out.samples.policy)
    assert valid.sum() >= 200
    assert np.allclose(pi[valid].sum(-1), 1.0)
    from alphazero_risk_tpu.env.checks import validate
    validate(out.state, cfg)


def test_table_dirichlet_matches_reference_sampler():
    """sample_dirichlet_noise (inverse-CDF table, loop-free) must be
    distributionally identical to jax.random.dirichlet over the legal
    subset: matching mean/variance and small KS distance."""
    import numpy as np
    from alphazero_risk_tpu.mcts.search import sample_dirichlet_noise

    legal = jnp.zeros((8000, 43), bool).at[:, :7].set(True)
    ours = np.asarray(sample_dirichlet_noise(
        jax.random.PRNGKey(0), legal))[:, :7]
    ref = np.asarray(jax.random.dirichlet(
        jax.random.PRNGKey(1), jnp.full((7,), 0.3), (8000,)))
    assert np.allclose(ours.mean(0), 1 / 7, atol=0.01)
    assert abs(ours.var(0).mean() - ref.var(0).mean()) < 0.004
    a, b = np.sort(ours[:, 0]), np.sort(ref[:, 0])
    grid = np.linspace(0, 1, 1000)
    ks = np.abs(np.searchsorted(a, grid) / len(a)
                - np.searchsorted(b, grid) / len(b)).max()
    assert ks < 0.035, ks   # ~0.03 crit at n=8000, p=0.05
    full = np.asarray(sample_dirichlet_noise(jax.random.PRNGKey(2), legal))
    assert np.allclose(full.sum(-1), 1.0, atol=1e-5)
    assert full[:, 7:].max() == 0.0
