"""Batched array MCTS with exact chance nodes.

TPU-native replacement for the reference's transposition-table MCTS
(``alphazero_mcts.{h,cpp}``).  Design mapping:

  reference                               | here
  ----------------------------------------|--------------------------------
  unordered_map<State, StateSimulations>  | preallocated arrays [B, N, ...]
  2 threads x recursive search + mutexes  | sims sequential, B games vector
  active_N virtual-loss dup guard         | unnecessary (no thread races)
  dice sampled per traversal, merged by   | explicit chance outcomes with
  state-keyed transpositions              | exact probabilities (<=3/edge)
  promise/future NN batcher               | one [B] leaf eval per sim step
  PUCT u = Q + noisedP*c*sqrt(1+sN)/(1+n) | identical (alphazero_mcts.cpp:78-86)
  pi_i ~ N_i^(1/tau)                      | identical (alphazero_mcts.cpp:121-148)

Each simulation: descend by PUCT sampling battle outcomes from
``OUTCOME_PROBS``, expand one node, evaluate the network on the [B] leaf
batch, back up with sign flips only across player changes
(alphazero_mcts.cpp:363-375 — one Risk turn is many same-player decisions).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import (
    Config,
    NUM_ACTIONS,
    NUM_LANDS,
    PH_ATTACK,
    SKIP_ACTION,
    STATUS_DRAW,
    STATUS_NOT_ENDED,
)
from ..env import rules
from ..env.state import GameState, tree_select
from .outcomes import OUTCOME_PROBS

OUTCOME_PROBS_J = jnp.asarray(OUTCOME_PROBS.astype(np.float32))

# eval_fn(state, legal_mask) -> (probs [B,43] masked+normalized, value [B])
EvalFn = Callable[[GameState, jax.Array], Tuple[jax.Array, jax.Array]]


@struct.dataclass
class Tree:
    states: GameState      # [B, N, ...]
    expanded: jax.Array    # [B, N] bool
    terminal: jax.Array    # [B, N] bool
    value: jax.Array       # [B, N] f32 — leaf value, node mover's view
    player: jax.Array      # [B, N] i32
    parent: jax.Array      # [B, N] i32 (-1 = root/unused)
    legal: jax.Array       # [B, N, 43] bool
    prior: jax.Array       # [B, N, 43] f32
    visit: jax.Array       # [B, N, 43] i32
    wsum: jax.Array        # [B, N, 43] f32
    children: jax.Array    # [B, N, 43, 3] i32 (-1 = unexpanded)
    next_free: jax.Array   # [B] i32
    root: jax.Array        # [B] i32 — current root node index


class SearchResult(NamedTuple):
    visit_counts: jax.Array  # [B, 43] root visit counts
    pi: jax.Array            # [B, 43] normalized tau=1 policy
    root_value: jax.Array    # [B] root network value
    tree: Tree


def _gather_state(states: GameState, n: jax.Array) -> GameState:
    rows = jnp.arange(n.shape[0])
    return jax.tree.map(lambda x: x[rows, n], states)


def _write_state(states: GameState, n: jax.Array, s: GameState,
                 mask: jax.Array) -> GameState:
    rows = jnp.arange(n.shape[0])

    def wr(dst, src):
        m = mask.reshape(mask.shape + (1,) * (src.ndim - 1))
        cur = dst[rows, n]
        return dst.at[rows, n].set(jnp.where(m, src, cur))

    return jax.tree.map(wr, states, s)


def _terminal_value(status: jax.Array, player: jax.Array) -> jax.Array:
    """Reference search terminal return (alphazero_mcts.cpp:324-333):
    +1 if the state's mover already won, -1 lost, 0 draw."""
    return jnp.where(status == STATUS_DRAW, 0.0,
                     jnp.where(status == player, 1.0, -1.0)
                     ).astype(jnp.float32)


def init_tree(root: GameState, cfg: Config, eval_fn: EvalFn) -> Tree:
    b = root.batch_size
    n = cfg.num_nodes
    states = jax.tree.map(
        lambda x: jnp.zeros((b, n) + x.shape[1:], x.dtype)
        .at[:, 0].set(x), root)
    legal0 = rules.legal_actions(root, cfg)
    probs0, value0 = eval_fn(root, legal0)
    status0 = rules.game_status(root, cfg)
    term0 = status0 != STATUS_NOT_ENDED
    tree = Tree(
        states=states,
        expanded=jnp.zeros((b, n), bool).at[:, 0].set(True),
        terminal=jnp.zeros((b, n), bool).at[:, 0].set(term0),
        value=jnp.zeros((b, n), jnp.float32).at[:, 0].set(
            jnp.where(term0, _terminal_value(status0, root.cur_player),
                      value0)),
        player=jnp.zeros((b, n), jnp.int32).at[:, 0].set(root.cur_player),
        legal=jnp.zeros((b, n, NUM_ACTIONS), bool).at[:, 0].set(legal0),
        prior=jnp.zeros((b, n, NUM_ACTIONS), jnp.float32).at[:, 0].set(
            probs0),
        visit=jnp.zeros((b, n, NUM_ACTIONS), jnp.int32),
        wsum=jnp.zeros((b, n, NUM_ACTIONS), jnp.float32),
        parent=jnp.full((b, n), -1, jnp.int32),
        children=jnp.full((b, n, NUM_ACTIONS, 3), -1, jnp.int32),
        next_free=jnp.ones((b,), jnp.int32),
        root=jnp.zeros((b,), jnp.int32),
    )
    return tree


def _puct_select(tree: Tree, n: jax.Array, cfg: Config) -> jax.Array:
    rows = jnp.arange(n.shape[0])
    legal = tree.legal[rows, n]
    prior = tree.prior[rows, n]
    visit = tree.visit[rows, n]
    wsum = tree.wsum[rows, n]
    sum_n = visit.sum(-1, keepdims=True).astype(jnp.float32)
    q = wsum / jnp.maximum(visit, 1)
    noised = (1.0 - cfg.noise_eps) * prior + cfg.noise_eps * cfg.noise_value
    u = q + noised * cfg.cpuct * jnp.sqrt(1.0 + sum_n) / (1.0 + visit)
    u = jnp.where(legal, u, -jnp.inf)
    return jnp.argmax(u, axis=-1).astype(jnp.int32)


def _sample_outcome(tree: Tree, n: jax.Array, action: jax.Array,
                    key: jax.Array) -> jax.Array:
    """Chance outcome for attack edges (exact probs); 0 otherwise."""
    rows = jnp.arange(n.shape[0])
    st = tree.states
    phase = st.phase[rows, n]
    army = st.army[rows, n]        # [B, 42]
    owner = st.owner[rows, n]
    player = tree.player[rows, n]
    li = jnp.clip(action, 0, NUM_LANDS - 1)
    owned_wa = (owner == player[:, None]) & (army >= 2)
    frm = rules.best_attack_from_army(army, li, owned_wa)
    a0 = army[rows, frm]
    d0 = army[rows, li]
    att_n, def_n, _ = rules.battle_comparisons(a0, d0)
    probs = OUTCOME_PROBS_J[att_n - 1, def_n - 1]   # [B, 3]
    o = jax.random.categorical(key, jnp.log(probs + 1e-30), axis=-1)
    is_battle = (phase == PH_ATTACK) & (action != SKIP_ACTION)
    return jnp.where(is_battle, o, 0).astype(jnp.int32)


def simulate_once(tree: Tree, key: jax.Array, cfg: Config,
                  eval_fn: EvalFn) -> Tree:
    b = tree.player.shape[0]
    rows = jnp.arange(b)
    depth_cap = cfg.max_depth

    path_nodes = jnp.zeros((b, depth_cap), jnp.int32)
    path_actions = jnp.zeros((b, depth_cap), jnp.int32)
    path_player = jnp.zeros((b, depth_cap), jnp.int32)

    # ---- descent ----
    def cond(c):
        (_, _, _, _, _, done, _, _, _, _) = c
        return (~done).any()

    def body(c):
        (cur, pn, pa, pp, depth, done, exp_n, exp_a, exp_o, k) = c
        k, ksel = jax.random.split(k)
        a = _puct_select(tree, cur, cfg)
        o = _sample_outcome(tree, cur, a, ksel)
        child = tree.children[rows, cur, a, o]
        # record edge for active games
        act = ~done
        pn = pn.at[rows, depth].set(jnp.where(act, cur, pn[rows, depth]))
        pa = pa.at[rows, depth].set(jnp.where(act, a, pa[rows, depth]))
        pp = pp.at[rows, depth].set(
            jnp.where(act, tree.player[rows, cur], pp[rows, depth]))
        new_depth = jnp.where(act, depth + 1, depth)
        unexp = act & (child < 0)
        term = act & (child >= 0) & tree.terminal[rows,
                                                  jnp.maximum(child, 0)]
        exp_n = jnp.where(unexp, cur, exp_n)
        exp_a = jnp.where(unexp, a, exp_a)
        exp_o = jnp.where(unexp, o, exp_o)
        new_cur = jnp.where(act & (child >= 0), jnp.maximum(child, 0), cur)
        new_done = done | unexp | term | (new_depth >= depth_cap)
        return (new_cur, pn, pa, pp, new_depth, new_done,
                exp_n, exp_a, exp_o, k)

    rows_root = tree.root
    root_done = tree.terminal[rows, rows_root]
    key, kdesc = jax.random.split(key)
    init = (tree.root, path_nodes, path_actions,
            path_player, jnp.zeros((b,), jnp.int32), root_done,
            jnp.full((b,), -1, jnp.int32), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32), kdesc)
    (cur, pn, pa, pp, depth, done, exp_n, exp_a, exp_o, _) = (
        jax.lax.while_loop(cond, body, init))

    expanding = (exp_n >= 0) & ~root_done

    # ---- expansion ----
    parent = _gather_state(tree.states, jnp.maximum(exp_n, 0))
    child_state = rules.step_with_outcome(parent, exp_a, exp_o, cfg)
    status = rules.game_status(child_state, cfg)
    term = status != STATUS_NOT_ENDED
    legal_c = rules.legal_actions(child_state, cfg)
    probs_c, value_c = eval_fn(child_state, legal_c)
    node_value = jnp.where(term,
                           _terminal_value(status, child_state.cur_player),
                           value_c)

    idx = jnp.where(expanding, tree.next_free, 0)
    idx = jnp.minimum(idx, cfg.num_nodes - 1)
    tree = tree.replace(
        states=_write_state(tree.states, idx, child_state, expanding),
        expanded=tree.expanded.at[rows, idx].set(
            jnp.where(expanding, True, tree.expanded[rows, idx])),
        terminal=tree.terminal.at[rows, idx].set(
            jnp.where(expanding, term, tree.terminal[rows, idx])),
        value=tree.value.at[rows, idx].set(
            jnp.where(expanding, node_value, tree.value[rows, idx])),
        player=tree.player.at[rows, idx].set(
            jnp.where(expanding, child_state.cur_player,
                      tree.player[rows, idx])),
        parent=tree.parent.at[rows, idx].set(
            jnp.where(expanding, jnp.maximum(exp_n, 0),
                      tree.parent[rows, idx])),
        legal=tree.legal.at[rows, idx].set(
            jnp.where(expanding[:, None], legal_c,
                      tree.legal[rows, idx])),
        prior=tree.prior.at[rows, idx].set(
            jnp.where(expanding[:, None], probs_c,
                      tree.prior[rows, idx])),
        children=tree.children.at[
            rows, jnp.maximum(exp_n, 0), exp_a, exp_o].set(
            jnp.where(expanding, idx,
                      tree.children[rows, jnp.maximum(exp_n, 0),
                                    exp_a, exp_o])),
        next_free=tree.next_free + expanding.astype(jnp.int32),
    )

    # ---- leaf value ----
    leaf_v = jnp.where(expanding, node_value, tree.value[rows, cur])
    leaf_p = jnp.where(expanding, child_state.cur_player,
                       tree.player[rows, cur])

    # ---- backup: closed form instead of a sequential walk ----
    # The value added at path edge d (in its parent's perspective) is the
    # leaf value times the product of sign flips over all player changes
    # below it (alphazero_mcts.cpp:363-375).  Computed as a suffix product
    # and applied with ONE batched scatter-add per stat array — O(1) kernel
    # launches instead of O(depth_cap).
    d_idx = jnp.arange(depth_cap)[None, :]
    active = (d_idx < depth[:, None]) & ~root_done[:, None]
    # child player of edge d: next parent on the path, or the leaf player
    # at the last edge.
    child_p = jnp.concatenate([pp[:, 1:], pp[:, -1:]], axis=1)
    child_p = jnp.where(d_idx == depth[:, None] - 1, leaf_p[:, None],
                        child_p)
    signs = jnp.where((pp == child_p) | ~active, 1.0, -1.0)
    suffix = jnp.cumprod(signs[:, ::-1], axis=1)[:, ::-1]
    v_d = leaf_v[:, None] * suffix
    w = active.astype(jnp.float32)
    tree = tree.replace(
        visit=tree.visit.at[rows[:, None], pn, pa].add(
            active.astype(jnp.int32)),
        wsum=tree.wsum.at[rows[:, None], pn, pa].add(v_d * w),
    )
    return tree


@functools.lru_cache(maxsize=4)
def _gamma_log_quantiles(alpha: float, n: int = 2048):
    """log-quantile table of Gamma(alpha) on a log-uniform grid.

    Root Dirichlet noise needs iid Gamma(0.3) draws; XLA's native gamma
    sampler is a data-dependent rejection loop (slow on TPU, and the only
    while-loop the search graph would contain).  A 2048-point inverse-CDF
    table in log-log space replaces it with one interp: the quantile
    function of Gamma(a) is ~ linear in log-log for small u
    (log x ~ (log u + c) / a), so the low tail that dominates a=0.3
    stays accurate."""
    from scipy.stats import gamma as sp_gamma

    lu = np.linspace(np.log(1e-7), np.log(1.0 - 1e-4), n)
    q = sp_gamma.ppf(np.exp(lu), a=alpha)
    return jnp.asarray(lu, jnp.float32), jnp.asarray(np.log(q), jnp.float32)


def sample_dirichlet_noise(key: jax.Array, legal: jax.Array,
                           alpha: float = 0.3) -> jax.Array:
    """Dirichlet(alpha) over the legal subset of each row, loop-free.

    Independent Gamma(alpha) draws renormalized over the legal entries ARE
    Dirichlet(alpha) restricted to that subset (gamma aggregation), so
    illegal entries need no degenerate tiny-alpha draws at all."""
    lu, lq = _gamma_log_quantiles(float(alpha))
    u = jax.random.uniform(key, legal.shape, jnp.float32,
                           minval=1e-7, maxval=1.0 - 1e-4)
    g = jnp.exp(jnp.interp(jnp.log(u), lu, lq))
    g = jnp.where(legal, g, 0.0)
    return g / jnp.maximum(g.sum(-1, keepdims=True), 1e-30)


def _apply_root_noise(tree: Tree, key: jax.Array, cfg: Config) -> Tree:
    """True sampled Dirichlet blended into the ROOT prior (AlphaZero-style),
    as an alternative to the reference's constant blend applied at every
    node (alphazero_mcts.cpp:78-86, which _puct_select retains).  Also
    applied to carried roots under tree reuse — every search must explore
    from a freshly-noised root."""
    rows = jnp.arange(tree.root.shape[0])
    legal0 = tree.legal[rows, tree.root]
    noise = sample_dirichlet_noise(key, legal0)
    prior0 = ((1.0 - cfg.noise_eps) * tree.prior[rows, tree.root]
              + cfg.noise_eps * noise)
    return tree.replace(prior=tree.prior.at[rows, tree.root].set(prior0))


def search(root: GameState, key: jax.Array, cfg: Config,
           eval_fn: EvalFn) -> SearchResult:
    """Run ``cfg.mcts_simulations`` sims for every game in the batch."""
    tree = init_tree(root, cfg, eval_fn)

    if cfg.use_dirichlet_noise:
        key, kd = jax.random.split(key)
        tree = _apply_root_noise(tree, kd, cfg)

    def body(i, carry):
        tree, key = carry
        key, sub = jax.random.split(key)
        return simulate_once(tree, sub, cfg, eval_fn), key

    tree, _ = jax.lax.fori_loop(0, cfg.mcts_simulations, body, (tree, key))
    rows = jnp.arange(tree.root.shape[0])
    counts = tree.visit[rows, tree.root]
    pi = counts.astype(jnp.float32)
    pi = pi / jnp.maximum(pi.sum(-1, keepdims=True), 1e-9)
    return SearchResult(visit_counts=counts, pi=pi,
                        root_value=tree.value[rows, tree.root], tree=tree)


def reroot(tree: Tree, action: jax.Array, outcome: jax.Array,
           cfg: Config):
    """Advance the tree root through the edge actually played.

    Array-MCTS equivalent of the reference's ``trimNodes`` tree reuse
    (alphazero_mcts.cpp:229-245): the chosen child's subtree — stats,
    priors, leaf values — is compacted to the front of the node arrays and
    becomes the next search's starting tree; everything else is dropped.

    Returns (tree, reused[B]) — games whose played edge has no expanded
    child get ``reused=False`` and must be freshly initialized by the next
    ``search`` call.
    """
    b, n = tree.player.shape
    rows = jnp.arange(b)

    c = tree.children[rows, tree.root, action, outcome]
    has_child = c >= 0
    c_safe = jnp.maximum(c, 0)

    # reachable-from-c via parent-pointer doubling (subtree membership)
    idx = jnp.arange(n)[None, :]
    reach = idx == c_safe[:, None]
    anc = jnp.where(tree.parent >= 0, tree.parent, idx)
    for _ in range(7):  # 2^7 = 128 >= max depth
        reach = reach | jnp.take_along_axis(reach, anc, axis=1)
        anc = jnp.take_along_axis(anc, anc, axis=1)
    reach = reach & tree.expanded & has_child[:, None]

    # stable compaction: kept nodes first, in original order
    order = jnp.argsort(~reach, axis=1, stable=True)      # [B, N] old ids
    new_id_of_old = jnp.argsort(order, axis=1)            # inverse perm
    n_keep = reach.sum(-1)
    keep_pos = idx < n_keep[:, None]

    def gather_nodes(x):
        g = jnp.take_along_axis(
            x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1)
        return g

    # per-node arrays
    new_states = jax.tree.map(gather_nodes, tree.states)
    new_expanded = gather_nodes(tree.expanded) & keep_pos
    new_terminal = gather_nodes(tree.terminal) & keep_pos
    new_value = gather_nodes(tree.value)
    new_player = gather_nodes(tree.player)
    new_legal = gather_nodes(tree.legal) & keep_pos[:, :, None]
    new_prior = jnp.where(keep_pos[:, :, None], gather_nodes(tree.prior),
                          0.0)
    new_visit = jnp.where(keep_pos[:, :, None], gather_nodes(tree.visit), 0)
    new_wsum = jnp.where(keep_pos[:, :, None], gather_nodes(tree.wsum),
                         0.0)

    # remap parent/children ids through the permutation
    def remap_ids(ids):
        valid = ids >= 0
        mapped = jnp.take_along_axis(
            new_id_of_old,
            jnp.maximum(ids, 0).reshape(b, -1), axis=1).reshape(ids.shape)
        # drop links to nodes that were not kept
        kept_target = jnp.take_along_axis(
            reach, jnp.maximum(ids, 0).reshape(b, -1), axis=1
        ).reshape(ids.shape)
        return jnp.where(valid & kept_target, mapped, -1)

    new_parent = remap_ids(gather_nodes(tree.parent))
    new_parent = jnp.where(keep_pos, new_parent, -1)
    new_children = remap_ids(gather_nodes(tree.children))
    new_children = jnp.where(keep_pos[:, :, None, None], new_children, -1)

    new_root = jnp.take_along_axis(new_id_of_old, c_safe[:, None],
                                   axis=1)[:, 0]
    new_root = jnp.where(has_child, new_root, 0)
    # the new root has no parent
    new_parent = new_parent.at[rows, new_root].set(-1)

    out = Tree(
        states=new_states, expanded=new_expanded, terminal=new_terminal,
        value=new_value, player=new_player, parent=new_parent,
        legal=new_legal, prior=new_prior, visit=new_visit, wsum=new_wsum,
        children=new_children, next_free=n_keep.astype(jnp.int32),
        root=new_root.astype(jnp.int32))
    return out, has_child


def search_with_reuse(root_state: GameState, key: jax.Array, cfg: Config,
                      eval_fn: EvalFn, prev_tree: Tree,
                      reused: jax.Array) -> SearchResult:
    """``search`` starting from a re-rooted tree; games with ``~reused``
    (or whose carried root state went stale) fall back to a fresh tree."""
    fresh = init_tree(root_state, cfg, eval_fn)
    rows = jnp.arange(root_state.batch_size)
    # staleness check: the carried root must equal the actual state in
    # EVERY field (the reference reuses only exact transposition-table
    # hits, alphazero_mcts.cpp:229-245) — a partial check would silently
    # search a tree whose cards/mobilization context diverged.
    carried = _gather_state(prev_tree.states, prev_tree.root)

    def eq(a, b):
        d = a == b
        return d.reshape(d.shape[0], -1).all(-1)

    same_leaves = jax.tree.leaves(jax.tree.map(eq, carried, root_state))
    same = functools.reduce(jnp.logical_and, same_leaves, reused)
    tree = tree_select(same, prev_tree, fresh)

    if cfg.use_dirichlet_noise:
        key, kd = jax.random.split(key)
        tree = _apply_root_noise(tree, kd, cfg)

    def body(i, carry):
        tree, key = carry
        key, sub = jax.random.split(key)
        return simulate_once(tree, sub, cfg, eval_fn), key

    tree, _ = jax.lax.fori_loop(0, cfg.mcts_simulations, body, (tree, key))
    counts = tree.visit[rows, tree.root]
    pi = counts.astype(jnp.float32)
    pi = pi / jnp.maximum(pi.sum(-1, keepdims=True), 1e-9)
    return SearchResult(visit_counts=counts, pi=pi,
                        root_value=tree.value[rows, tree.root], tree=tree)


def pick_move(result: SearchResult, state: GameState, key: jax.Array,
              cfg: Config, sample: bool) -> jax.Array:
    """tau=1 visit-count policy; sample below the temperature-threshold
    round during training, argmax otherwise (alphazero_trainer.cpp:99-106,
    alphazero_mcts.cpp:379-412)."""
    if sample:
        do_sample = state.round <= cfg.temperature_threshold
        sampled = jax.random.categorical(
            key, jnp.log(result.pi + 1e-30), axis=-1)
        greedy = jnp.argmax(result.pi, axis=-1)
        return jnp.where(do_sample, sampled, greedy).astype(jnp.int32)
    return jnp.argmax(result.pi, axis=-1).astype(jnp.int32)
