"""Vectorized Risk rules engine: legality, transition, termination.

This is the TPU-native replacement for the reference's ``State`` mutation
methods (``src/risk_game/state/state.cpp``) *fused with* the AlphaZero action
abstraction ``UtilityNN::getValidMoves/makeMove``
(``src/risk_game/player/alpha_zero/alphazero_moves.cpp``): the framework's
canonical transition is ``step(state, action, dice)`` over the 43-way action
space, applied to a whole batch of games in lockstep.

Design notes (vs the reference):
  * All phase branches are computed for every game and blended with
    ``jnp.where`` — batch elements sit in different phases, so this is the
    data-parallel equivalent of the reference's per-phase dispatch.  Each
    branch is a handful of [B, 42] element-wise ops; the only matmuls are the
    [B,42]x[42,42] neighbourhood reductions.
  * Randomness is explicit: ``step`` consumes a ``[B, 5]`` dice tensor
    (3 attacker + 2 defender dice, values 1..6).  This makes the transition a
    pure deterministic function, which is what both the golden-trajectory
    oracle tests and the MCTS chance nodes need.  Under simple_cards
    (the reference's default build) dice are the *only* in-game randomness.
  * Tie-breaks that the reference resolves by neighbour-list iteration order
    are reproduced exactly via ``NEIGHBOR_RANK``, including the
    fortify-source tie-break (DFS pre-order of the recursive flood fill,
    game_helper.cpp:51-82 — see ``dfs_preorder_rank``).  Transitions are
    bit-exact vs the reference's own compiled rules code over full games
    (tests/test_refparity.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    Config,
    NUM_ACTIONS,
    NUM_LANDS,
    PH_ATTACK,
    PH_ATTACK_MOBILIZATION,
    PH_FORTIFY,
    PH_REINFORCEMENT,
    PH_SETUP,
    PH_SETUP_NEUTRAL,
    SKIP_ACTION,
    STATUS_DRAW,
    STATUS_NOT_ENDED,
    NEUTRAL_PLAYER,
)
from . import topology
from .state import GameState, tree_select

ADJ = jnp.asarray(topology.ADJACENCY)
ADJ_F32 = jnp.asarray(topology.ADJ_F32)
NEIGHBOR_RANK = jnp.asarray(topology.NEIGHBOR_RANK)
NEIGHBOR_IDX = jnp.asarray(topology.NEIGHBOR_IDX)
CONTINENT_MASK_F32 = jnp.asarray(topology.CONTINENT_MASK.astype(np.float32))
CONTINENT_SIZE = jnp.asarray(topology.CONTINENT_SIZE)
CONTINENT_BONUS = jnp.asarray(topology.CONTINENT_BONUS)

# Card-set reinforcement schedule (reference: state.cpp:1102-1111).
_GAIN = np.zeros(64, np.int32)
_GAIN[1:7] = [4, 6, 8, 10, 12, 15]
for _k in range(7, 64):
    _GAIN[_k] = 15 + (_k - 6) * 5
CARD_SET_GAIN = jnp.asarray(_GAIN)


def masked_choice(mask: jax.Array, u: jax.Array) -> jax.Array:
    """Uniform choice among set bits in ascending-index order (reference
    ``Utility::randomMask``, land.cpp:100-112).  Returns 0 on empty mask."""
    cnt = mask.sum(-1)
    n = jnp.clip((u * cnt).astype(jnp.int32), 0, jnp.maximum(cnt - 1, 0))
    csum = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    hit = mask & (csum == (n + 1)[..., None])
    return jnp.argmax(hit, axis=-1).astype(jnp.int32)


def first_set_bit(mask: jax.Array) -> jax.Array:
    """Lowest set index (reference ``Utility::getFirstBitMask``)."""
    return jnp.argmax(mask, axis=-1).astype(jnp.int32)


def neighbors_any(x: jax.Array) -> jax.Array:
    """[B,42] bool -> [B,42] bool: lands adjacent to any set land."""
    return jnp.einsum("bi,ij->bj", x.astype(jnp.float32), ADJ_F32) > 0.5


def neighbor_count(x: jax.Array) -> jax.Array:
    """[B,42] bool -> [B,42] int32: number of set neighbours per land."""
    return jnp.einsum(
        "bi,ij->bj", x.astype(jnp.float32), ADJ_F32).astype(jnp.int32)


class PlayerMasks(NamedTuple):
    """Derived per-current-player masks (reference ``PlayerStatus``,
    state.h:59-84 — there incrementally maintained, here recomputed)."""

    owned: jax.Array              # lands owned by current player
    enemy: jax.Array              # lands owned by the opponent
    neutral: jax.Array            # neutral lands
    owned_with_army: jax.Array    # owned, army >= 2
    owned_full: jax.Array         # owned, army == max
    attack_lands: jax.Array       # not owned, adjacent to owned
    attack_lands_with_army: jax.Array  # not owned, adjacent to owned w/ army
    enemy_attack_lands: jax.Array      # opponent's attack_lands
    neutral_attack_lands: jax.Array    # lands adjacent to neutral, not neutral


def player_masks(state: GameState, cfg: Config) -> PlayerMasks:
    p = state.cur_player[:, None]
    owned = state.owner == p
    enemy = state.owner == (1 - p)
    neutral = state.owner == NEUTRAL_PLAYER
    owned_with_army = owned & (state.army >= 2)
    owned_full = owned & (state.army >= cfg.land_army_max)
    attack_lands = ~owned & neighbors_any(owned)
    attack_lands_with_army = ~owned & neighbors_any(owned_with_army)
    enemy_attack = ~enemy & neighbors_any(enemy)
    # getNeutralPlayerAttackLands (state.cpp:1067-1083): every land adjacent
    # to a neutral land, minus the neutral lands themselves.
    neutral_attack = neighbors_any(neutral) & ~neutral
    return PlayerMasks(owned, enemy, neutral, owned_with_army, owned_full,
                       attack_lands, attack_lands_with_army, enemy_attack,
                       neutral_attack)


def calc_reinforcement(owned: jax.Array) -> jax.Array:
    """Turn-start reinforcement count (reference
    ``State::calculateReinforcementValue``, state.cpp:457-491)."""
    cnt = owned.sum(axis=-1).astype(jnp.int32)
    per_cont = jnp.einsum("bl,cl->bc", owned.astype(jnp.float32),
                          CONTINENT_MASK_F32).astype(jnp.int32)
    bonus = jnp.where(per_cont == CONTINENT_SIZE[None, :],
                      CONTINENT_BONUS[None, :], 0).sum(axis=-1)
    return jnp.maximum(cnt // 3 + bonus, 3)


def game_status(state: GameState, cfg: Config) -> jax.Array:
    """[B] int32: -1 running, -2 draw, else winner index
    (reference ``State::gameStatus``, state.cpp:518-565)."""
    p0 = (state.owner == 0).sum(axis=-1)
    p1 = (state.owner == 1).sum(axis=-1)
    status = jnp.full_like(p0, STATUS_NOT_ENDED)
    # Lowest priority first; later writes win.
    if True:  # round-cap termination
        over = state.round > cfg.max_game_rounds
        by_count = jnp.where(p0 > p1, 0, jnp.where(p0 < p1, 1, STATUS_DRAW))
        status = jnp.where(over, by_count, status)
    if cfg.allow_yield:
        status = jnp.where(p1 >= 30, 1, status)
        status = jnp.where(p0 >= 30, 0, status)
    status = jnp.where(p1 == 0, 0, status)
    status = jnp.where(p0 == 0, 1, status)
    return status.astype(jnp.int32)


def legal_actions(state: GameState, cfg: Config) -> jax.Array:
    """[B, 43] bool legality mask (reference ``UtilityNN::getValidMoves``,
    alphazero_moves.cpp:3-70)."""
    m = player_masks(state, cfg)
    b = state.batch_size
    skip_only = jnp.zeros((b, NUM_ACTIONS), bool).at[:, SKIP_ACTION].set(True)

    def with_skip(lands):
        return jnp.concatenate(
            [lands, jnp.ones((b, 1), bool)], axis=-1)

    def no_skip(lands):
        return jnp.concatenate(
            [lands, jnp.zeros((b, 1), bool)], axis=-1)

    # SETUP / REINFORCEMENT
    base = m.owned & ~m.owned_full
    if cfg.limit_reinforcement_moves:
        border = base & (m.enemy_attack_lands | m.neutral_attack_lands)
        lands = jnp.where(border.any(-1, keepdims=True), border, base)
    else:
        lands = base
    reinf_mask = jnp.where(base.any(-1, keepdims=True),
                           no_skip(lands), skip_only)

    # SETUP_NEUTRAL
    setup_neutral_mask = no_skip(m.neutral)

    # ATTACK
    if cfg.limit_attack_moves:
        attack_mask = jnp.where(
            m.attack_lands_with_army.any(-1, keepdims=True),
            no_skip(m.attack_lands_with_army), skip_only)
    else:
        attack_mask = with_skip(m.attack_lands_with_army)

    # ATTACK_MOBILIZATION: exactly {mob_from, mob_to}
    lands_idx = jnp.arange(NUM_LANDS)[None, :]
    mob_lands = (lands_idx == state.mob_from[:, None]) | (
        lands_idx == state.mob_to[:, None])
    mob_mask = no_skip(mob_lands)

    # FORTIFY
    if cfg.limit_reinforcement_moves:
        fortify_mask = with_skip(m.owned & m.enemy_attack_lands)
    else:
        fortify_mask = with_skip(m.owned)

    ph = state.phase[:, None]
    mask = jnp.where(
        (ph == PH_SETUP) | (ph == PH_REINFORCEMENT), reinf_mask,
        jnp.where(ph == PH_SETUP_NEUTRAL, setup_neutral_mask,
                  jnp.where(ph == PH_ATTACK, attack_mask,
                            jnp.where(ph == PH_ATTACK_MOBILIZATION, mob_mask,
                                      fortify_mask))))
    return mask


# ---------------------------------------------------------------------------
# Engine primitives (public: shared by the AZ action abstraction and the
# scripted/random opponents, which drive the engine with different embedded
# choices — mirroring how reference players call State methods directly)
# ---------------------------------------------------------------------------

def goto_attack(state: GameState, cfg: Config) -> GameState:
    """Reference ``State::gotoAttack`` (state.cpp:20-40): clear mobilization
    and leftover reinforcements; fall through to FORTIFY when the player has
    no land to attack from."""
    s = state.replace(
        reinforcements=jnp.zeros_like(state.reinforcements),
        mob_from=jnp.full_like(state.mob_from, -1),
        mob_to=jnp.full_like(state.mob_to, -1))
    m = player_masks(s, cfg)
    can_attack = m.attack_lands_with_army.any(-1)
    phase = jnp.where(can_attack, PH_ATTACK, PH_FORTIFY).astype(jnp.int32)
    return s.replace(phase=phase)


def draw_card(state: GameState, cfg: Config, u_card=None) -> GameState:
    """Reference ``State::drawCard`` (state.cpp:618-643).  Simple mode: the
    hand is a count.  Full mode: draw a uniform card from the undrawn pile,
    reshuffling (everything not in a hand) when the pile empties."""
    rows = jnp.arange(state.batch_size)
    p = state.cur_player
    if cfg.simple_cards:
        cards = state.cards.at[rows, p].add(
            state.can_draw_card.astype(jnp.int32))
        return state.replace(cards=cards)
    assert u_card is not None, "full-cards draw needs a uniform"
    # Reshuffle when the pile empties: cards in hands stay out of the deck.
    # (The reference's literal reshuffle marks the *fresh deck* as drawn,
    # state.cpp:627-632 — an upstream bug that would deal duplicate cards;
    # not reproduced.)
    available = ~state.drawn_cards
    empty = ~available.any(-1, keepdims=True)
    in_hands = state.player_cards.any(1)
    avail = jnp.where(empty, ~in_hands, available)
    drawn = jnp.where(empty, in_hands, state.drawn_cards)
    card = masked_choice(avail, u_card)
    card_oh = jax.nn.one_hot(card, NUM_LANDS, dtype=bool)
    do = state.can_draw_card[:, None]
    new_drawn = jnp.where(do, drawn | card_oh, state.drawn_cards)
    hand = state.player_cards[rows, p]
    new_hand = jnp.where(do, hand | card_oh, hand)
    return state.replace(
        drawn_cards=new_drawn,
        player_cards=state.player_cards.at[rows, p].set(new_hand))


def end_turn(state: GameState, cfg: Config, u_card=None) -> GameState:
    """Reference ``State::nextPlayerGameTurn`` (state.cpp:748-766): draw the
    earned card, advance the round, hand the turn (and a fresh reinforcement
    budget) to the opponent."""
    s = draw_card(state, cfg, u_card)
    nxt = (1 - s.cur_player).astype(jnp.int32)
    s = s.replace(
        can_draw_card=jnp.zeros_like(s.can_draw_card),
        round=s.round + 1,
        cur_player=nxt,
        attacks_during_turn=jnp.zeros_like(s.attacks_during_turn),
        phase=jnp.full_like(s.phase, PH_REINFORCEMENT),
    )
    owned_next = s.owner == nxt[:, None]
    return s.replace(reinforcements=calc_reinforcement(owned_next))


def play_cards(state: GameState, cfg: Config) -> GameState:
    """Card set trade-in (reference ``GameHelper::playCards`` dispatch,
    game_helper.cpp:3-17).

    Simple mode (default build): trade 3 counted cards whenever >= 3 held
    (state.cpp:1090-1117).  Full mode: best 3-card combo (same-type or
    one-of-each, preferring owned-territory cards) when *more than* 3 are
    held, +2 armies on the first owned combo land with space
    (game_helper.cpp:111-208, state.cpp:1119-1177)."""
    if cfg.simple_cards:
        p = state.cur_player
        held = state.cards[jnp.arange(state.batch_size), p]
        play = held >= 3
        cards = state.cards.at[jnp.arange(state.batch_size), p].add(
            jnp.where(play, -3, 0))
        sets = state.card_sets_played + play.astype(jnp.int32)
        gained = jnp.where(play, CARD_SET_GAIN[jnp.clip(sets, 0, 63)], 0)
        return state.replace(cards=cards, card_sets_played=sets,
                             reinforcements=state.reinforcements + gained)
    return _play_cards_full(state, cfg)


CARD_TYPES = jnp.stack([
    jnp.asarray(topology.CARD_INFANTRY),
    jnp.asarray(topology.CARD_HORSE),
    jnp.asarray(topology.CARD_SIEGE),
])  # [3, 42] bool


def _best_combo(hand: jax.Array, owned: jax.Array):
    """Vectorized ``GameHelper::getBestCombo`` (game_helper.cpp:145-208):
    returns ([B,42] combo mask, [B] valid).  Ties between equally-owned
    combos resolve in the fixed order infantry/horse/siege/one-of-each (the
    reference's std::sort on equal keys is unspecified order)."""
    b = hand.shape[0]
    idx = jnp.arange(NUM_LANDS)[None, :]
    eligible = hand.sum(-1) > 3          # strictly more than 3 cards

    combo_masks = []
    combo_scores = []
    for t in range(3):
        ht = hand & CARD_TYPES[t][None, :]
        valid = ht.sum(-1) >= 3
        # pick 3 cards, owned first, each group in ascending index order
        key = jnp.where(ht, (~owned).astype(jnp.int32) * 64 + idx, 10_000)
        _, picks = jax.lax.top_k(-key, 3)            # 3 smallest keys
        mask = jnp.zeros((b, NUM_LANDS), bool).at[
            jnp.arange(b)[:, None], picks].set(True) & ht
        owned_cnt = (mask & owned).sum(-1)
        combo_masks.append(mask)
        combo_scores.append(jnp.where(valid, owned_cnt, -1))

    # one of each type (preferring an owned card per type)
    each_valid = jnp.ones((b,), bool)
    each_mask = jnp.zeros((b, NUM_LANDS), bool)
    each_owned = jnp.zeros((b,), jnp.int32)
    for t in range(3):
        ht = hand & CARD_TYPES[t][None, :]
        each_valid &= ht.any(-1)
        ho = ht & owned
        pick = jnp.where(ho.any(-1), first_set_bit(ho), first_set_bit(ht))
        each_mask |= jax.nn.one_hot(pick, NUM_LANDS, dtype=bool) & ht
        each_owned += (ho.any(-1)).astype(jnp.int32)
    combo_masks.append(each_mask)
    combo_scores.append(jnp.where(each_valid, each_owned, -1))

    scores = jnp.stack(combo_scores, axis=-1)        # [B, 4]
    # earlier combo wins ties: score*8 + (3 - position)
    keyed = scores * 8 + (3 - jnp.arange(4))[None, :]
    keyed = jnp.where(scores >= 0, keyed, -1)
    best = jnp.argmax(keyed, axis=-1)
    combo = jnp.stack(combo_masks, axis=1)[jnp.arange(b), best]
    valid = eligible & (keyed.max(-1) >= 0)
    return combo & hand, valid


def _play_cards_full(state: GameState, cfg: Config) -> GameState:
    rows = jnp.arange(state.batch_size)
    p = state.cur_player
    hand = state.player_cards[rows, p]
    owned = state.owner == p[:, None]
    combo, play = _best_combo(hand, owned)

    # +2 on the first owned combo land with space (state.cpp:1145-1158)
    bonus_cand = combo & owned & (
        state.army + 2 <= cfg.land_army_max)
    bland = first_set_bit(bonus_cand)
    do_bonus = play & bonus_cand.any(-1)
    army = state.army.at[rows, bland].add(jnp.where(do_bonus, 2, 0))

    new_hand = jnp.where(play[:, None], hand & ~combo, hand)
    sets = state.card_sets_played + play.astype(jnp.int32)
    gained = jnp.where(play, CARD_SET_GAIN[jnp.clip(sets, 0, 63)], 0)
    return state.replace(
        army=army,
        player_cards=state.player_cards.at[rows, p].set(new_hand),
        card_sets_played=sets,
        reinforcements=state.reinforcements + gained)


def _move_amount(budget: jax.Array, cfg: Config) -> jax.Array:
    """FAST_ATTACK_MOBILIZATION half-stack sizing
    (reference alphazero_moves.cpp:108-118,153-164)."""
    if cfg.fast_attack_mobilization:
        half = budget // 2
        return jnp.where(half < cfg.min_unit_move,
                         jnp.minimum(cfg.min_unit_move, budget), half)
    return jnp.minimum(cfg.min_unit_move, budget)


def battle(army_from: jax.Array, army_to: jax.Array,
           dice: jax.Array):
    """One max-dice battle round (reference ``State::attackMove`` core,
    state.cpp:822-857 + ``getDiceRolls`` state.cpp:645-684).

    Args:
      army_from: [B] attacker armies on the source land (>= 2).
      army_to:   [B] defender armies on the target land (>= 1).
      dice: [B, 5] int32 in [1, 6]; dice[:, :3] attacker, dice[:, 3:] defender.

    Returns:
      (new_from, new_to, occupying_units) — all [B] int32.  ``new_to == 0``
      means the land was conquered and ``occupying_units`` attackers move in.
    """
    att_n = jnp.where(army_from >= 4, 3, jnp.where(army_from == 3, 2, 1))
    def_n = jnp.where(army_to >= 2, 2, 1)

    lane = jnp.arange(3)[None, :]
    att = jnp.where(lane < att_n[:, None], dice[:, :3], 0)
    att = jnp.sort(att, axis=-1)[:, ::-1]
    dfn = jnp.where(jnp.arange(2)[None, :] < def_n[:, None], dice[:, 3:], 0)
    dfn = jnp.sort(dfn, axis=-1)[:, ::-1]

    win1 = att[:, 0] > dfn[:, 0]
    second = (att_n >= 2) & (def_n == 2)
    win2 = second & (att[:, 1] > dfn[:, 1])
    lose2 = second & ~(att[:, 1] > dfn[:, 1])

    d_new = army_to - win1.astype(jnp.int32) - win2.astype(jnp.int32)
    a_new = army_from - (~win1).astype(jnp.int32) - lose2.astype(jnp.int32)
    units = att_n - (~win1).astype(jnp.int32) - lose2.astype(jnp.int32)
    return a_new, d_new, units


def apply_reinforcement(state: GameState, li: jax.Array, amount: jax.Array,
                        cfg: Config) -> GameState:
    """Place ``amount`` armies on ``li`` from the reinforcement budget
    (reference ``State::reinforcementMove``, state.cpp:976-998): auto-advance
    to ATTACK when the budget hits zero."""
    rows = jnp.arange(state.batch_size)
    s = state.replace(reinforcements=state.reinforcements - amount,
                      army=state.army.at[rows, li].add(amount))
    return tree_select(s.reinforcements == 0, goto_attack(s, cfg), s)


def apply_attack(state: GameState, frm: jax.Array, li: jax.Array,
                 dice: jax.Array, cfg: Config) -> GameState:
    """Resolve one battle from ``frm`` onto ``li`` (reference
    ``State::attackMove``, state.cpp:769-918): dice, casualties, conquest /
    mobilization entry, card-draw flag, auto-FORTIFY when no attack is left.
    """
    rows = jnp.arange(state.batch_size)
    p = state.cur_player
    a0 = state.army[rows, frm]
    d0 = state.army[rows, li]
    a1, d1, units = battle(a0, d0, dice)
    conquest = d1 == 0
    a2 = jnp.where(conquest, a1 - units, a1)
    s = state.replace(
        attacks_during_turn=state.attacks_during_turn + 1,
        army=state.army.at[rows, frm].set(a2)
                       .at[rows, li].set(jnp.where(conquest, units, d1)),
        owner=state.owner.at[rows, li].set(
            jnp.where(conquest, p, state.owner[rows, li])),
        can_draw_card=state.can_draw_card | conquest,
        phase=jnp.where(conquest & (a2 > 1), PH_ATTACK_MOBILIZATION,
                        state.phase).astype(jnp.int32),
        mob_from=jnp.where(conquest & (a2 > 1), frm, state.mob_from),
        mob_to=jnp.where(conquest & (a2 > 1), li, state.mob_to),
    )
    m = player_masks(s, cfg)
    stuck = (s.phase == PH_ATTACK) & ~m.attack_lands_with_army.any(-1)
    return s.replace(phase=jnp.where(stuck, PH_FORTIFY, s.phase
                                     ).astype(jnp.int32))


def apply_mobilization(state: GameState, amount: jax.Array,
                       cfg: Config) -> GameState:
    """Move ``amount`` armies from mob_from to mob_to (reference
    ``State::attackReinforcementMove``, state.cpp:920-947); back to ATTACK
    once only one army remains behind."""
    rows = jnp.arange(state.batch_size)
    mf = jnp.clip(state.mob_from, 0, NUM_LANDS - 1)
    mt = jnp.clip(state.mob_to, 0, NUM_LANDS - 1)
    s = state.replace(army=state.army.at[rows, mf].add(-amount)
                                     .at[rows, mt].add(amount))
    return tree_select(s.army[rows, mf] == 1, goto_attack(s, cfg), s)


def apply_fortify(state: GameState, frm: jax.Array, li: jax.Array,
                  amount: jax.Array) -> GameState:
    """Move ``amount`` armies between owned lands (reference
    ``State::fortifyMove``, state.cpp:949-974)."""
    rows = jnp.arange(state.batch_size)
    return state.replace(army=state.army.at[rows, frm].add(-amount)
                                        .at[rows, li].add(amount))


def battle_comparisons(army_from: jax.Array, army_to: jax.Array):
    """(att_n, def_n, ncomp) for a battle — ncomp is the number of dice
    comparisons (1 or 2), which determines the outcome space."""
    att_n = jnp.where(army_from >= 4, 3, jnp.where(army_from == 3, 2, 1))
    def_n = jnp.where(army_to >= 2, 2, 1)
    ncomp = jnp.where((att_n >= 2) & (def_n == 2), 2, 1)
    return att_n, def_n, ncomp


def battle_with_outcome(army_from: jax.Array, army_to: jax.Array,
                        outcome: jax.Array):
    """Deterministic battle resolution given the outcome index
    (= number of attacker losses, in [0, ncomp]).

    This is the chance-node form used by MCTS: the outcome distribution is
    exact (see ``mcts.outcomes.OUTCOME_PROBS``), so search averages over
    dice analytically instead of sampling trajectories like the reference's
    transposition-table recursion (alphazero_mcts.cpp:322-377).
    """
    att_n, def_n, ncomp = battle_comparisons(army_from, army_to)
    w1 = (outcome == 0) | ((outcome == 1) & (ncomp == 2))
    w2 = outcome == 0
    d_loss = w1.astype(jnp.int32) + (w2 & (ncomp == 2)).astype(jnp.int32)
    a_loss = (~w1).astype(jnp.int32) + (
        ~w2 & (ncomp == 2)).astype(jnp.int32)
    d_new = army_to - d_loss
    a_new = army_from - a_loss
    units = att_n - a_loss
    return a_new, d_new, units


def apply_attack_outcome(state: GameState, frm: jax.Array, li: jax.Array,
                         outcome: jax.Array, cfg: Config) -> GameState:
    """``apply_attack`` with a forced outcome instead of dice."""
    rows = jnp.arange(state.batch_size)
    p = state.cur_player
    a0 = state.army[rows, frm]
    d0 = state.army[rows, li]
    a1, d1, units = battle_with_outcome(a0, d0, outcome)
    conquest = d1 == 0
    a2 = jnp.where(conquest, a1 - units, a1)
    s = state.replace(
        attacks_during_turn=state.attacks_during_turn + 1,
        army=state.army.at[rows, frm].set(a2)
                       .at[rows, li].set(jnp.where(conquest, units, d1)),
        owner=state.owner.at[rows, li].set(
            jnp.where(conquest, p, state.owner[rows, li])),
        can_draw_card=state.can_draw_card | conquest,
        phase=jnp.where(conquest & (a2 > 1), PH_ATTACK_MOBILIZATION,
                        state.phase).astype(jnp.int32),
        mob_from=jnp.where(conquest & (a2 > 1), frm, state.mob_from),
        mob_to=jnp.where(conquest & (a2 > 1), li, state.mob_to),
    )
    m = player_masks(s, cfg)
    stuck = (s.phase == PH_ATTACK) & ~m.attack_lands_with_army.any(-1)
    return s.replace(phase=jnp.where(stuck, PH_FORTIFY, s.phase
                                     ).astype(jnp.int32))


def step_with_outcome(state: GameState, action: jax.Array,
                      outcome: jax.Array, cfg: Config) -> GameState:
    """``step`` with battle randomness replaced by an explicit outcome index.
    Non-attack phases ignore ``outcome``.  Used inside MCTS."""
    b = state.batch_size
    # Encode outcome as dice that produce it: attacker dice all 6 / all 1
    # would not cover the split outcome, so substitute the attack branch
    # directly instead of faking dice.
    dummy_dice = jnp.ones((b, 5), jnp.int32)
    out = step(state, action, dummy_dice, cfg)
    # Recompute only the attack-with-battle branch with the forced outcome.
    masks = player_masks(state, cfg)
    li = jnp.clip(action, 0, NUM_LANDS - 1)
    frm = best_attack_from(state, li, masks.owned_with_army)
    s_attack = apply_attack_outcome(state, frm, li, outcome, cfg)
    use_attack = (state.phase == PH_ATTACK) & (action != SKIP_ACTION) & (
        game_status(state, cfg) == STATUS_NOT_ENDED)
    return tree_select(use_attack, s_attack, out)


def best_attack_from_army(army: jax.Array, target: jax.Array,
                          owned_with_army: jax.Array) -> jax.Array:
    """Source-land selection for an attack action (reference
    alphazero_moves.cpp:122-144): the owned neighbour of ``target`` with the
    largest army, first-in-neighbour-list on ties."""
    adj_row = ADJ[target]                      # [B, 42] bool
    rank_row = NEIGHBOR_RANK[target]           # [B, 42] int32
    cand = adj_row & owned_with_army
    # (army-1)*8 - rank reproduces "first strict maximum in list order":
    # army dominates, earlier rank wins ties (rank < 8).
    score = jnp.where(cand, (army - 1) * 8 - rank_row, -1)
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


def best_attack_from(state: GameState, target: jax.Array,
                     owned_with_army: jax.Array) -> jax.Array:
    return best_attack_from_army(state.army, target, owned_with_army)


def reach_matrix(owned: jax.Array) -> jax.Array:
    """[B,42,42] bool reachability within the owned-land subgraph, via
    log-depth squaring (replaces the reference's recursive flood fill,
    game_helper.cpp:51-109)."""
    eye = jnp.eye(NUM_LANDS, dtype=bool)[None]
    m = (ADJ[None] & owned[:, None, :] & owned[:, :, None]) | (
        eye & owned[:, :, None])
    r = m.astype(jnp.float32)
    for _ in range(6):  # 2^6 = 64 > 42 hops
        r = jnp.minimum(jnp.einsum("bij,bjk->bik", r, r) + r, 1.0)
    return r > 0.5


def connected_to(owned: jax.Array, src: jax.Array) -> jax.Array:
    """[B,42] bool: owned lands in the same component as land ``src``.

    Frontier propagation to fixpoint — O(diameter) iterations of a tiny
    [B,42]x[42,42] matmul (typical owned-subgraph diameter is ~5; worst
    case 41), much lighter than materializing the [B,42,42] reachability.
    """
    reach0 = jax.nn.one_hot(src, NUM_LANDS, dtype=bool) & owned

    def cond(c):
        reach, grew = c
        return grew

    def body(c):
        reach, _ = c
        new = (reach | neighbors_any(reach)) & owned
        return new, (new != reach).any()

    reach, _ = jax.lax.while_loop(cond, body,
                                  (reach0, jnp.asarray(True)))
    return reach


def component_labels(owned: jax.Array) -> jax.Array:
    """[B,42] int32: per-land component label = lowest reachable land index
    within the owned subgraph (self-label for unowned lands).  Min-label
    propagation to fixpoint."""
    idx = jnp.arange(NUM_LANDS, dtype=jnp.int32)[None, :]
    big = jnp.int32(NUM_LANDS)
    lbl0 = jnp.where(owned, idx, big)

    def cond(c):
        lbl, grew = c
        return grew

    def body(c):
        lbl, _ = c
        # gather each land's <=6 neighbour labels (self-padded) and min
        neigh = lbl[:, NEIGHBOR_IDX]          # [B, 42, 6]
        neigh_min = jnp.min(jnp.where(owned[:, :, None] &
                                      owned[:, NEIGHBOR_IDX],
                                      neigh, big), axis=-1)
        new = jnp.where(owned, jnp.minimum(lbl, neigh_min), big)
        return new, (new != lbl).any()

    lbl, _ = jax.lax.while_loop(cond, body, (lbl0, jnp.asarray(True)))
    return jnp.where(owned, lbl, idx)


def dfs_preorder_rank(owned: jax.Array, root: jax.Array,
                      active: jax.Array | None = None,
                      until: jax.Array | None = None) -> jax.Array:
    """[B,42] DFS pre-order rank within the flood-fill component of
    ``root`` (reference ``GameHelper::LandSetMovement::add``,
    game_helper.cpp:51-82: recursive visit, neighbours in declaration
    order).  Rank 0 = root; NUM_LANDS outside the component.

    The reference's fortify-source selection keeps the FIRST strict
    maximum while iterating this pre-order (alphazero_moves.cpp:188-221),
    so exact trajectory parity needs the rank, not just membership.
    Stackless DFS: advance to the first unvisited owned neighbour (by
    NEIGHBOR_RANK), else backtrack via parent pointers — total iterations
    bounded by 2x the largest component among *running* games.

    The while_loop is the most sequential thing in ``step``, so two masks
    bound its trip count (round-4 fix: the unconditioned loop cost 4x of
    the whole env step, 5.2M -> 1.24M steps/s/chip):

    - ``active`` [B]: games whose ranks are needed at all; others never
      enter the loop (their ranks stay NUM_LANDS).
    - ``until`` [B,42]: per-game target set; a game stops as soon as every
      target is visited — ranks are then exact for all targets (and for
      everything visited before them), unspecified beyond.
    """
    b = owned.shape[0]
    rows = jnp.arange(b)
    idx = jnp.arange(NUM_LANDS, dtype=jnp.int32)[None, :]
    at_root = owned[rows, root]
    if active is not None:
        at_root &= active
    visited = (idx == root[:, None]) & owned
    rank = jnp.where(visited & at_root[:, None], 0,
                     NUM_LANDS).astype(jnp.int32)
    parent = jnp.full((b, NUM_LANDS), -1, jnp.int32)
    cur = jnp.where(at_root, root, -1).astype(jnp.int32)
    if until is not None:
        cur = jnp.where((until & ~visited).any(-1), cur, -1)
    count = at_root.astype(jnp.int32)

    def cond(c):
        cur = c[0]
        return (cur >= 0).any()

    def advance(c):
        cur, visited, rank, parent, count = c
        run = cur >= 0
        cs = jnp.maximum(cur, 0)
        nbr = ADJ[cs] & owned & ~visited
        has = nbr.any(-1) & run
        r = jnp.where(nbr, NEIGHBOR_RANK[cs], topology.MAX_DEGREE)
        nxt = jnp.argmin(r, axis=-1).astype(jnp.int32)
        new_cur = jnp.where(has, nxt,
                            jnp.where(run, parent[rows, cs], -1))
        hit = has[:, None] & (idx == nxt[:, None])
        visited = visited | hit
        if until is not None:
            new_cur = jnp.where((until & ~visited).any(-1), new_cur, -1)
        return (new_cur.astype(jnp.int32),
                visited,
                jnp.where(hit, count[:, None], rank),
                jnp.where(hit, cs[:, None], parent),
                count + has.astype(jnp.int32))

    def body(c):
        # several DFS moves per while iteration: the per-move compute is a
        # handful of fused [B,42] elementwise ops, so trip-count overhead
        # dominates — unrolling cuts it 4x (finished games no-op safely)
        for _ in range(4):
            c = advance(c)
        return c

    _, _, rank, _, _ = jax.lax.while_loop(
        cond, body, (cur, visited, rank, parent, count))
    return rank


# ---------------------------------------------------------------------------
# step
# ---------------------------------------------------------------------------

def step(state: GameState, action: jax.Array, dice: jax.Array,
         cfg: Config, u_card=None) -> GameState:
    """Apply one 43-way action per game (reference ``UtilityNN::makeMove``,
    alphazero_moves.cpp:72-233).

    ``action`` in [0, 43); 42 is skip/end-phase.  ``dice`` is [B, 5] in
    [1, 6], consumed only by attack resolutions.  Terminal games are left
    unchanged.  Behaviour on an illegal action is undefined (callers must
    mask with ``legal_actions``).
    """
    b = state.batch_size
    rows = jnp.arange(b)
    li = jnp.clip(action, 0, NUM_LANDS - 1)
    is_skip = action == SKIP_ACTION
    masks = player_masks(state, cfg)
    p = state.cur_player

    # ---- SETUP: place 2 on own land, to SETUP_NEUTRAL
    # (state.cpp:1009-1030) ----
    s_setup = state.replace(
        reinforcements=state.reinforcements - 2,
        army=state.army.at[rows, li].add(2),
        phase=jnp.full_like(state.phase, PH_SETUP_NEUTRAL),
    )

    # ---- SETUP_NEUTRAL: +1 on a neutral land, next setup turn
    # (state.cpp:1032-1053, nextPlayerSetupTurn state.cpp:725-746) ----
    sn = state.replace(
        army=state.army.at[rows, li].add(1),
        round=state.round + 1,
        cur_player=(1 - p).astype(jnp.int32),
    )
    setup_done = sn.reinforcements == 0
    owned_next = sn.owner == sn.cur_player[:, None]
    s_setup_neutral = sn.replace(
        phase=jnp.where(setup_done, PH_REINFORCEMENT, PH_SETUP
                        ).astype(jnp.int32),
        reinforcements=jnp.where(setup_done, calc_reinforcement(owned_next),
                                 sn.reinforcements),
    )

    # ---- REINFORCEMENT (alphazero_moves.cpp:104-121) ----
    sr = play_cards(state, cfg)
    amount = _move_amount(sr.reinforcements, cfg)
    amount = jnp.minimum(amount, cfg.land_army_max - sr.army[rows, li])
    sr = apply_reinforcement(sr, li, amount, cfg)
    s_reinf = tree_select(is_skip, goto_attack(state, cfg), sr)

    # ---- ATTACK (alphazero_moves.cpp:122-145, state.cpp:769-918) ----
    frm = best_attack_from(state, li, masks.owned_with_army)
    sa = apply_attack(state, frm, li, dice, cfg)
    s_attack = tree_select(
        is_skip, state.replace(phase=jnp.full_like(state.phase, PH_FORTIFY)),
        sa)

    # ---- ATTACK_MOBILIZATION (alphazero_moves.cpp:146-171,
    # state.cpp:920-947) ----
    mf = jnp.clip(state.mob_from, 0, NUM_LANDS - 1)
    value = state.army[rows, mf] - 1
    mamount = _move_amount(value, cfg)
    s_mob = tree_select(action == state.mob_from,
                        goto_attack(state, cfg),
                        apply_mobilization(state, mamount, cfg))

    # ---- FORTIFY (alphazero_moves.cpp:172-231) ----
    target_full = state.army[rows, li] >= cfg.land_army_max
    comp = connected_to(masks.owned, li)
    cand = comp & (jnp.arange(NUM_LANDS)[None, :] != li[:, None]) & (
        state.army >= 2)
    has_enemy_neighbor = neighbor_count(~masks.owned) > 0
    interior = cand & ~has_enemy_neighbor
    border = cand & has_enemy_neighbor
    use_interior = interior.any(-1)
    pick_from_mask = jnp.where(use_interior[:, None], interior, border)
    # First-strict-max over the reference's DFS pre-order: max army,
    # ties broken by earliest pre-order position (the reference iterates
    # lsm.landSet and keeps the first strict max, alphazero_moves.cpp:
    # 188-221; pre-order per game_helper.cpp:51-82 rooted at the lowest-
    # index land of the component, game_helper.cpp:90-105).
    # The DFS while_loop is sequential, so it only admits games that are
    # really in this decision AND have an army tie among max candidates
    # (argmax's lowest-index tie-break is already exact otherwise), and
    # each game stops once its tied lands all have ranks.
    running = game_status(state, cfg) == STATUS_NOT_ENDED
    if cfg.exact_fortify_tiebreak:
        top = jnp.where(pick_from_mask, state.army, -1).max(-1)
        tied = pick_from_mask & (state.army == top[:, None])
        need_rank = ((state.phase == PH_FORTIFY) & running & ~is_skip
                     & ~target_full & (tied.sum(-1) >= 2))
        pre_rank = dfs_preorder_rank(masks.owned, first_set_bit(comp),
                                     active=need_rank, until=tied)
        score = jnp.where(pick_from_mask,
                          state.army * 64 + (NUM_LANDS - pre_rank), -1)
    else:
        # lowest-index tie-break (argmax keeps the first max): identical
        # play unless two candidate sources tie on max armies
        score = jnp.where(pick_from_mask, state.army, -1)
    f_from = jnp.argmax(score, axis=-1)
    can_move = pick_from_mask.any(-1) & ~target_full & ~is_skip
    famount = jnp.minimum(state.army[rows, f_from] - 1,
                          cfg.land_army_max - state.army[rows, li])
    famount = jnp.where(can_move, famount, 0)
    sf = state.replace(
        army=state.army.at[rows, f_from].add(-famount)
                       .at[rows, li].add(famount))
    s_fortify = end_turn(sf, cfg, u_card)

    # ---- blend by phase ----
    ph = state.phase
    out = tree_select(ph == PH_SETUP, s_setup, s_fortify)
    out = tree_select(ph == PH_SETUP_NEUTRAL, s_setup_neutral, out)
    out = tree_select(ph == PH_REINFORCEMENT, s_reinf, out)
    out = tree_select(ph == PH_ATTACK, s_attack, out)
    out = tree_select(ph == PH_ATTACK_MOBILIZATION, s_mob, out)

    # Terminal games are frozen.  (``running`` computed in the FORTIFY
    # section above.)
    return tree_select(~running, state, out)


def roll_dice(key: jax.Array, batch_size: int) -> jax.Array:
    """[B, 5] dice in [1, 6] for one step."""
    return jax.random.randint(key, (batch_size, 5), 1, 7, dtype=jnp.int32)


def step_key(state: GameState, action: jax.Array, key: jax.Array,
             cfg: Config) -> GameState:
    kd, ku = jax.random.split(key)
    u_card = None if cfg.simple_cards else jax.random.uniform(
        ku, (state.batch_size,))
    return step(state, action, roll_dice(kd, state.batch_size), cfg, u_card)
