"""Vectorized ScriptPlayer: the heuristic benchmark opponent.

Faithful micro-decision reformulation of reference ``ScriptPlayer``
(``script_player.cpp``): prioritize attacking the continent with fewest
unowned lands, pour reinforcements toward the chosen attack source, attack
until exhausted, move captured stacks forward, then fortify the largest
interior stack toward the most exposed border land.

The reference runs this as nested ``while`` loops over direct ``State``
calls; here the same control flow is expressed as a *stateless-per-step*
policy plus a tiny pinned carry (the (attack_to, attack_from) pair chosen at
each outer-loop boundary, and a flag for which ownership masks to use when
re-deriving it — first outer iteration uses owned/attackLands, later ones
the with-army variants, exactly as ``takeTurn`` does at
script_player.cpp:204-222).

Documented deviations from the reference (tie-breaking only):
  * fortify source/target ties broken by lowest land index instead of the
    flood-fill DFS pre-order (game_helper.cpp:51-109);
  * the fortify component tie (equal max interior stacks) prefers the
    component with the lowest-index land (std::sort on equal keys is
    unspecified order in the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..config import (
    Config,
    NUM_LANDS,
    PH_ATTACK,
    PH_ATTACK_MOBILIZATION,
    PH_FORTIFY,
    PH_REINFORCEMENT,
    PH_SETUP,
    PH_SETUP_NEUTRAL,
    STATUS_NOT_ENDED,
)
from ..env import rules, topology
from ..env.state import GameState, tree_select
from .common import first_set_bit, masked_choice

SCRIPT_LAND_RANK = jnp.asarray(topology.SCRIPT_LAND_RANK)
CONTINENT_TIE_RANK = jnp.asarray(topology.CONTINENT_TIE_RANK)
CONTINENT_MASK_F32 = jnp.asarray(
    topology.CONTINENT_MASK.astype("float32"))


@struct.dataclass
class ScriptCarry:
    """Within-turn pinned choices (reference member fields
    ``landAttackTo/landAttackFrom`` + the mask-mode of the outer loop)."""

    attack_to: jax.Array    # [B] int32, -1 = not pinned
    attack_from: jax.Array  # [B] int32
    mode_b: jax.Array       # [B] bool: use with-army masks on re-derivation


def init_carry(batch_size: int) -> ScriptCarry:
    return ScriptCarry(
        attack_to=jnp.full((batch_size,), -1, jnp.int32),
        attack_from=jnp.full((batch_size,), -1, jnp.int32),
        mode_b=jnp.zeros((batch_size,), bool),
    )


def _select_target(owned: jax.Array, attack_mask: jax.Array) -> jax.Array:
    """Continent priority + first attackable land in declared order
    (script_player.cpp:17-50, game_helper.cpp:19-36)."""
    not_owned = (~owned).astype(jnp.float32)
    per_cont_unowned = jnp.einsum(
        "bl,cl->bc", not_owned, CONTINENT_MASK_F32).astype(jnp.int32)
    per_cont_attack = jnp.einsum(
        "bl,cl->bc", (~owned & attack_mask).astype(jnp.float32),
        CONTINENT_MASK_F32).astype(jnp.int32)
    # sort key: (unowned asc, attackable desc, bitmask-magnitude desc);
    # pick first with attackable > 0.
    score = (per_cont_unowned * 1000 - per_cont_attack * 10
             + CONTINENT_TIE_RANK[None, :])
    score = jnp.where(per_cont_attack > 0, score, jnp.int32(10 ** 8))
    cont = jnp.argmin(score, axis=-1)
    # first attackable land of that continent in declared order
    rank = SCRIPT_LAND_RANK[cont]               # [B, 42]
    rank = jnp.where(attack_mask, rank, NUM_LANDS + 1)
    return jnp.argmin(rank, axis=-1).astype(jnp.int32)


def _select_from(state: GameState, target: jax.Array,
                 owned_mask: jax.Array) -> jax.Array:
    """Max-army owned neighbour of the target, first-in-list on ties
    (script_player.cpp:52-69)."""
    cand = rules.ADJ[target] & owned_mask
    score = jnp.where(cand, state.army * 8 - rules.NEIGHBOR_RANK[target], -1)
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


def script_step(state: GameState, carry: ScriptCarry, reset: jax.Array,
                u: jax.Array, dice: jax.Array, cfg: Config):
    out, ncarry, _ = script_step_recorded(state, carry, reset, u, dice, cfg)
    return out, ncarry


def script_step_recorded(state: GameState, carry: ScriptCarry,
                         reset: jax.Array, u: jax.Array, dice: jax.Array,
                         cfg: Config):
    """Advance every game one script micro-decision.

    ``reset`` marks games whose mover just became this agent (turn start).
    Returns (new_state, new_carry, (action43, record_mask)) — the action is
    what reference ``addTrainingSample`` records as a one-hot policy target
    (script_player.cpp:105,115,125,151,157,176,198).
    """
    b = state.batch_size
    rows = jnp.arange(b)
    land_idx = jnp.arange(NUM_LANDS)[None, :]
    fresh = init_carry(b)
    carry = tree_select(reset, fresh, carry)

    m = rules.player_masks(state, cfg)

    # ---------------- SETUP: reinforce the best attack source
    # (script_player.cpp:164-178) ----------------
    t_setup = _select_target(m.owned, m.attack_lands)
    f_setup = _select_from(state, t_setup, m.owned)
    s_setup = state.replace(
        reinforcements=state.reinforcements - 2,
        army=state.army.at[rows, f_setup].add(2),
        phase=jnp.full_like(state.phase, PH_SETUP_NEUTRAL))

    # ---------------- SETUP_NEUTRAL: random neutral next to the enemy
    # (script_player.cpp:180-200) ----------------
    pref1 = m.neutral & m.enemy_attack_lands & ~m.attack_lands
    pref2 = m.neutral & m.enemy_attack_lands
    pool = tree_select(pref1.any(-1), pref1,
                       tree_select(pref2.any(-1), pref2, m.neutral))
    li_n = masked_choice(pool, u[:, 0])
    sn = state.replace(army=state.army.at[rows, li_n].add(1),
                       round=state.round + 1,
                       cur_player=(1 - state.cur_player).astype(jnp.int32))
    done_setup = sn.reinforcements == 0
    owned_next = sn.owner == sn.cur_player[:, None]
    s_neutral = sn.replace(
        phase=jnp.where(done_setup, PH_REINFORCEMENT, PH_SETUP
                        ).astype(jnp.int32),
        reinforcements=jnp.where(done_setup,
                                 rules.calc_reinforcement(owned_next),
                                 sn.reinforcements))

    # ---------------- REINFORCEMENT (script_player.cpp:71-110,204-218) ----
    need_pin = carry.attack_to < 0
    # cards are traded once, at the pin (turn start) — GameHelper::playCards
    # runs once per takeTurn (script_player.cpp:209).
    sr = tree_select(need_pin, rules.play_cards(state, cfg), state)
    pin_to = _select_target(m.owned, m.attack_lands)
    pin_from = _select_from(sr, pin_to, m.owned)
    r_to = jnp.where(need_pin, pin_to, carry.attack_to)
    r_from = jnp.where(need_pin, pin_from, carry.attack_from)
    carry_r = ScriptCarry(attack_to=r_to, attack_from=r_from,
                          mode_b=carry.mode_b)

    owned_not_full = (sr.owner == sr.cur_player[:, None]) & (
        sr.army < cfg.land_army_max)
    from_ok = owned_not_full[rows, r_from]
    near_to = rules.ADJ[r_to] & owned_not_full
    near_enemy = owned_not_full & (m.enemy_attack_lands |
                                   m.neutral_attack_lands)
    to_r = jnp.where(
        from_ok, r_from,
        jnp.where(near_to.any(-1), first_set_bit(near_to),
                  jnp.where(near_enemy.any(-1), first_set_bit(near_enemy),
                            first_set_bit(owned_not_full))))
    amt = jnp.minimum(
        jnp.minimum(cfg.min_unit_move, sr.reinforcements),
        cfg.land_army_max - sr.army[rows, to_r])
    s_reinf = rules.apply_reinforcement(sr, to_r, amt, cfg)
    # Pathological guard (cannot occur in the reference's regime): all owned
    # lands full -> drop the budget and move on.
    s_reinf = tree_select(owned_not_full.any(-1), s_reinf,
                          rules.goto_attack(sr, cfg))

    # ---------------- ATTACK (script_player.cpp:113-135,211-222) ----------
    to_valid = (carry.attack_to >= 0) & (
        state.owner[rows, jnp.clip(carry.attack_to, 0, NUM_LANDS - 1)]
        != state.cur_player)
    from_valid = (carry.attack_from >= 0) & (
        state.army[rows, jnp.clip(carry.attack_from, 0, NUM_LANDS - 1)] >= 2
    ) & (state.owner[rows, jnp.clip(carry.attack_from, 0, NUM_LANDS - 1)]
         == state.cur_player)
    pinned_ok = to_valid & from_valid
    # Re-derivation uses with-army masks (outer iterations >= 2).
    re_to = _select_target(m.owned, m.attack_lands_with_army)
    re_from = _select_from(state, re_to, m.owned_with_army)
    a_to = jnp.where(pinned_ok, carry.attack_to, re_to)
    a_from = jnp.where(pinned_ok, carry.attack_from, re_from)
    carry_a = ScriptCarry(attack_to=a_to, attack_from=a_from,
                          mode_b=carry.mode_b | ~pinned_ok)
    s_attack = rules.apply_attack(state, a_from, a_to, dice, cfg)

    # ---------------- ATTACK_MOBILIZATION: move everything, 3 at a time
    # (script_player.cpp:120-133) ----------------
    mf = jnp.clip(state.mob_from, 0, NUM_LANDS - 1)
    mamt = jnp.minimum(state.army[rows, mf] - 1, cfg.min_unit_move)
    s_mob = rules.apply_mobilization(state, mamt, cfg)

    # ---------------- FORTIFY (script_player.cpp:138-160,
    # game_helper.cpp:40-109) ----------------
    label = rules.component_labels(m.owned)
    has_outside = rules.neighbor_count(~m.owned) > 0
    interior = m.owned & ~has_outside
    # per-component max interior stack (landFortifyFromAmount)
    from_amt = jnp.zeros((b, NUM_LANDS), jnp.int32).at[rows[:, None], label
                                                       ].max(
        jnp.where(interior, state.army, 0))
    comp_score = from_amt * 64 - jnp.arange(NUM_LANDS)[None, :]
    comp_score = jnp.where(from_amt > 0, comp_score, -10 ** 6)
    best_c = jnp.argmax(comp_score, axis=-1).astype(jnp.int32)
    in_best = label == best_c[:, None]
    f_from_score = jnp.where(interior & in_best, state.army, -1)
    f_from = jnp.argmax(f_from_score, axis=-1).astype(jnp.int32)
    outside_cnt = rules.neighbor_count(~m.owned)
    f_to_score = jnp.where(m.owned & in_best & has_outside, outside_cnt, 0)
    f_to = jnp.argmax(f_to_score, axis=-1).astype(jnp.int32)
    do_fortify = (m.owned_with_army.any(-1) & (from_amt.max(-1) > 0)
                  & (f_to_score.max(-1) > 0))
    famt = jnp.minimum(state.army[rows, f_from] - 1,
                       cfg.land_army_max - state.army[rows, f_to])
    famt = jnp.where(do_fortify, jnp.maximum(famt, 0), 0)
    sf = rules.apply_fortify(state, jnp.where(do_fortify, f_from, 0),
                             jnp.where(do_fortify, f_to, 0), famt)
    s_fortify = rules.end_turn(sf, cfg, u[:, 3])

    # ---------------- blend ----------------
    ph = state.phase
    out = tree_select(ph == PH_SETUP, s_setup, s_fortify)
    out = tree_select(ph == PH_SETUP_NEUTRAL, s_neutral, out)
    out = tree_select(ph == PH_REINFORCEMENT, s_reinf, out)
    out = tree_select(ph == PH_ATTACK, s_attack, out)
    out = tree_select(ph == PH_ATTACK_MOBILIZATION, s_mob, out)

    new_carry = tree_select(ph == PH_REINFORCEMENT, carry_r, carry)
    new_carry = tree_select(ph == PH_ATTACK, carry_a, new_carry)

    # recorded action per phase (script_player.cpp addTrainingSample calls)
    skip = jnp.full((b,), NUM_LANDS, jnp.int32)
    action = jnp.where(ph == PH_SETUP, f_setup,
              jnp.where(ph == PH_SETUP_NEUTRAL, li_n,
               jnp.where(ph == PH_REINFORCEMENT, to_r,
                jnp.where(ph == PH_ATTACK, a_to,
                 jnp.where(ph == PH_ATTACK_MOBILIZATION,
                           jnp.clip(state.mob_to, 0, NUM_LANDS - 1),
                           jnp.where(do_fortify, f_to, skip)))))).astype(
        jnp.int32)
    live = rules.game_status(state, cfg) == STATUS_NOT_ENDED
    # fortify emits a sample only when the player has any armed land
    # (script_player.cpp:140-159)
    record = live & jnp.where(ph == PH_FORTIFY,
                              m.owned_with_army.any(-1), True)

    return (tree_select(live, out, state),
            tree_select(live, new_carry, carry),
            (action, record))

