"""Vectorized RandomPlayer: one micro-decision per call.

Mirrors reference ``RandomPlayer::takeTurn`` (random_player.cpp:22-111) at
micro-decision granularity: uniform legal choices in every phase, 1-unit
reinforcements, 50/50 mobilization, random fortify amount.  Engine effects go
through the shared primitives in ``env.rules`` — exactly as the reference
player calls ``State`` methods directly.

Randomness is explicit: ``u[B,4]`` uniforms + ``dice[B,5]`` per step
(see ``agents.common``).  u[0] = primary target choice, u[1] = secondary
(attack-from / fortify-from), u[2] = amount or mobilization coin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
from ..env import rules
from ..env.state import GameState, tree_select
from .common import masked_choice


def random_step(state: GameState, u: jax.Array, dice: jax.Array,
                cfg: Config) -> GameState:
    out, _ = random_step_recorded(state, u, dice, cfg)
    return out


def random_step_recorded(state: GameState, u: jax.Array, dice: jax.Array,
                         cfg: Config):
    """Like ``random_step`` but also returns the 43-way action the player
    "chose" — what reference ``addTrainingSample`` records as a one-hot
    policy target (random_player.cpp:29-82)."""
    rows = jnp.arange(state.batch_size)
    m = rules.player_masks(state, cfg)
    land_idx = jnp.arange(NUM_LANDS)[None, :]

    # SETUP: uniform owned land, +2 (random_player.cpp:26-31)
    li_setup = masked_choice(m.owned, u[:, 0])
    s_setup = state.replace(
        reinforcements=state.reinforcements - 2,
        army=state.army.at[rows, li_setup].add(2),
        phase=jnp.full_like(state.phase, PH_SETUP_NEUTRAL))

    # SETUP_NEUTRAL: uniform neutral land (random_player.cpp:32-37)
    li_n = masked_choice(m.neutral, u[:, 0])
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

    # REINFORCEMENT: play cards, then 1 unit on a uniform non-full owned
    # land (random_player.cpp:38-45)
    sr = rules.play_cards(state, cfg)
    li_r = masked_choice(m.owned & ~m.owned_full, u[:, 0])
    s_reinf = rules.apply_reinforcement(sr, li_r,
                                        jnp.ones_like(li_r), cfg)

    # ATTACK: uniform over attackable | skip; source = uniform armed owned
    # neighbour (random_player.cpp:46-62)
    atk_mask = jnp.concatenate(
        [m.attack_lands_with_army, jnp.ones((state.batch_size, 1), bool)],
        axis=-1)
    choice = masked_choice(atk_mask, u[:, 0])
    atk_skip = choice == NUM_LANDS
    tgt = jnp.clip(choice, 0, NUM_LANDS - 1)
    frm_mask = rules.ADJ[tgt] & m.owned_with_army
    frm = masked_choice(frm_mask, u[:, 1])
    s_attack = tree_select(
        atk_skip,
        state.replace(phase=jnp.full_like(state.phase, PH_FORTIFY)),
        rules.apply_attack(state, frm, tgt, dice, cfg))

    # ATTACK_MOBILIZATION: coin flip between moving min(3, n-1) and stopping
    # (random_player.cpp:63-76)
    mf = jnp.clip(state.mob_from, 0, NUM_LANDS - 1)
    amt = jnp.minimum(state.army[rows, mf] - 1, cfg.min_unit_move)
    s_mob = tree_select(u[:, 2] > 0.5,
                        rules.apply_mobilization(state, amt, cfg),
                        rules.goto_attack(state, cfg))

    # FORTIFY: uniform target (non-full owned | skip); source = uniform armed
    # land in target's component; amount = rand % max (random_player.cpp:77-109)
    f_mask = jnp.concatenate(
        [m.owned & ~m.owned_full, jnp.ones((state.batch_size, 1), bool)],
        axis=-1)
    fchoice = masked_choice(f_mask, u[:, 0])
    f_skip = fchoice == NUM_LANDS
    fto = jnp.clip(fchoice, 0, NUM_LANDS - 1)
    comp = rules.connected_to(m.owned, fto)
    cand = comp & (land_idx != fto[:, None]) & m.owned_with_army
    ffrom = masked_choice(cand, u[:, 1])
    max_amt = jnp.minimum(state.army[rows, ffrom] - 1,
                          cfg.land_army_max - state.army[rows, fto])
    ramt = (u[:, 2] * max_amt).astype(jnp.int32)  # rInt() % amount semantics
    can = ~f_skip & cand.any(-1)
    ramt = jnp.where(can, ramt, 0)
    sf = rules.apply_fortify(state, jnp.where(can, ffrom, 0),
                             jnp.where(can, fto, 0), ramt)
    s_fortify = rules.end_turn(sf, cfg, u[:, 3])

    ph = state.phase
    out = tree_select(ph == PH_SETUP, s_setup, s_fortify)
    out = tree_select(ph == PH_SETUP_NEUTRAL, s_neutral, out)
    out = tree_select(ph == PH_REINFORCEMENT, s_reinf, out)
    out = tree_select(ph == PH_ATTACK, s_attack, out)
    out = tree_select(ph == PH_ATTACK_MOBILIZATION, s_mob, out)

    # recorded action per phase (random_player.cpp addTrainingSample calls)
    skip = jnp.full_like(li_setup, NUM_LANDS)
    action = jnp.where(ph == PH_SETUP, li_setup,
              jnp.where(ph == PH_SETUP_NEUTRAL, li_n,
               jnp.where(ph == PH_REINFORCEMENT, li_r,
                jnp.where(ph == PH_ATTACK,
                          jnp.where(atk_skip, skip, tgt),
                 jnp.where(ph == PH_ATTACK_MOBILIZATION,
                           jnp.where(u[:, 2] > 0.5,
                                     jnp.clip(state.mob_to, 0,
                                              NUM_LANDS - 1),
                                     jnp.clip(state.mob_from, 0,
                                              NUM_LANDS - 1)),
                           jnp.where(f_skip, skip, fto)))))).astype(
        jnp.int32)

    live = rules.game_status(state, cfg) == STATUS_NOT_ENDED
    return tree_select(live, out, state), (action, live)
