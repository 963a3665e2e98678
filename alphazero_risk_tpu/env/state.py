"""Batched Risk game state as a struct-of-arrays pytree.

One ``GameState`` with leading batch dimension ``B`` replaces ``B`` reference
``State`` objects (reference: ``src/risk_game/state/state.h:86-105``).  The
reference packs armies into 6-bit fields and maintains five incremental
48-bit ownership masks per player; under XLA those micro-optimisations are
counterproductive — masks are recomputed on the fly from ``owner``/``army``
with one small matmul (see ``rules.player_masks``), which keeps the state
minimal and makes every transition trivially correct by construction.

All fields are int32/bool: 42-element rows are tiny, and int32 avoids TPU
narrow-dtype layout padding for sub-word types.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..config import (
    NEUTRAL_PLAYER,
    NUM_LANDS,
    PH_SETUP,
)


@struct.dataclass
class GameState:
    """Mirror of reference ``Data`` (state.h:86-105), vectorized.

    Fields dropped vs the reference: the five incremental PlayerStatus masks
    (recomputed), ``drawnCardsBitMask`` (always 0 under simple_cards), the
    lazy hash (no transposition table on device).
    """

    owner: jax.Array           # [B, 42] int32 in {0, 1, 2=neutral}
    army: jax.Array            # [B, 42] int32 in [0, land_army_max]
    phase: jax.Array           # [B] int32, PH_* constants
    round: jax.Array           # [B] int32, starts at 1
    cur_player: jax.Array      # [B] int32 in {0, 1}
    reinforcements: jax.Array  # [B] int32 (setup pool or turn budget)
    cards: jax.Array           # [B, 2] int32 card counts (simple_cards)
    card_sets_played: jax.Array  # [B] int32
    mob_from: jax.Array        # [B] int32 land index, -1 = None
    mob_to: jax.Array          # [B] int32 land index, -1 = None
    can_draw_card: jax.Array   # [B] bool
    attacks_during_turn: jax.Array  # [B] int32
    # Full-cards mode only (STATE_SIMPLE_CARDS off, state.h:68-72,100-104):
    # per-territory hands and the drawn-pile mask.  All-false under
    # simple_cards.
    player_cards: jax.Array    # [B, 2, 42] bool
    drawn_cards: jax.Array     # [B, 42] bool

    @property
    def batch_size(self) -> int:
        return self.phase.shape[0]


def new_game(key: jax.Array, batch_size: int) -> GameState:
    """Deal a fresh batch of games (reference ``State::newGame``,
    state.cpp:137-167).

    The reference deals one random free land at a time in the fixed cycle
    [P0, P1, neutral]; that is exactly a random permutation of the 42 lands
    with the owner pattern tiled over it.  Each land starts with 1 army and
    the shared setup pool is (40 - 14) * 2 = 52 armies.
    """
    keys = jax.random.split(key, batch_size)
    perm = jax.vmap(lambda k: jax.random.permutation(k, NUM_LANDS))(keys)
    pattern = jnp.tile(jnp.array([0, 1, NEUTRAL_PLAYER], jnp.int32),
                       NUM_LANDS // 3)
    owner = jnp.zeros((batch_size, NUM_LANDS), jnp.int32)
    owner = owner.at[jnp.arange(batch_size)[:, None], perm].set(
        jnp.broadcast_to(pattern, (batch_size, NUM_LANDS)))
    b = batch_size
    return GameState(
        owner=owner,
        army=jnp.ones((b, NUM_LANDS), jnp.int32),
        phase=jnp.full((b,), PH_SETUP, jnp.int32),
        round=jnp.ones((b,), jnp.int32),
        cur_player=jnp.zeros((b,), jnp.int32),
        reinforcements=jnp.full((b,), 52, jnp.int32),
        cards=jnp.zeros((b, 2), jnp.int32),
        card_sets_played=jnp.zeros((b,), jnp.int32),
        mob_from=jnp.full((b,), -1, jnp.int32),
        mob_to=jnp.full((b,), -1, jnp.int32),
        can_draw_card=jnp.zeros((b,), bool),
        attacks_during_turn=jnp.zeros((b,), jnp.int32),
        player_cards=jnp.zeros((b, 2, NUM_LANDS), bool),
        drawn_cards=jnp.zeros((b, NUM_LANDS), bool),
    )


def invert_players(state: GameState) -> GameState:
    """Swap the two real players (reference ``State::invertPlayers``,
    state.cpp:493-516).  Used for mirrored game pairs."""
    owner = jnp.where(state.owner == 0, 1,
                      jnp.where(state.owner == 1, 0, state.owner))
    return state.replace(owner=owner, cards=state.cards[:, ::-1],
                         player_cards=state.player_cards[:, ::-1])


def set_current_player(state: GameState, player) -> GameState:
    player = jnp.broadcast_to(jnp.asarray(player, jnp.int32),
                              state.cur_player.shape)
    return state.replace(cur_player=player)


def tree_select(pred: jax.Array, a, b):
    """Per-game select between two pytrees of [B, ...] arrays."""
    def sel(x, y):
        p = pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim))
        return jnp.where(p, x, y)
    return jax.tree.map(sel, a, b)
