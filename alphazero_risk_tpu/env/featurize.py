"""State -> network-input featurization.

Vectorized equivalent of the reference's ``NNInputData`` construction +
tensor fill (reference: ``alphazero_nn_data.cpp:165-196`` and
``alphazero_nn.cpp:31-67``).  Output is ``[B, 7, 6, F]`` float32 where land
``l`` maps to grid cell ``(l // 6, l % 6)`` (7*6 == 42 exactly).

Feature layout (INPUT_VECTOR_TYPE_2 default, alphazero_nn_data.h:13-64):
  0  own army / 32          (on owned cells)
  1  enemy army / 32
  2  neutral army / 32
  3  army share             (broadcast; V2+)
  4  reinforcement share    (broadcast)
  5  attacks this turn / 8  (broadcast, clamped)
  6  can draw card          (broadcast)
  7..12  phase one-hot      (broadcast)
V3 inserts round/58 at plane 3 (shifting the rest), V1 drops army share.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Config, MAP_X, MAP_Y, NUM_LANDS, NUM_PHASES
from .rules import calc_reinforcement
from .state import GameState


def featurize(state: GameState, cfg: Config) -> jax.Array:
    b = state.batch_size
    p = state.cur_player[:, None]
    own = (state.owner == p)
    enemy = (state.owner == (1 - p))
    neutral = ~own & ~enemy
    army = state.army.astype(jnp.float32) / cfg.land_army_max

    planes = [
        jnp.where(own, army, 0.0),
        jnp.where(enemy, army, 0.0),
        jnp.where(neutral, army, 0.0),
    ]

    # Broadcast scalars
    ref = calc_reinforcement(own).astype(jnp.float32)
    eref = calc_reinforcement(enemy).astype(jnp.float32)
    reinforcement_share = ref / (ref + eref)
    attack_freq = jnp.minimum(
        state.attacks_during_turn.astype(jnp.float32) / 8.0, 1.0)
    can_draw = state.can_draw_card.astype(jnp.float32)

    ta = (state.army * own).sum(-1).astype(jnp.float32)
    eta = (state.army * enemy).sum(-1).astype(jnp.float32)
    army_share = ta / (ta + eta)

    scalars = []
    if cfg.feature_version == 3:
        scalars.append(state.round.astype(jnp.float32) / cfg.max_game_rounds)
    if cfg.feature_version >= 2:
        scalars.append(army_share)
    scalars.append(reinforcement_share)
    scalars.append(attack_freq)
    scalars.append(can_draw)

    phase_onehot = jax.nn.one_hot(state.phase, NUM_PHASES, dtype=jnp.float32)

    land_planes = jnp.stack(planes, axis=-1)  # [B, 42, 3]
    scalar_planes = jnp.stack(scalars, axis=-1)  # [B, S]
    flat = jnp.concatenate([
        land_planes,
        jnp.broadcast_to(scalar_planes[:, None, :],
                         (b, NUM_LANDS, scalar_planes.shape[-1])),
        jnp.broadcast_to(phase_onehot[:, None, :],
                         (b, NUM_LANDS, NUM_PHASES)),
    ], axis=-1)  # [B, 42, F]

    return flat.reshape(b, MAP_Y, MAP_X, flat.shape[-1])
