"""Shared agent utilities and the explicit randomness discipline.

Every agent micro-step consumes at most ``u[B, 4]`` uniforms (masked
choices / coins / amounts / card draw) and ``dice[B, 5]`` (battle
resolution).  Feeding the same streams to the scalar oracle agents and the
vectorized agents makes their trajectories bit-identical — the framework's
replacement for the reference's single global ``std::default_random_engine``
(rng.h:38-50), whose draw order is implementation-defined and therefore not
a portable contract.

Slot convention: u[0] primary choice, u[1] secondary (attack-from /
fortify-from), u[2] amount or coin, u[3] card draw (full-cards mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..env.rules import first_set_bit, masked_choice  # noqa: F401

U_PER_STEP = 4
DICE_PER_STEP = 5


def draw_step_randoms(key: jax.Array, batch_size: int):
    """(u[B,4] float32 in [0,1), dice[B,5] int32 in [1,6]) for one step."""
    ku, kd = jax.random.split(key)
    u = jax.random.uniform(ku, (batch_size, U_PER_STEP))
    dice = jax.random.randint(kd, (batch_size, DICE_PER_STEP), 1, 7,
                              dtype=jnp.int32)
    return u, dice
