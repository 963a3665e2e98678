"""Shared agent utilities and the explicit randomness discipline.

Every agent micro-step consumes at most ``u[B, 4]`` uniforms (masked
choices / coins / amounts) and ``dice[B, 5]`` (battle resolution).  Feeding
the same streams to the scalar oracle agents and the vectorized agents makes
their trajectories bit-identical — the framework's replacement for the
reference's single global ``std::default_random_engine`` (rng.h:38-50),
whose draw order is implementation-defined and therefore not a portable
contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U_PER_STEP = 4
DICE_PER_STEP = 5


def masked_choice(mask: jax.Array, u: jax.Array) -> jax.Array:
    """Uniform choice among set bits, in ascending-index order.

    Matches the reference's ``Utility::randomMask`` / ``pickRandomMove``
    selection (land.cpp:100-112, random_player.cpp:3-20): draw
    ``n = floor(u * count)`` and take the n-th set bit.  Returns 0 when the
    mask is empty (callers must guard).
    """
    cnt = mask.sum(-1)
    n = jnp.clip((u * cnt).astype(jnp.int32), 0, jnp.maximum(cnt - 1, 0))
    csum = jnp.cumsum(mask.astype(jnp.int32), axis=-1)
    hit = mask & (csum == (n + 1)[..., None])
    return jnp.argmax(hit, axis=-1).astype(jnp.int32)


def first_set_bit(mask: jax.Array) -> jax.Array:
    """Lowest set index (reference ``Utility::getFirstBitMask``)."""
    return jnp.argmax(mask, axis=-1).astype(jnp.int32)


def draw_step_randoms(key: jax.Array, batch_size: int):
    """(u[B,4] float32 in [0,1), dice[B,5] int32 in [1,6]) for one step."""
    ku, kd = jax.random.split(key)
    u = jax.random.uniform(ku, (batch_size, U_PER_STEP))
    dice = jax.random.randint(kd, (batch_size, DICE_PER_STEP), 1, 7,
                              dtype=jnp.int32)
    return u, dice
