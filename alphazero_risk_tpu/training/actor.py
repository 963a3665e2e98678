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

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..agents import random_agent, script_agent
from ..agents.common import draw_step_randoms
from ..config import Config, NUM_LANDS, STATUS_NOT_ENDED
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
    policy: jax.Array           # float16 [.., 43] (wire-compact: MCTS
                                # visit shares need ~10 bits; halving the
                                # dominant field halves the device->host
                                # sample stream and the host->device
                                # epoch upload)
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
        player_cards=jnp.zeros((n, 2, NUM_LANDS), bool),
        drawn_cards=jnp.zeros((n, NUM_LANDS), bool),
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
        policy=pi.astype(jnp.float16),
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
    carry: "script_agent.ScriptCarry" = None   # opponent carry (chunking)
    prev_player: jax.Array = None              # mover of last step


def _opponent_step(kind: int, state, carry, reset, u, dice, cfg):
    """Returns (state, carry, (action43, record_mask))."""
    if kind == OPP_SCRIPT:
        return script_agent.script_step_recorded(state, carry, reset, u,
                                                 dice, cfg)
    if kind == OPP_RANDOM:
        s, info = random_agent.random_step_recorded(state, u, dice, cfg)
        return s, carry, info
    raise ValueError(kind)


def run_episodes(eval_fn, state0: GameState, key: jax.Array, cfg: Config,
                 num_steps: int, opponent: int = OPP_AZ,
                 az_seats: Tuple[bool, bool] = (True, True),
                 sample_moves: bool = True,
                 record_all: bool = True,
                 paired_eval: bool = False,
                 carry_in=None, prev_in=None) -> ActorOutput:
    """Advance B games ``num_steps`` micro-decisions.

    ``carry_in``/``prev_in`` resume a chunked run (the trainer drives
    episodes in bounded chunks so a single device execution stays short and
    finished batches stop early).

    ``eval_fn(state, legal) -> (probs, value)`` already closed over params.
    ``az_seats[p]`` — seat p is MCTS-driven; other seats use ``opponent``.
    ``sample_moves`` — temperature-threshold sampling (training) vs argmax
    (evaluation), reference alphazero_trainer.cpp:99-106.
    ``record_all`` — record opponent micro-decisions too (one-hot policy),
    like reference ``Player::addTrainingSample`` (player.cpp:9-17).
    ``paired_eval`` — ``eval_fn(state, legal, use_a)`` with use_a = the
    *root* mover is seat 0; each seat's MCTS evaluates every leaf with its
    own network, as in the reference arena where each player group owns its
    session (alphazero_gpu_cluster.cpp:105-160).

    When opponent records are not needed (``record_all=False``), opponent
    movers are fast-forwarded to their next AZ turn before each search, so
    no MCTS compute is spent on games an opponent is moving in.
    """
    b = state0.batch_size
    both_az = az_seats[0] and az_seats[1]
    fast_forward = not both_az and not record_all
    # tree reuse across moves: single-net paths (self-play and versus —
    # a Risk turn is many same-player micro-decisions, so the chosen
    # child's subtree usually survives to the next search; opponent moves
    # invalidate the carried root via the exact-state staleness check).
    # Trees are carried within one scan and refreshed at chunk
    # boundaries.  Paired arenas keep fresh trees: the two seats would
    # need separate tree stores.
    reuse = cfg.tree_reuse and not paired_eval

    def _az_turn_or_done(state):
        mover = state.cur_player
        az = jnp.where(mover == 0, az_seats[0], az_seats[1])
        live = rules.game_status(state, cfg) == STATUS_NOT_ENDED
        return az | ~live

    def body(carry, _):
        if reuse:
            state, sc_carry, prev_player, key, tree_prev, reused_prev = carry
        else:
            state, sc_carry, prev_player, key = carry
        key, k_mcts, k_pick, k_dice, k_opp = jax.random.split(key, 5)

        if fast_forward:
            def ff_cond(c):
                st, *_ = c
                return ~_az_turn_or_done(st).all()

            def ff_body(c):
                st, car, prev, k = c
                k, ko = jax.random.split(k)
                u, dice = draw_step_randoms(ko, b)
                reset = st.cur_player != prev
                s2, c2, _ = _opponent_step(opponent, st, car, reset, u,
                                           dice, cfg)
                moving = ~_az_turn_or_done(st)
                return (tree_select(moving, s2, st),
                        tree_select(moving, c2, car),
                        jnp.where(moving, st.cur_player, prev), k)

            key, kff = jax.random.split(key)
            state, sc_carry, prev_player, _ = jax.lax.while_loop(
                ff_cond, ff_body, (state, sc_carry, prev_player, kff))

        live = rules.game_status(state, cfg) == STATUS_NOT_ENDED
        mover = state.cur_player
        az_mask = jnp.where(mover == 0, az_seats[0], az_seats[1])

        # --- AZ path: batched MCTS + visit-count policy ---
        if paired_eval:
            use_a = mover == 0
            efn = lambda s, m: eval_fn(s, m, use_a)  # noqa: E731
        else:
            efn = eval_fn
        if reuse:
            res = mcts.search_with_reuse(state, k_mcts, cfg, efn,
                                         tree_prev, reused_prev)
        else:
            res = mcts.search(state, k_mcts, cfg, efn)
        action = mcts.pick_move(res, state, k_pick, cfg, sample_moves)
        if reuse:
            # step with explicit dice so the realized battle outcome can
            # re-root the tree (reference trimNodes reuse,
            # alphazero_mcts.cpp:229-245)
            k_dice, k_card = jax.random.split(k_dice)
            dice = rules.roll_dice(k_dice, b)
            u_card = (None if cfg.simple_cards else
                      jax.random.uniform(k_card, (b,)))
            masks_ = rules.player_masks(state, cfg)
            li = jnp.clip(action, 0, 42 - 1)
            frm = rules.best_attack_from(state, li, masks_.owned_with_army)
            a0 = state.army[jnp.arange(b), frm]
            d0 = state.army[jnp.arange(b), li]
            a1, _, _ = rules.battle(a0, d0, dice)
            is_battle = (state.phase == 3) & (action != 42)
            o_star = jnp.where(is_battle, a0 - a1, 0).astype(jnp.int32)
            s_az = rules.step(state, action, dice, cfg, u_card)
            new_tree, new_reused = mcts.reroot(res.tree, action, o_star,
                                               cfg)
        else:
            s_az = rules.step_key(state, action, k_dice, cfg)

        # --- opponent path ---
        reset = state.cur_player != prev_player
        u, dice = draw_step_randoms(k_opp, b)
        if az_seats[0] and az_seats[1]:
            s_opp, n_carry = state, sc_carry
            opp_action = jnp.zeros((b,), jnp.int32)
            opp_rec = jnp.zeros((b,), bool)
        else:
            s_opp, n_carry, (opp_action, opp_rec) = _opponent_step(
                opponent, state, sc_carry, reset, u, dice, cfg)

        nstate = tree_select(az_mask, s_az, s_opp)
        nstate = tree_select(live, nstate, state)
        n_carry = tree_select(az_mask | ~live, sc_carry, n_carry)

        # --- record: AZ movers contribute MCTS pi; opponents one-hot
        # actions (reference Player::addTrainingSample, player.cpp:9-17) ---
        opp_pi = jax.nn.one_hot(opp_action, 43, dtype=jnp.float32)
        pi = jnp.where(az_mask[:, None], res.pi, opp_pi)
        if record_all:
            rec_valid = live & (az_mask | opp_rec)
        else:
            rec_valid = live & az_mask
        rec = _record(state, pi, rec_valid)

        if reuse:
            return (nstate, n_carry, mover, key, new_tree, new_reused), rec
        return (nstate, n_carry, mover, key), rec

    init = (state0,
            script_agent.init_carry(b) if carry_in is None else carry_in,
            jnp.full((b,), -1, jnp.int32) if prev_in is None else prev_in,
            key)
    if reuse:
        # fresh (empty) tree to start the chunk; first step falls back to
        # fresh init inside search_with_reuse via reused=False
        efn0 = eval_fn
        tree0 = mcts.init_tree(state0, cfg, efn0)
        init = init + (tree0, jnp.zeros((b,), bool))
        (state, carry, prev, _, _, _), samples = jax.lax.scan(
            body, init, None, length=num_steps)
    else:
        (state, carry, prev, _), samples = jax.lax.scan(body, init, None,
                                                        length=num_steps)
    return ActorOutput(state=state, samples=samples,
                       status=rules.game_status(state, cfg),
                       carry=carry, prev_player=prev)


def run_scripted_episodes(state0: GameState, key: jax.Array, cfg: Config,
                          num_steps: int, kinds: Tuple[int, int],
                          carry_in=None, prev_in=None) -> ActorOutput:
    """Script/random-only games with every micro-decision recorded as a
    one-hot policy sample — the reference's ``train-data`` supervised
    bootstrap data generator (alphazero_trainer.cpp:227-319, where its best
    models actually came from)."""
    b = state0.batch_size

    def agent(kind, state, carry, reset, u, dice):
        if kind == OPP_SCRIPT:
            return script_agent.script_step_recorded(
                state, carry, reset, u, dice, cfg)
        s, info = random_agent.random_step_recorded(state, u, dice, cfg)
        return s, carry, info

    def body(carry, _):
        state, sc_carry, prev_player, key = carry
        key, k = jax.random.split(key)
        u, dice = draw_step_randoms(k, b)
        reset = state.cur_player != prev_player

        s0, c0, (a0, r0) = agent(kinds[0], state, sc_carry, reset, u, dice)
        if kinds[1] == kinds[0]:
            s1, c1, (a1, r1) = s0, c0, (a0, r0)
        else:
            s1, c1, (a1, r1) = agent(kinds[1], state, sc_carry, reset, u,
                                     dice)
        mover0 = state.cur_player == 0
        nstate = tree_select(mover0, s0, s1)
        ncarry = tree_select(mover0, c0, c1)
        action = jnp.where(mover0, a0, a1)
        valid = jnp.where(mover0, r0, r1)

        pi = jax.nn.one_hot(action, 43, dtype=jnp.float32)
        rec = _record(state, pi, valid)
        return (nstate, ncarry, state.cur_player, key), rec

    init = (state0,
            script_agent.init_carry(b) if carry_in is None else carry_in,
            jnp.full((b,), -1, jnp.int32) if prev_in is None else prev_in,
            key)
    (state, carry, prev, _), samples = jax.lax.scan(body, init, None,
                                                    length=num_steps)
    return ActorOutput(state=state, samples=samples,
                       status=rules.game_status(state, cfg),
                       carry=carry, prev_player=prev)


def backfill_values(samples: SampleBatch, status: jax.Array,
                    final_round=None,
                    round_weighted: bool = False) -> SampleBatch:
    """Game-outcome value targets: z = +-1 from each sample's player
    perspective, 0 on draw/unfinished (reference
    ``NNTrainDataStorage::updateValues``, alphazero_nn_data.cpp:51-65).
    With ``round_weighted`` (reference ROUND_WEIGHTED_VALUE), early-game
    samples are discounted by round/final_round."""
    won = status[None, :] == samples.cur_player.astype(jnp.int32)
    decided = (status[None, :] == 0) | (status[None, :] == 1)
    z = jnp.where(decided, jnp.where(won, 1.0, -1.0), 0.0)
    if round_weighted and final_round is not None:
        w = jnp.minimum(samples.round.astype(jnp.float32)
                        / jnp.maximum(final_round[None, :], 1), 1.0)
        z = z * w
    return samples._replace(value=z.astype(jnp.float32))
