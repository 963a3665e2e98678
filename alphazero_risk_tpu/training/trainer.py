"""AlphaZero training orchestration.

Replaces ``AlphaZeroTrainer`` (alphazero_trainer.{h,cpp}) with a single-host
actor-learner loop over batched on-device self-play:

  train:        loop { self-play -> trim -> N epochs -> gating arena ->
                accept (save best/iter, promote) / revert -> benchmark }
  train-data:   supervised bootstrap from Script-vs-Script +
                Script-vs-Random games (how the reference's best models
                were produced)

Deviation from the reference noted: on a rejected gate the reference
reloads the (possibly stale) 'latest' file (alphazero_trainer.cpp:170-175);
here revert restores the last *accepted* model, which is the evident
intent of TRAINING_REVERT_MODEL.
"""

from __future__ import annotations

import math
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, STATUS_NOT_ENDED
from ..env.state import new_game
from ..agents.driver import mirrored_initial_states
from ..models.fast_infer import (fold_for_inference, make_fast_eval_fn,
                                 make_fast_paired_eval_fn)
from ..utils.logging import Logs
from . import actor as A
from .checkpoints import CheckpointManager
from .learner import create_train_state, make_epoch_fn
from .replay import ReplayBuffer


def sequential_verdict(wins: int, losses: int, threshold: float,
                       z: float = 2.24, min_decided: int = 96):
    """Early verdict for a win-share gate: ``True``/``False`` once the
    accept/reject decision is statistically settled, else ``None``.

    Normal approximation to the Beta(w+1, l+1) posterior over the win
    share p, against H: p >= threshold.  Dependency-free (no scipy) and
    conservative: a high one-sided z both ways plus a decided-games floor
    guard against early noise and against the mild length-vs-outcome
    correlation inherent in stopping a lockstep arena mid-flight (fast
    winners are tallied before slow ones).
    """
    n = wins + losses
    if n < min_decided:
        return None
    mean = (wins + 1) / (n + 2)
    sd = math.sqrt(mean * (1.0 - mean) / (n + 3))
    stat = (mean - threshold) / max(sd, 1e-9)
    if stat > z:
        return True
    if stat < -z:
        return False
    return None


class Trainer:
    def __init__(self, cfg: Config, seed: int = 0,
                 log_dir: Optional[str] = None, use_mesh: bool = False):
        self.cfg = cfg
        self.key = jax.random.PRNGKey(seed)
        # Data-parallel mesh: params replicated, game/sample batches sharded
        # over 'dp' (replaces the reference's per-GPU session replication +
        # checkpoint-file weight bus, alphazero_gpu_cluster.cpp:105-231).
        # In a multi-process world (jax.distributed) the mesh is mandatory:
        # games shard over all hosts' devices, replay stays host-local, and
        # tallies/learner batches cross hosts via collectives.
        self.world = jax.process_count()
        self.mesh = None
        if (use_mesh or self.world > 1) and len(jax.devices()) > 1:
            from ..parallel.mesh import make_mesh
            self.mesh = make_mesh()
        self._mh_step = None          # multihost learner step (lazy)
        self.net, self.tx, self.train_state = create_train_state(
            cfg, self._next_key())
        if self.mesh is not None:
            from ..parallel.mesh import replicate
            self.train_state = replicate(self.mesh, self.train_state)
        # generate/actor model = last accepted weights
        # (reference "az_generate" group, alphazero_risk.cpp:49-62)
        self.gen_params = self.train_state.params
        self.gen_batch_stats = self.train_state.batch_stats
        if cfg.device_replay:
            assert self.world == 1, (
                "device_replay is single-process only: the multi-host "
                "path shards episode batches and keeps replay host-local")
            from .device_replay import DeviceReplay
            self.replay = DeviceReplay(cfg)
        else:
            self.replay = ReplayBuffer(cfg)
        self.logs = Logs(log_dir or cfg.log_dir)
        self.ckpt = CheckpointManager(cfg)
        self.iteration = 0

        self._eval = A.make_eval_fn(self.net, cfg)
        self._paired = A.make_paired_eval_fn(self.net, cfg)
        # Exploration noise belongs to self-play GENERATION only; arenas
        # and benchmarks search without root Dirichlet (the reference's
        # constant blend, retained inside PUCT select, applies everywhere
        # as in alphazero_mcts.cpp:78-86).
        self._ecfg = cfg.replace(use_dirichlet_noise=False)
        self._epoch = jax.jit(
            make_epoch_fn(self.net, self.tx, cfg,
                          prepare_batch=self._prepare_batch))
        if cfg.device_replay:
            from .learner import make_ring_epoch_fn
            self._ring_epoch = jax.jit(
                make_ring_epoch_fn(self.net, self.tx, cfg,
                                   prepare_batch=self._prepare_batch))
        # Episodes run in bounded chunks: one device dispatch advances every
        # game `actor_chunk_steps` micro-decisions, the host checks for
        # all-done between chunks (early exit + keeps single executions
        # short for the runtime).
        chunk = cfg.actor_chunk_steps
        self._selfplay_chunk = jax.jit(
            lambda p, bs, s0, c, pr, k: self._run_selfplay(
                p, bs, s0, c, pr, k, chunk))
        self._arena_chunk = jax.jit(
            lambda pa, bsa, pb, bsb, s0, c, pr, k: self._run_arena(
                pa, bsa, pb, bsb, s0, c, pr, k, chunk))
        self._versus_chunk = jax.jit(
            lambda p, bs, s0, c, pr, k, opp: self._run_versus(
                p, bs, s0, c, pr, k, opp, chunk, True), static_argnums=6)
        # benchmark/eval variant: no sample records, opponent fast-forward
        self._versus_fast_chunk = jax.jit(
            lambda p, bs, s0, c, pr, k, opp: self._run_versus(
                p, bs, s0, c, pr, k, opp, chunk, False), static_argnums=6)
        self._scripted_chunk = jax.jit(
            lambda s0, c, pr, k, kinds: A.run_scripted_episodes(
                s0, k, cfg, chunk, kinds, carry_in=c, prev_in=pr),
            static_argnums=4)

        # Fast inference path: actors/arenas only ever run frozen weights,
        # so BatchNorm is folded once per promotion and the trunk runs
        # bf16 or int8 on XLA convs (models/fast_infer.py).  The learner
        # always trains the plain Flax net.
        if cfg.fast_infer:
            fast = make_fast_eval_fn(cfg, int8=cfg.fast_infer_int8)
            fastp = make_fast_paired_eval_fn(cfg, int8=cfg.fast_infer_int8)
            self._selfplay_fast_chunk = jax.jit(
                lambda f, s0, c, pr, k: A.run_episodes(
                    lambda s, m: fast(f, s, m), s0, k, cfg, chunk,
                    sample_moves=True, carry_in=c, prev_in=pr))
            self._arena_fast_chunk = jax.jit(
                lambda fa, fb, s0, c, pr, k: A.run_episodes(
                    lambda s, m, use_a: fastp(fa, fb, use_a, s, m),
                    s0, k, self._ecfg, chunk, sample_moves=False,
                    paired_eval=True, carry_in=c, prev_in=pr))
            self._versus_fold_chunk = jax.jit(
                lambda f, s0, c, pr, k, opp, record: A.run_episodes(
                    lambda s, m: fast(f, s, m), s0, k, self._ecfg, chunk,
                    opponent=opp, az_seats=(True, False),
                    sample_moves=False, record_all=record,
                    carry_in=c, prev_in=pr), static_argnums=(5, 6))

    # ------------------------------------------------------------------
    # Actor weights: last accepted params.  Setting either component drops
    # the cached BN-folded inference pytree (re-folded lazily on first use).
    @property
    def gen_params(self):
        return self._gen_params

    @gen_params.setter
    def gen_params(self, v):
        self._gen_params = v
        self._folded_gen = None

    @property
    def gen_batch_stats(self):
        return self._gen_batch_stats

    @gen_batch_stats.setter
    def gen_batch_stats(self, v):
        self._gen_batch_stats = v
        self._folded_gen = None

    def _fold(self, params, bstats):
        calib = None
        if self.cfg.fast_infer_int8:
            from ..models.fast_infer import default_calib_feats
            calib = default_calib_feats(self.cfg, jax.random.PRNGKey(17))
        return fold_for_inference(
            {"params": params, "batch_stats": bstats}, self.cfg,
            int8=self.cfg.fast_infer_int8, calib_feats=calib)

    def _gen_folded(self):
        if self._folded_gen is None:
            self._folded_gen = self._fold(self.gen_params,
                                          self.gen_batch_stats)
        return self._folded_gen

    def _folded_of(self, params, bstats):
        """Folded pytree for arbitrary weights, reusing the actor cache when
        the weights ARE the actor weights."""
        if params is self._gen_params and bstats is self._gen_batch_stats:
            return self._gen_folded()
        return self._fold(params, bstats)

    # ---- chunk-callable builders: one branch point between the Flax and
    # the folded fast-inference paths per episode kind ----
    def _selfplay_call(self):
        if self.cfg.fast_infer:
            f = self._gen_folded()
            return lambda st, c, pr, k: self._selfplay_fast_chunk(
                f, st, c, pr, k)
        return lambda st, c, pr, k: self._selfplay_chunk(
            self.gen_params, self.gen_batch_stats, st, c, pr, k)

    def _arena_call(self, pa, bsa, pb, bsb):
        if self.cfg.fast_infer:
            fa = self._folded_of(pa, bsa)
            fb = self._folded_of(pb, bsb)
            return lambda st, c, pr, k: self._arena_fast_chunk(
                fa, fb, st, c, pr, k)
        return lambda st, c, pr, k: self._arena_chunk(
            pa, bsa, pb, bsb, st, c, pr, k)

    def _versus_call(self, params, bstats, opp, record):
        if self.cfg.fast_infer:
            f = self._folded_of(params, bstats)
            return lambda st, c, pr, k: self._versus_fold_chunk(
                f, st, c, pr, k, opp, record)
        chunk = self._versus_chunk if record else self._versus_fast_chunk
        return lambda st, c, pr, k: chunk(params, bstats, st, c, pr, k, opp)

    # ------------------------------------------------------------------
    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _game_unit(self) -> int:
        """Games run in mirrored pairs and shard over every device of the
        active mesh, so counts are multiples of lcm(2, n_devices)."""
        unit = 2
        if self.mesh is not None:
            n = int(self.mesh.devices.size)
            unit = n * 2 // math.gcd(n, 2)
        return unit

    def _round_games(self, games: int) -> int:
        """Normalize a requested game count ONCE at entry so reported
        tallies match the number actually played (waves never re-pad)."""
        unit = self._game_unit()
        return -(-games // unit) * unit

    def _wave_batch(self, remaining: int) -> int:
        unit = self._game_unit()
        cap = max(self.cfg.env_batch_per_device // unit, 1) * unit
        return min(cap, remaining)

    def _replay_path(self) -> str:
        """Replay persistence path; per-process suffix in a multi-host run
        (each host's buffer holds only its own games)."""
        base = f"{self.cfg.data_dir}/training_samples"
        if self.world > 1:
            return f"{base}.p{jax.process_index()}.npz"
        return f"{base}.npz"

    def _install_sigint_flush(self):
        """Flush the replay buffer to disk on Ctrl-C (reference SIGINT
        handler, alphazero_nn_data.cpp:140-152)."""
        import signal

        def handler(signum, frame):
            print("\n=> SIGINT: saving training samples.")
            self.replay.save(self._replay_path())
            raise KeyboardInterrupt

        signal.signal(signal.SIGINT, handler)

    def _initial_states(self, batch):
        """Fresh deals, mirrored in pairs when cfg.mirror_games (reference
        game.cpp:170-191), placed on the dp mesh when one is active."""
        if self.cfg.mirror_games:
            state0 = mirrored_initial_states(self._next_key(), batch)
        else:
            state0 = new_game(self._next_key(), batch)
            alt = jnp.arange(batch, dtype=jnp.int32) % 2
            state0 = state0.replace(cur_player=alt)
        if self.mesh is not None:
            from ..parallel.mesh import shard_batch
            state0 = shard_batch(self.mesh, state0)
        return state0

    def _prepare_batch(self, data, idx):
        if idx is None:
            sub = data
        else:
            sub = jax.tree.map(lambda x: x[idx], data)
        sb = A.SampleBatch(valid=None, **{k: sub[k] for k in sub})
        return {
            "features": A.features_of_samples(sb, self.cfg),
            # policy travels float16 (actor._record / replay.FIELDS);
            # the CE loss runs in float32
            "policy": sub["policy"].astype(jnp.float32),
            "value": sub["value"],
        }

    # ---- jitted episode wrappers (one chunk per call) ----
    def _run_selfplay(self, params, bstats, state0, carry, prev, key,
                      num_steps):
        efn = lambda s, m: self._eval(params, bstats, s, m)  # noqa: E731
        return A.run_episodes(efn, state0, key, self.cfg, num_steps,
                              sample_moves=True, carry_in=carry,
                              prev_in=prev)

    def _run_arena(self, pa, bsa, pb, bsb, state0, carry, prev, key,
                   num_steps):
        efn = lambda s, m, use_a: self._paired(  # noqa: E731
            pa, bsa, pb, bsb, use_a, s, m)
        return A.run_episodes(efn, state0, key, self._ecfg, num_steps,
                              sample_moves=False, paired_eval=True,
                              carry_in=carry, prev_in=prev)

    def _run_versus(self, params, bstats, state0, carry, prev, key,
                    opponent, num_steps, record):
        efn = lambda s, m: self._eval(params, bstats, s, m)  # noqa: E731
        return A.run_episodes(efn, state0, key, self._ecfg, num_steps,
                              opponent=opponent, az_seats=(True, False),
                              sample_moves=False, record_all=record,
                              carry_in=carry, prev_in=prev)

    def _local(self, tree):
        """Host-local numpy rows of (possibly multi-process) global arrays."""
        from ..parallel.distributed import local_shards

        return local_shards(tree)

    def _episode_loop(self, chunk_call, state0,
                      early_stop=None) -> A.ActorOutput:
        """Drive chunked episodes to completion (or the step cap).

        Multi-process: every chunk is one global SPMD dispatch; each host
        then extracts only ITS games' samples/status (``local_shards``) and
        the all-done check is agreed via allgather, so hosts stay in
        lockstep on the number of dispatches.  The returned ``samples`` and
        ``status`` are host-local; ``state`` stays global.

        ``early_stop(status)``, when given, is called with the host-local
        status rows after every chunk; returning True abandons the still-
        running games (they stay STATUS_NOT_ENDED and are excluded from
        tallies).  Any world agreement (e.g. a tally allgather) is the
        callback's job — it must return the same answer on every host.
        """
        from ..agents.script_agent import init_carry
        from ..parallel.distributed import allgather_metrics

        b = state0.batch_size
        carry = init_carry(b)
        prev = jnp.full((b,), -1, jnp.int32)
        # device_replay: chunks stay on device (the ring ingests them
        # directly) — only the [B] status scalar vector comes down per
        # chunk for the all-done check
        on_device = self.cfg.device_replay
        chunks = []
        status = None
        state = state0
        n_chunks = max(self.cfg.max_game_steps
                       // self.cfg.actor_chunk_steps, 1)
        for _ in range(n_chunks):
            out = chunk_call(state, carry, prev, self._next_key())
            chunks.append(out.samples if on_device
                          else self._local(out.samples))
            state, carry, prev = out.state, out.carry, out.prev_player
            status = self._local(out.status)
            live = int((status == STATUS_NOT_ENDED).sum())
            if self.world > 1:
                live = int(allgather_metrics({"live": live})["live"])
            if live == 0:
                break
            if early_stop is not None and early_stop(status):
                break
        concat = jnp.concatenate if on_device else np.concatenate
        samples = jax.tree.map(
            lambda *xs: concat(xs, axis=0), *chunks)
        return A.ActorOutput(state=state, samples=samples,
                             status=status)

    # ------------------------------------------------------------------
    def generate_selfplay(self, games: Optional[int] = None) -> int:
        """One generation phase (reference generateTrainData,
        alphazero_trainer.cpp:36-78)."""
        games = self._round_games(games or self.cfg.train_iteration_games)
        added = 0
        done_games = 0
        while done_games < games:
            b = self._wave_batch(games - done_games)
            state0 = self._initial_states(b)
            out = self._episode_loop(self._selfplay_call(), state0)
            added += self.replay.extend_from_actor(
                out.samples, out.status,
                final_round=self._local(out.state.round))
            done_games += b
        self.logs.event("selfplay", games=done_games, samples=added,
                        buffer=len(self.replay))
        return added

    def train_epochs(self, epochs: Optional[int] = None) -> Tuple[float,
                                                                  float]:
        """N shuffled epochs over the buffer (reference train,
        alphazero_nn.cpp:351-410)."""
        epochs = epochs or self.cfg.epochs
        if self.world > 1:
            return self._train_epochs_multihost(epochs)
        # dispatch on the actual buffer type, not the config flag:
        # train_on_data and experiment drivers may swap in a fresh host
        # buffer on a trainer whose self-play path uses the device ring
        from .device_replay import DeviceReplay
        if isinstance(self.replay, DeviceReplay):
            return self._train_epochs_ring(epochs)
        arrays = self.replay.sample_arrays()
        n = next(iter(arrays.values())).shape[0]
        cap = self.cfg.train_upload_max_samples
        if cap and n > cap:
            return self._train_epochs_chunked(arrays, n, cap, epochs)
        data = {k: jnp.asarray(v) for k, v in arrays.items()}
        pi_loss = v_loss = float("nan")
        for e in range(epochs):
            self.train_state, metrics = self._epoch(
                self.train_state, data, self._next_key())
            pi_loss = float(metrics["pi_loss"])
            v_loss = float(metrics["v_loss"])
            self.logs.log_nn_epoch(self.iteration, e, pi_loss, v_loss)
        return pi_loss, v_loss

    def _train_epochs_chunked(self, arrays, n: int, cap: int, epochs: int
                              ) -> Tuple[float, float]:
        """Epochs over a buffer too large for one device-resident slice:
        fixed-size chunks (one compile), each shuffled and scanned by the
        same jitted ``_epoch``; the tail chunk wraps around to keep the
        static shape.  Block-shuffled SGD — within-chunk order is fully
        random, chunk order is buffer order."""
        import math

        k = math.ceil(n / cap)
        chunk = min(cap, n)
        pi_loss = v_loss = float("nan")
        for e in range(epochs):
            pi_sum = v_sum = 0.0
            for c in range(k):
                lo = c * chunk
                idx = np.arange(lo, lo + chunk) % n    # tail wraps
                data = {key: jnp.asarray(v[idx])
                        for key, v in arrays.items()}
                self.train_state, metrics = self._epoch(
                    self.train_state, data, self._next_key())
                pi_sum += float(metrics["pi_loss"])
                v_sum += float(metrics["v_loss"])
                del data
            pi_loss, v_loss = pi_sum / k, v_sum / k
            self.logs.log_nn_epoch(self.iteration, e, pi_loss, v_loss)
        return pi_loss, v_loss

    def _train_epochs_ring(self, epochs: int) -> Tuple[float, float]:
        """Epochs over the device-resident ring: no buffer upload at all
        (the samples were ingested on device by _episode_loop)."""
        data, start, size = self.replay.epoch_view()
        pi_loss = v_loss = float("nan")
        for e in range(epochs):
            self.train_state, metrics = self._ring_epoch(
                self.train_state, data, start, size, self._next_key())
            pi_loss = float(metrics["pi_loss"])
            v_loss = float(metrics["v_loss"])
            self.logs.log_nn_epoch(self.iteration, e, pi_loss, v_loss)
        return pi_loss, v_loss

    def _train_epochs_multihost(self, epochs: int) -> Tuple[float, float]:
        """Multi-process epochs: each host shuffles ITS local replay shard
        and contributes batch_size/world samples per step; minibatches are
        assembled into one global dp-sharded array and the gradient
        all-reduce rides the XLA collectives — the distributed analog of
        the reference's single-GPU ``train`` (alphazero_nn.cpp:351-410),
        which had no gradient parallelism at all (SURVEY.md section 2)."""
        from ..parallel import distributed as D
        from ..parallel.mesh import batch_sharding, replicated
        from .learner import make_update_fn

        cfg = self.cfg
        assert cfg.batch_size % self.world == 0, (cfg.batch_size, self.world)
        bs_local = cfg.batch_size // self.world
        # Steps from the global MIN buffer length (hosts must dispatch in
        # lockstep), but each host shuffles its FULL local buffer and
        # truncates — otherwise hosts with more samples than the min would
        # only ever train on their oldest rows (replay appends at the end).
        n_min = D.allgather_min(len(self.replay))
        steps = n_min // bs_local
        if steps == 0:
            return float("nan"), float("nan")

        if self._mh_step is None:
            update = make_update_fn(self.net, self.tx, cfg)

            def step_fn(state, mb):
                # idx=None: the minibatch is already assembled and
                # dp-sharded; an identity gather here would force GSPMD to
                # reshard the whole batch every step.
                batch = self._prepare_batch(mb, None)
                return update(state, batch)

            self._mh_step = jax.jit(
                step_fn,
                in_shardings=(replicated(self.mesh),
                              batch_sharding(self.mesh)),
                out_shardings=(replicated(self.mesh),
                               replicated(self.mesh)))

        data = self.replay.sample_arrays()
        rng = np.random.default_rng(
            int(jax.random.randint(self._next_key(), (), 0,
                                   np.iinfo(np.int32).max))
            + jax.process_index())
        pi_loss = v_loss = float("nan")
        for e in range(epochs):
            perm = rng.permutation(len(self.replay))[:steps * bs_local]
            pi_sum = v_sum = 0.0
            for s in range(steps):
                idx = perm[s * bs_local:(s + 1) * bs_local]
                mb = D.host_local_batch(
                    self.mesh, lambda lb: {k: v[idx] for k, v in
                                           data.items()}, cfg.batch_size)
                self.train_state, metrics = self._mh_step(
                    self.train_state, mb)
                pi_sum += float(metrics["pi_loss"])
                v_sum += float(metrics["v_loss"])
            pi_loss, v_loss = pi_sum / steps, v_sum / steps
            self.logs.log_nn_epoch(self.iteration, e, pi_loss, v_loss)
        return pi_loss, v_loss

    def gate(self, revert_on_fail: Optional[bool] = None) -> bool:
        """Arena new-vs-old; accept at >= compare_threshold win share
        (reference updateIfImprovement, alphazero_trainer.cpp:134-198).

        ``revert_on_fail=False`` matches train-data mode
        (alphazero_trainer.cpp:293-317), where a failed gate keeps the
        training weights and only withholds promotion."""
        cfg = self.cfg
        if revert_on_fail is None:
            revert_on_fail = cfg.training_revert_model
        # (multi-process: every host sees the same global tallies, so the
        # accept/revert decision is identical everywhere)
        if cfg.compare_games <= 0:
            self._accept()
            return True
        games = self._round_games(cfg.compare_games)
        arena = self._arena_call(
            self.train_state.params, self.train_state.batch_stats,
            self.gen_params, self.gen_batch_stats)

        def _merge(base, part):
            return part if base is None else {
                k: base[k] + part[k] for k in part}

        def _verdict(t):
            return sequential_verdict(
                t["p0_wins"], t["p1_wins"], cfg.compare_threshold,
                z=cfg.arena_early_stop_z,
                min_decided=cfg.arena_early_stop_min_games)

        tally = None
        done = 0
        decided = None
        while done < games and decided is None:
            b = self._wave_batch(games - done)
            state0 = self._initial_states(b)
            started = self._local(state0.cur_player)
            check = None
            if cfg.arena_early_stop:
                # per-chunk sequential test on finished games; the tally
                # allgather inside _global_tally keeps hosts agreed
                def check(status, _started=started):
                    t = _merge(tally,
                               self._global_tally(status, _started))
                    return _verdict(t) is not None
            out = self._episode_loop(arena, state0, early_stop=check)
            if cfg.include_compare_games_train_samples:
                self.replay.extend_from_actor(
                    out.samples, out.status,
                    final_round=self._local(out.state.round))
            tally = _merge(tally, self._global_tally(
                np.asarray(out.status), started))
            done += b
            if cfg.arena_early_stop:
                decided = _verdict(tally)
        new_wins = tally["p0_wins"]
        old_wins = tally["p1_wins"]
        draws = tally["draws"]
        self.logs.log_improvement(
            self.iteration, draws, new_wins, tally["p0_win_started"],
            old_wins, tally["p1_win_started"])
        improved = (decided if decided is not None else
                    new_wins >= (new_wins + old_wins)
                    * cfg.compare_threshold)
        if cfg.arena_early_stop:
            # 'unfinished' = games abandoned mid-wave by the early stop;
            # if win probability correlates with game length the verdict
            # is biased toward fast winners — logged so the effect can be
            # monitored (advisor round 4)
            self.logs.event("gate_early_stop", decided=decided,
                            new_wins=new_wins, old_wins=old_wins,
                            scheduled=games,
                            unfinished=tally["unfinished"])
        if improved:
            self._accept()
        elif revert_on_fail:
            self._revert()
        return improved

    def _global_tally(self, status: np.ndarray, started: np.ndarray
                      ) -> dict:
        """Win/draw tallies from host-local status rows, summed across the
        world (single-process: plain local counts)."""
        from ..parallel.distributed import allgather_metrics

        t = {
            "games": int(status.shape[0]),
            "p0_wins": int((status == 0).sum()),
            "p1_wins": int((status == 1).sum()),
            "draws": int((status == -2).sum()),
            "unfinished": int((status == STATUS_NOT_ENDED).sum()),
            "p0_win_started": int(((status == 0) & (started == 0)).sum()),
            "p1_win_started": int(((status == 1) & (started == 1)).sum()),
        }
        if self.world > 1:
            t = {k: int(v) for k, v in allgather_metrics(t).items()}
        return t

    def _accept(self):
        self.gen_params = self.train_state.params
        self.gen_batch_stats = self.train_state.batch_stats
        self.ckpt.save("best", self.train_state)
        # NOT 'latest': every driver loop (train(), bootstrap_run,
        # selfplay_finetune, scratch_train) writes latest + meta
        # back-to-back at its loop END, and that pair is the resume
        # anchor.  A mid-loop 'latest' here could be killed between this
        # save and the loop-end meta write, resuming loop N with
        # post-accept weights under the old meta key — the
        # double-trained-loop hazard (advisor rounds 3-4).
        self.ckpt.save(f"iter-{self.iteration}", self.train_state)

    def _revert(self):
        self.train_state = self.train_state.replace(
            params=self.gen_params, batch_stats=self.gen_batch_stats)

    def benchmark(self):
        """vs Random and vs Script (reference benchmark,
        alphazero_trainer.cpp:121-132)."""
        cfg = self.cfg
        results = []
        for opp, games in ((A.OPP_RANDOM, cfg.benchmark_games_random),
                           (A.OPP_SCRIPT, cfg.benchmark_games_script)):
            results.append(self.play(opp, games))
        self.logs.log_benchmark(self.iteration, results[0], results[1])
        return results

    # ------------------------------------------------------------------
    def _save_meta(self):
        self.ckpt.save_meta({
            "iteration": self.iteration + 1,
            "key": np.asarray(self.key).tolist(),
        })

    def _restore_meta(self) -> int:
        """Restore {iteration, rng key}; returns the start iteration.
        Without this a restart would overwrite iter-N checkpoints from 0
        and reseed identically, replaying the same game deals."""
        meta = self.ckpt.load_meta()
        if not meta:
            return 0
        self.key = jnp.asarray(meta["key"], jnp.uint32)
        return int(meta["iteration"])

    def train(self, iterations: Optional[int] = None,
              resume: bool = True, do_benchmark: bool = True):
        """Full AlphaZero loop (reference train, alphazero_trainer.cpp:12-34).
        ``iterations`` = number of iterations to run THIS call; on resume
        the iteration counter continues from the persisted value."""
        cfg = self.cfg
        start = 0
        if resume:
            self.train_state = self.ckpt.restore("latest", self.train_state)
            # actor weights = last *accepted* model
            if self.ckpt.exists("best"):
                best = self.ckpt.restore("best", self.train_state)
                self.gen_params = best.params
                self.gen_batch_stats = best.batch_stats
            else:
                self.gen_params = self.train_state.params
                self.gen_batch_stats = self.train_state.batch_stats
            self.replay.load(self._replay_path())
            start = self._restore_meta()
        self._install_sigint_flush()
        n = iterations or cfg.train_iterations
        for self.iteration in range(start, start + n):
            t0 = time.time()
            self.generate_selfplay()
            self.replay.trim()
            self.train_epochs()
            if self.gate():
                self.replay.mark_old_games()
                if do_benchmark:
                    self.benchmark()
            self.logs.event("iteration", n=self.iteration,
                            seconds=time.time() - t0)
            self.ckpt.save("latest", self.train_state)
            self._save_meta()
        self.replay.save(self._replay_path())

    def train_on_script(self, iterations: Optional[int] = None):
        """Generate data by playing AZ vs ScriptPlayer instead of self-play
        (reference trainOnScript, alphazero_trainer.cpp:200-225)."""
        cfg = self.cfg
        for self.iteration in range(iterations or cfg.train_iterations):
            games = self._round_games(cfg.train_iteration_games * 2)
            done = 0
            while done < games:
                b = self._wave_batch(games - done)
                state0 = self._initial_states(b)
                out = self._episode_loop(
                    self._versus_call(self.train_state.params,
                                      self.train_state.batch_stats,
                                      A.OPP_SCRIPT, record=True), state0)
                self.replay.extend_from_actor(
                    out.samples, out.status,
                    final_round=self._local(out.state.round))
                done += b
            self.replay.trim()
            self.train_epochs()
            if self.gate():
                self.replay.mark_old_games()
            # loop-end resume anchor (latest + meta written together;
            # _accept deliberately no longer saves 'latest' mid-loop)
            self.ckpt.save("latest", self.train_state)
            self._save_meta()
        self.replay.save(self._replay_path())

    def play(self, opponent: int, games: int, use_best: bool = False):
        """Evaluation matches AZ vs script/random (reference executePlay,
        alphazero_risk.cpp:4-47).  Returns a results summary."""
        games = self._round_games(games)
        totals = None
        done = 0
        while done < games:
            b = self._wave_batch(games - done)
            state0 = self._initial_states(b)
            out = self._episode_loop(
                self._versus_call(self.gen_params, self.gen_batch_stats,
                                  opponent, record=False), state0)
            part = self._global_tally(np.asarray(out.status),
                                      self._local(state0.cur_player))
            totals = part if totals is None else {
                k: totals[k] + part[k] for k in part}
            done += b
        return totals

    def play_az_vs_az(self, other_role: str, games: int):
        """AZ-vs-AZ matches between the loaded model (seat 0) and another
        checkpoint role (seat 1), argmax moves, mirrored pairs (reference
        executePlay with -p1 az -p2 az, alphazero_risk.cpp:4-47)."""
        other = self.ckpt.restore(other_role, self.train_state)
        games = self._round_games(games)
        totals = None
        done = 0
        while done < games:
            b = self._wave_batch(games - done)
            state0 = self._initial_states(b)
            out = self._episode_loop(
                self._arena_call(
                    self.train_state.params, self.train_state.batch_stats,
                    other.params, other.batch_stats),
                state0)
            part = self._global_tally(np.asarray(out.status),
                                      self._local(state0.cur_player))
            totals = part if totals is None else {
                k: totals[k] + part[k] for k in part}
            done += b
        return totals

    def train_on_data(self, loops: Optional[int] = None,
                      do_benchmark: bool = True):
        """Supervised bootstrap from heuristic games (reference
        trainOnGeneratedData, alphazero_trainer.cpp:227-319)."""
        cfg = self.cfg
        for self.iteration in range(loops or cfg.data_train_loops):
            if cfg.device_replay:
                from .device_replay import DeviceReplay
                fresh = DeviceReplay(cfg)
            else:
                fresh = ReplayBuffer(cfg)
            for kinds, games in (((A.OPP_SCRIPT, A.OPP_SCRIPT),
                                  cfg.data_games_ss),
                                 ((A.OPP_SCRIPT, A.OPP_RANDOM),
                                  cfg.data_games_sr)):
                games = self._round_games(games)
                done = 0
                while done < games:
                    b = self._wave_batch(games - done)
                    state0 = self._initial_states(b)
                    out = self._episode_loop(
                        lambda st, c, pr, k: self._scripted_chunk(
                            st, c, pr, k, kinds), state0)
                    fresh.extend_from_actor(
                        out.samples, out.status,
                        final_round=self._local(out.state.round))
                    done += b
            self.replay = fresh
            self.train_epochs(epochs=3)
            if self.gate(revert_on_fail=False) and do_benchmark:
                self.benchmark()
            self.ckpt.save("temp", self.train_state)
            # loop-end resume anchor (see train()/_accept)
            self.ckpt.save("latest", self.train_state)
            self._save_meta()
