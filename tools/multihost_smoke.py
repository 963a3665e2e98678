"""Real multi-process validation of the multi-host runtime.

The reference is single-process (SURVEY.md section 5: no communication
backend).  This framework's scale-out story is `jax.distributed` + one
global DP mesh (parallel/distributed.py); this tool PROVES that path by
launching N actual OS processes that form a JAX distributed world over
local CPU devices (gloo collectives standing in for ICI/DCN) and running:

  * a data-parallel training step — per-process local batches assembled
    into one global array (`host_local_batch`), gradient all-reduce across
    processes inserted by XLA,
  * sharded vectorized env stepping — every process advances only its
    shard of the global game batch,
  * scripted self-play data generation on the sharded batch,
  * cross-process metric aggregation (`allgather_metrics`).

Every process must observe identical losses (the gradient psum is global)
and the summed metrics.  On a TPU pod the identical code runs with
`cpu_collectives=None` and one process per host.

Usage:
  python tools/multihost_smoke.py --nprocs 2 --local-devices 2
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(args) -> None:
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from alphazero_risk_tpu.parallel import distributed as D

    D.initialize(f"127.0.0.1:{args.port}", args.nprocs, args.worker,
                 cpu_collectives="gloo")
    pid = jax.process_index()
    assert jax.process_count() == args.nprocs, (
        f"world size {jax.process_count()} != {args.nprocs} — CPU "
        f"collectives not active?")
    assert jax.local_device_count() == args.local_devices

    from alphazero_risk_tpu.config import Config
    from alphazero_risk_tpu.env import rules
    from alphazero_risk_tpu.env.state import new_game
    from alphazero_risk_tpu.parallel.mesh import replicate
    from alphazero_risk_tpu.training import actor as A
    from alphazero_risk_tpu.training.learner import (create_train_state,
                                                     make_update_fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = Config(blocks=1, filters=32, value_hidden=32, batch_size=16)
    mesh = D.global_mesh()
    bs = NamedSharding(mesh, P("dp"))

    # ---- DP training steps: gradient psum across processes ----
    net, tx, state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = replicate(mesh, state)
    update = jax.jit(make_update_fn(net, tx, cfg),
                     in_shardings=(NamedSharding(mesh, P()), bs),
                     out_shardings=(NamedSharding(mesh, P()),
                                    NamedSharding(mesh, P())))

    def make_batch(local_b):
        # per-process DIFFERENT data: the global loss is only reproducible
        # across processes if the gradient all-reduce actually happened.
        r = np.random.default_rng(100 + pid)
        return {
            "features": r.uniform(size=(
                local_b, 7, 6, cfg.num_features)).astype(np.float32),
            "policy": np.full((local_b, 43), 1.0 / 43, np.float32),
            "value": r.uniform(-1, 1, size=(local_b,)).astype(np.float32),
        }

    losses = []
    for _ in range(3):
        batch = D.host_local_batch(mesh, make_batch, cfg.batch_size)
        state, metrics = update(state, batch)
        losses.append(float(metrics["loss"]))

    # ---- sharded env stepping (the self-play DP axis) ----
    gb = 16 * args.nprocs * args.local_devices

    def make_games(local_b):
        g = new_game(jax.random.PRNGKey(1000 + pid), local_b)
        return jax.tree.map(np.asarray, g)

    games = D.host_local_batch(mesh, make_games, gb)
    n_env_steps = 64

    @jax.jit
    def run_env(st, key):
        def body(carry, _):
            s, k = carry
            k, ka, kd = jax.random.split(k, 3)
            mask = rules.legal_actions(s, cfg)
            action = jax.random.categorical(
                ka, jnp.where(mask, 0.0, -1e9)).astype(jnp.int32)
            s = rules.step_key(s, action, kd, cfg)
            return (s, k), ()

        (st, _), _ = jax.lax.scan(body, (st, key), None,
                                  length=n_env_steps)
        return st

    jax.block_until_ready(run_env(games, jax.random.PRNGKey(2)).army)
    t0 = time.perf_counter()
    games = run_env(games, jax.random.PRNGKey(2))
    jax.block_until_ready(games.army)
    env_dt = time.perf_counter() - t0
    army_sum = int(jax.jit(
        lambda g: g.army.sum(),
        out_shardings=NamedSharding(mesh, P()))(games))

    # ---- scripted data generation on the sharded batch ----
    n_valid = -1
    if not args.trim:
        sp0 = D.host_local_batch(
            mesh, lambda lb: jax.tree.map(
                np.asarray, new_game(jax.random.PRNGKey(7), lb)), gb)
        out = jax.jit(lambda s, k: A.run_scripted_episodes(
            s, k, cfg, 16, (A.OPP_SCRIPT, A.OPP_SCRIPT)))(
            sp0, jax.random.PRNGKey(3))
        n_valid = int(jax.jit(
            lambda v: v.sum(), out_shardings=NamedSharding(mesh, P()))(
            out.samples.valid))

    # ---- cross-process metric aggregation ----
    agg = D.allgather_metrics({"contrib": pid + 1, "one": 1})

    if args.trim:
        # env + DP update + collectives only: bounded wall-clock for the
        # default (un-slow-marked) test and the scaling measurement
        print("MHJSON " + json.dumps({
            "pid": pid,
            "world": jax.process_count(),
            "devices": len(jax.devices()),
            "losses": [round(x, 6) for x in losses],
            "army_sum": army_sum,
            "env_steps_per_s": round(gb * n_env_steps / env_dt),
            "scripted_samples": n_valid,
            "metrics": agg,
        }), flush=True)
        return

    # ---- mini end-to-end Trainer loop across processes ----
    # One train-data loop (scripted generation -> epochs -> gating arena
    # with collective checkpoint saves) + one self-play iteration.  Replay
    # buffers stay host-local; losses and the gate decision are global and
    # must agree on every process.
    import tempfile

    from alphazero_risk_tpu.training.trainer import Trainer

    shared_ckpt = os.path.join(tempfile.gettempdir(),
                               f"mh_ckpt_{args.port}")
    scratch = tempfile.mkdtemp(prefix=f"mh_p{pid}_")
    tcfg = Config(
        blocks=1, filters=16, value_hidden=16,
        mcts_simulations=2, max_depth=6,
        batch_size=32, env_batch_per_device=4,
        data_games_ss=4, data_games_sr=0,
        samples_storage_min_batches=1, samples_storage_max_batches=64,
        compare_games=4, epochs=1,
        max_game_steps=384, actor_chunk_steps=48,
        train_iteration_games=4,
        checkpoint_dir=shared_ckpt,
        data_dir=os.path.join(scratch, "data"),
        log_dir=os.path.join(scratch, "log"))
    t = Trainer(tcfg, seed=5)
    assert t.mesh is not None and t.world == args.nprocs
    t.train_on_data(loops=1, do_benchmark=False)
    pi0, v0 = t.train_epochs(epochs=1)
    t.generate_selfplay(4)
    t.replay.trim()
    pi1, v1 = t.train_epochs(epochs=1)
    improved = t.gate()

    print("MHJSON " + json.dumps({
        "pid": pid,
        "world": jax.process_count(),
        "devices": len(jax.devices()),
        "losses": [round(x, 6) for x in losses],
        "army_sum": army_sum,
        "env_steps_per_s": round(gb * n_env_steps / env_dt),
        "scripted_samples": n_valid,
        "metrics": agg,
        "trainer": {
            "buffer_local": len(t.replay),
            "pi_loss": [round(pi0, 6), round(pi1, 6)],
            "v_loss": [round(v0, 6), round(v1, 6)],
            "gate_improved": bool(improved),
            "ckpt_best": t.ckpt.exists("best") or not improved,
        },
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=2)
    ap.add_argument("--port", type=int, default=12731)
    ap.add_argument("--worker", type=int, default=-1)
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--trim", action="store_true",
                    help="env + DP update + collectives only (skip the "
                    "scripted-gen and Trainer phases): bounded wall-clock")
    ap.add_argument("--scaling", action="store_true",
                    help="after the N-process run, measure a 1-process "
                    "baseline and report weak-scaling efficiency of "
                    "per-host env throughput (constant per-host batch)")
    args = ap.parse_args()

    if args.worker >= 0:
        worker(args)
        return

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    import tempfile

    outdir = tempfile.mkdtemp(prefix="mh_logs_")
    outfiles = [os.path.join(outdir, f"w{i}.log")
                for i in range(args.nprocs)]
    trim_args = ["--trim"] if args.trim else []
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker", str(i), "--nprocs", str(args.nprocs),
             "--local-devices", str(args.local_devices),
             "--port", str(args.port)] + trim_args,
            stdout=open(outfiles[i], "w"), stderr=subprocess.STDOUT,
            env=env, text=True)
        for i in range(args.nprocs)
    ]
    deadline = time.time() + args.timeout
    results, logs = [], []
    try:
        for i, p in enumerate(procs):
            try:
                p.wait(timeout=max(1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                raise SystemExit(
                    f"worker {i} timed out; logs in {outdir}")
            out = open(outfiles[i]).read()
            logs.append(out)
            if p.returncode != 0:
                for line in logs:
                    print(line)
                raise SystemExit(f"worker failed rc={p.returncode}")
            for line in out.splitlines():
                if line.startswith("MHJSON "):
                    results.append(json.loads(line[len("MHJSON "):]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    assert len(results) == args.nprocs, (len(results), logs)
    r0 = results[0]
    expect_sum = args.nprocs * (args.nprocs + 1) // 2
    for r in results:
        assert r["world"] == args.nprocs, r
        assert r["devices"] == args.nprocs * args.local_devices, r
        assert r["losses"] == r0["losses"], (
            "losses diverged across processes — gradient all-reduce "
            "broken", results)
        assert r["army_sum"] == r0["army_sum"], results
        assert r["metrics"]["contrib"] == expect_sum, results
        assert r["metrics"]["one"] == args.nprocs, results
        if not args.trim:
            assert r["trainer"]["pi_loss"] == r0["trainer"]["pi_loss"], (
                "learner losses diverged across processes", results)
            assert r["trainer"]["v_loss"] == r0["trainer"]["v_loss"], \
                results
            assert (r["trainer"]["gate_improved"]
                    == r0["trainer"]["gate_improved"]), results
            assert r["trainer"]["buffer_local"] > 0, results
            assert r["trainer"]["ckpt_best"], results

    summary = {
        "ok": True,
        "nprocs": args.nprocs,
        "devices": r0["devices"],
        "losses": r0["losses"],
        "env_steps_per_s": r0["env_steps_per_s"],
        "scripted_samples": r0["scripted_samples"],
    }
    if not args.trim:
        summary["trainer"] = r0["trainer"]

    if args.scaling and args.nprocs > 1:
        # Weak-scaling baseline: one process, same per-host batch
        # (gb scales with nprocs in the worker).  CPU-proxy methodology:
        # all worker processes share this host's physical cores, so the
        # raw efficiency is dominated by core oversubscription, NOT by
        # collective cost — on real TPU hosts each process owns its
        # chips and the gradient all-reduce is the only cross-host step.
        # The >=80% north star (BASELINE.md) therefore needs real
        # multi-host hardware; this field proves the measurement path
        # and records the proxy number honestly.
        # probe a genuinely free port for the baseline world: args.port+1
        # was never reserved and can collide on a loaded CI host
        # (advisor round 4)
        import socket
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            base_port = s.getsockname()[1]
        base = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--nprocs", "1", "--local-devices",
             str(args.local_devices), "--port", str(base_port),
             "--trim", "--timeout", str(args.timeout)],
            capture_output=True, text=True, env=dict(os.environ),
            timeout=args.timeout)
        assert base.returncode == 0, base.stdout + base.stderr
        base_sum = json.loads(base.stdout.strip().splitlines()[-1])
        per_host_1 = base_sum["env_steps_per_s"]
        per_host_n = r0["env_steps_per_s"] / args.nprocs
        import os as _os
        cores = len(_os.sched_getaffinity(0))
        summary["scaling"] = {
            "mode": "weak (constant per-host batch)",
            "per_host_env_steps_per_s_1proc": per_host_1,
            "per_host_env_steps_per_s_nproc": round(per_host_n),
            "efficiency": round(per_host_n / per_host_1, 3),
            "cpu_proxy_note": (
                f"{args.nprocs} procs x {args.local_devices} virtual "
                f"devices share {cores} physical cores; raw efficiency "
                "reflects core oversubscription, not collective cost — "
                "the >=80% ICI north star requires real per-host chips"),
        }

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
