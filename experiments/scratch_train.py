"""From-scratch AlphaZero training — the reference's `-m train` curve.

The reference publishes a from-scratch trajectory (azr-benchmark-log.txt:
vs Random reaches 10/10 by iter ~19, vs Script peaks 45/100 at iter 44;
alphazero_trainer.cpp:12-34).  This driver reproduces that experiment at
configurable scale from RANDOM weights: loop { self-play -> trim ->
epochs -> gate (revert on fail, reference train mode) } with a
benchmark vs Random + Script after EVERY iteration so the curve is
recorded whether or not the gate accepts.

Usage:
  python experiments/scratch_train.py --iters 24 --out experiments/scratch_out
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from alphazero_risk_tpu.config import Config  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--out", default="experiments/scratch_out")
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--games", type=int, default=256,
                    help="self-play games per iteration")
    ap.add_argument("--mcts", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dirichlet", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--compare-games", type=int, default=192)
    ap.add_argument("--bench-script", type=int, default=64)
    ap.add_argument("--bench-random", type=int, default=16)
    ap.add_argument("--fast", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--device-replay", action="store_true",
                    help="device-resident replay ring (no host link "
                    "traffic for samples)")
    ap.add_argument("--revert", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="reference train mode reverts to the best "
                    "checkpoint on a failed gate")
    ap.add_argument("--resume", action="store_true",
                    help="continue a previous run in --out: restore "
                    "latest->train weights, best->generation weights, "
                    "reload the replay, continue after the last iteration "
                    "in progress.jsonl (with --device-replay the buffer "
                    "is NOT persisted: a resumed run refills it from "
                    "fresh self-play, generate-only, before training "
                    "restarts)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; the "
                    "JAX_PLATFORMS env var alone is ignored when the "
                    "axon PJRT plugin is installed)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from alphazero_risk_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    os.makedirs(args.out, exist_ok=True)
    os.chdir(args.out)

    cfg = Config(
        blocks=args.blocks,
        learning_rate=args.lr,
        mcts_simulations=args.mcts,
        max_depth=48,
        batch_size=512,
        env_batch_per_device=512,
        train_iteration_games=args.games,
        epochs=args.epochs,
        samples_storage_min_batches=256,
        samples_storage_max_batches=2048,
        compare_games=args.compare_games,
        compare_threshold=0.55,
        benchmark_games_random=args.bench_random,
        benchmark_games_script=args.bench_script,
        max_game_steps=1000,
        fast_infer=args.fast,
        fast_infer_int8=args.int8,
        use_dirichlet_noise=args.dirichlet,
        device_replay=args.device_replay,
    )

    from alphazero_risk_tpu.training.trainer import Trainer  # noqa: E402

    start_iter = 0
    accepted = 0
    if args.resume and os.path.exists("progress.jsonl"):
        lines = []
        with open("progress.jsonl") as f:
            for ln in f:
                if not ln.strip():
                    continue
                try:          # a kill mid-write can tear the final line
                    lines.append(json.loads(ln))
                except json.JSONDecodeError:
                    print(f"resume: skipping torn progress line {ln!r}",
                          flush=True)
        if lines:
            start_iter = lines[-1]["iter"] + 1
            accepted = lines[-1]["accepted_total"]

    t = Trainer(cfg, seed=args.seed + start_iter)
    refill_floor = 0
    if args.resume and start_iter > 0:
        assert t.ckpt.exists("latest"), "--resume: no latest checkpoint"
        t.train_state = t.ckpt.restore("latest", t.train_state)
        best = t.ckpt.restore("best", t.train_state)
        t.gen_params = best.params
        t.gen_batch_stats = best.batch_stats
        found = t.replay.load(f"{cfg.data_dir}/training_samples.npz")
        if not found:
            # With --device-replay no npz is ever saved per iteration, so
            # a supervised restart resumes with an EMPTY buffer; training
            # immediately would fit only fresh noisy self-play (the exact
            # damage mode RESULTS.md documents).  Generate-only until the
            # buffer refills past the storage floor.
            refill_floor = min(cfg.samples_storage_min_batches,
                               cfg.samples_storage_max_batches
                               ) * cfg.batch_size
            print("WARNING: resume found no saved replay buffer "
                  f"({cfg.data_dir}/training_samples.npz); refilling to "
                  f"{refill_floor} samples before training resumes",
                  flush=True)
        print(f"resume: iter {start_iter}, accepted {accepted}, "
              f"replay {len(t.replay)}", flush=True)
    else:
        t.ckpt.save("best", t.train_state)  # random init = first "best"
    t._install_sigint_flush()
    print(f"scratch train: {args.iters} iters, blocks={cfg.blocks} "
          f"mcts={cfg.mcts_simulations} games/iter={args.games}",
          flush=True)

    for it in range(start_iter, args.iters):
        t.iteration = it
        t0 = time.time()
        added = t.generate_selfplay()
        t.replay.trim()
        t_gen = time.time() - t0

        if len(t.replay) < refill_floor:
            rec = {"iter": it, "samples_added": added,
                   "buffer": len(t.replay), "refill_only": True,
                   "accepted_total": accepted, "t_gen": round(t_gen, 1)}
            print(json.dumps(rec), flush=True)
            with open("progress.jsonl", "a") as f:
                f.write(json.dumps(rec) + "\n")
            continue
        refill_floor = 0

        t1 = time.time()
        pi_l, v_l = t.train_epochs()
        t_train = time.time() - t1

        t2 = time.time()
        improved = t.gate(revert_on_fail=args.revert)
        t_gate = time.time() - t2
        if improved:
            accepted += 1
            t.replay.mark_old_games()
        t.ckpt.save("latest", t.train_state)
        if not args.device_replay:
            t.replay.save(f"{cfg.data_dir}/training_samples.npz")

        t3 = time.time()
        bench = t.benchmark()
        rec = {
            "iter": it, "samples_added": added, "buffer": len(t.replay),
            "pi_loss": pi_l, "v_loss": v_l, "improved": improved,
            "accepted_total": accepted,
            "vs_random": bench[0], "vs_script": bench[1],
            "t_gen": round(t_gen, 1), "t_train": round(t_train, 1),
            "t_gate": round(t_gate, 1),
            "t_bench": round(time.time() - t3, 1),
        }
        print(json.dumps(rec), flush=True)
        with open("progress.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")

    t.ckpt.save("final", t.train_state)
    t.replay.save(f"{cfg.data_dir}/training_samples.npz")
    print(f"done: {accepted}/{args.iters} gates accepted", flush=True)


if __name__ == "__main__":
    main()
