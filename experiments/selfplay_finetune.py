"""Self-play fine-tuning from the supervised-bootstrap checkpoint.

The reference's best models came from the `train-data` bootstrap
(alphazero_trainer.cpp:227-319); its from-scratch self-play (`-m train`)
plateaued below script parity (BASELINE.md).  The natural combination —
bootstrap, then improve by gated self-play (`train` mode,
alphazero_trainer.cpp:12-34) — is what this experiment runs: restore the
bootstrap weights, loop { self-play games -> trim -> epochs -> gating
arena (revert on fail) -> periodic benchmark }.

Usage:
  python experiments/selfplay_finetune.py --iters 12 \
      --init-ckpt artifacts --init-role ckpt-bootstrap-5block-r1
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
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--out", default="experiments/finetune_out")
    ap.add_argument("--init-ckpt", default="artifacts")
    ap.add_argument("--init-role", default="ckpt-bootstrap-5block-r1")
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--games", type=int, default=512,
                    help="self-play games per iteration")
    ap.add_argument("--mcts", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--storage-min", type=int, default=256,
                    help="samples_storage_min_batches (reference default "
                    "is 1024 batches = 524K samples, settings.h:75; a "
                    "large floor keeps the model anchored to accumulated "
                    "data instead of chasing each iteration's fresh "
                    "noisy self-play)")
    ap.add_argument("--storage-max", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dirichlet", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="true sampled root Dirichlet noise during "
                    "self-play generation (exploration diversity)")
    ap.add_argument("--tree-reuse", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--compare-games", type=int, default=384)
    ap.add_argument("--bench-every", type=int, default=3)
    ap.add_argument("--bench-script", type=int, default=128)
    ap.add_argument("--bench-random", type=int, default=16)
    ap.add_argument("--fast", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--revert", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="revert to last accepted weights on a failed gate "
                    "(reference train mode); default keeps training and "
                    "gates only the promotion of the self-play model "
                    "(reference train-data mode)")
    ap.add_argument("--load-replay", default=None,
                    help="preload a saved replay buffer (npz)")
    ap.add_argument("--device-replay", action="store_true",
                    help="device-resident replay ring: samples never "
                    "cross the host link (no per-iteration replay "
                    "persistence; resume refills the buffer)")
    ap.add_argument("--resume", action="store_true",
                    help="continue a previous run in --out: restore "
                    "latest->train weights, best->generation weights, "
                    "reload the saved replay, continue iteration numbers")
    ap.add_argument("--start-iter", type=int, default=0,
                    help="with --resume: first iteration number")
    ap.add_argument("--start-accepted", type=int, default=0,
                    help="with --resume: accepted-gate count so far")
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

    init_ckpt = os.path.abspath(args.init_ckpt)
    load_replay = (os.path.abspath(args.load_replay)
                   if args.load_replay else None)
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
        samples_storage_min_batches=args.storage_min,
        samples_storage_max_batches=args.storage_max,
        compare_games=args.compare_games,
        compare_threshold=0.55,
        benchmark_games_random=args.bench_random,
        benchmark_games_script=args.bench_script,
        max_game_steps=1008,
        # short device dispatches: the axon runtime kills long single
        # executions, so bound each chunk to ~2048 sim-steps (the same
        # rule eval_vs_script uses)
        actor_chunk_steps=max(16, 2048 // args.mcts),
        fast_infer=args.fast,
        fast_infer_int8=args.int8,
        use_dirichlet_noise=args.dirichlet,
        tree_reuse=args.tree_reuse,
        device_replay=args.device_replay,
    )

    from alphazero_risk_tpu.training.trainer import Trainer  # noqa: E402
    from alphazero_risk_tpu.training.checkpoints import (  # noqa: E402
        CheckpointManager)

    t = Trainer(cfg, seed=args.seed + args.start_iter)
    refill_floor = 0
    if args.resume:
        assert t.ckpt.exists("latest"), "--resume: no latest checkpoint"
        t.train_state = t.ckpt.restore("latest", t.train_state)
        best = t.ckpt.restore("best", t.train_state)
        t.gen_params = best.params
        t.gen_batch_stats = best.batch_stats
        found = t.replay.load(f"{cfg.data_dir}/training_samples.npz")
        if not found:
            # device-replay never persists an npz: a supervised restart
            # resumes with an EMPTY buffer, and training on it would fit
            # only fresh noisy self-play (the round-3 damage mode).
            # Generate-only until the buffer passes the storage floor.
            refill_floor = min(cfg.samples_storage_min_batches,
                               cfg.samples_storage_max_batches
                               ) * cfg.batch_size
            print("WARNING: resume found no saved replay buffer; "
                  f"refilling to {refill_floor} samples before training "
                  "resumes", flush=True)
        print(f"resume: iter {args.start_iter}, "
              f"replay {len(t.replay)} samples", flush=True)
    else:
        init_mgr = CheckpointManager(cfg, init_ckpt)
        assert init_mgr.exists(args.init_role), (
            f"missing init checkpoint {init_ckpt}/{args.init_role}")
        t.train_state = init_mgr.restore(args.init_role, t.train_state)
        t.gen_params = t.train_state.params
        t.gen_batch_stats = t.train_state.batch_stats
        t.ckpt.save("best", t.train_state)  # starting point = current best
    if load_replay:
        loaded = t.replay.load(load_replay)
        print(f"replay preload {load_replay}: "
              f"{len(t.replay)} samples (found={loaded})", flush=True)
    t._install_sigint_flush()
    print(f"finetune: {args.iters} iters from {args.init_role}, "
          f"blocks={cfg.blocks} mcts={cfg.mcts_simulations} "
          f"games/iter={args.games}", flush=True)

    accepted = args.start_accepted
    for it in range(args.start_iter, args.start_iter + args.iters):
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
            # persist replay every iteration so --resume after a tunnel
            # wedge loses at most one iteration of data (the device ring
            # skips this: a full download per iteration is the exact
            # transfer it exists to avoid — resume refills from fresh
            # self-play instead)
            t.replay.save(f"{cfg.data_dir}/training_samples.npz")

        rec = {
            "iter": it, "samples_added": added, "buffer": len(t.replay),
            "pi_loss": pi_l, "v_loss": v_l, "improved": improved,
            "accepted_total": accepted,
            "t_gen": round(t_gen, 1), "t_train": round(t_train, 1),
            "t_gate": round(t_gate, 1),
        }
        if improved and args.bench_every and (
                accepted % args.bench_every == 0):
            t3 = time.time()
            bench = t.benchmark()
            rec["vs_random"] = bench[0]
            rec["vs_script"] = bench[1]
            rec["t_bench"] = round(time.time() - t3, 1)
        print(json.dumps(rec), flush=True)
        with open("progress.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")

    t.ckpt.save("final", t.train_state)
    t.replay.save(f"{cfg.data_dir}/training_samples.npz")
    print(f"done: {accepted}/{args.iters} gates accepted", flush=True)


if __name__ == "__main__":
    main()
