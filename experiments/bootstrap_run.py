"""Supervised bootstrap experiment on the real chip.

Reproduces the reference's `-m train-data` recipe (the path that produced
its best models, alphazero_trainer.cpp:227-319) at reduced scale: per loop,
generate Script-vs-Script + Script-vs-Random games, train 3 epochs, gate
against the previous model, benchmark vs ScriptPlayer at 32 MCTS sims.

Reference yardstick (BASELINE.md): 5-block SR-bootstrapped model reaches
~53.5% vs ScriptPlayer at 32 sims; 20-block SR peaks 68.3% at 512 sims.

Usage: python experiments/bootstrap_run.py [--loops N] [--out DIR]
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
    ap.add_argument("--loops", type=int, default=12)
    ap.add_argument("--out", default="experiments/bootstrap_out")
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--filters", type=int, default=None,
                    help="conv filters (default: Config default; small "
                    "values make CPU smoke tests compile fast)")
    ap.add_argument("--games", type=int, default=2000)
    ap.add_argument("--games-ss", type=int, default=None,
                    help="Script-vs-Script games per loop (default --games)")
    ap.add_argument("--games-sr", type=int, default=None,
                    help="Script-vs-Random games per loop (default --games)")
    ap.add_argument("--mcts", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=None,
                    help="learning rate (default Config default = the "
                    "reference's Adam 1e-3, build_graph.py:31)")
    ap.add_argument("--init-npz", default=None,
                    help="warm-start: load params/batch_stats from a "
                    "float16 npz (e.g. the committed flagship) instead "
                    "of random init; the gate opponent starts as these "
                    "weights")
    ap.add_argument("--fast", action="store_true",
                    help="folded-pallas inference for arenas/benchmarks")
    ap.add_argument("--int8", action="store_true",
                    help="with --fast: int8-quantized trunk")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--revert", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="revert to the last gate-accepted weights on a "
                    "failed gate.  Default False = the reference's "
                    "train-data semantics (training drifts on regardless, "
                    "alphazero_trainer.cpp:293-317); True turns each loop "
                    "into an independent attempt from the accepted model — "
                    "the round-4 run showed the faithful semantics drift "
                    "away after the first accept and never recover")
    ap.add_argument("--compare-games", type=int, default=192)
    ap.add_argument("--bench-script", type=int, default=128)
    ap.add_argument("--bench-random", type=int, default=16)
    ap.add_argument("--resume", action="store_true",
                    help="continue a previous run in --out: restore the "
                    "latest checkpoint and start after the last loop "
                    "recorded in progress.jsonl (tunnel wedges truncated "
                    "the round-3 20-block run; this makes the recipe "
                    "supervisable)")
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
        **({"filters": args.filters, "value_hidden": args.filters}
           if args.filters else {}),
        **({"learning_rate": args.lr} if args.lr is not None else {}),
        mcts_simulations=args.mcts,
        max_depth=48,
        batch_size=512,
        env_batch_per_device=512,
        data_games_ss=(args.games_ss if args.games_ss is not None
                       else args.games),
        data_games_sr=(args.games_sr if args.games_sr is not None
                       else args.games),
        compare_games=args.compare_games,
        benchmark_games_random=args.bench_random,
        benchmark_games_script=args.bench_script,
        max_game_steps=1000,
        fast_infer=args.fast,
        fast_infer_int8=args.int8,
    )

    from alphazero_risk_tpu.training.trainer import Trainer  # noqa: E402
    from alphazero_risk_tpu.training import actor as A  # noqa: E402

    import numpy as np
    import jax.numpy as jnp

    t = Trainer(cfg, seed=args.seed)
    start_loop = 0
    if args.init_npz and not args.resume:
        t.train_state = t.ckpt.load_params_npz(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), args.init_npz)
            if not os.path.isabs(args.init_npz) else args.init_npz,
            t.train_state)
        t.gen_params = t.train_state.params
        t.gen_batch_stats = t.train_state.batch_stats
        t.ckpt.save("best", t.train_state)
        print(f"warm start from {args.init_npz}", flush=True)
    if args.resume:
        # Loop counter + RNG key come from the checkpoint meta sidecar
        # written at the SAME point as the loop-end checkpoint, so the
        # restored weights and the restart loop can't disagree the way
        # 'latest' (also saved mid-loop by _accept) and progress.jsonl
        # could (advisor round 3: a kill between an accepted gate and the
        # progress write double-trained a loop).
        meta = t.ckpt.load_meta()
        if meta:
            start_loop = int(meta["iteration"])
            t.key = jnp.asarray(meta["key"], jnp.uint32)
        elif os.path.exists("progress.jsonl"):
            # pre-meta runs: count completed loops; reseed so the resumed
            # deals differ from the original run's
            import jax
            start_loop = sum(1 for ln in open("progress.jsonl")
                             if ln.strip())
            t.key = jax.random.PRNGKey(args.seed + start_loop)
    if args.resume and start_loop > 0:
        assert t.ckpt.exists("latest"), "--resume: no latest checkpoint"
        t.train_state = t.ckpt.restore("latest", t.train_state)
        if t.ckpt.exists("best"):
            best = t.ckpt.restore("best", t.train_state)
            t.gen_params = best.params
            t.gen_batch_stats = best.batch_stats
        else:
            # never-accepted run: the gate opponent is the restored
            # training weights, NOT a fresh random init
            t.gen_params = t.train_state.params
            t.gen_batch_stats = t.train_state.batch_stats
        print(f"resume: starting at loop {start_loop}", flush=True)
    print(f"bootstrap run: {args.loops} loops, cfg blocks={cfg.blocks} "
          f"mcts={cfg.mcts_simulations}", flush=True)

    for loop in range(start_loop, args.loops):
        t0 = time.time()
        t.iteration = loop
        # one train-data loop, inlined so we can log timings
        from alphazero_risk_tpu.training.replay import ReplayBuffer
        fresh = ReplayBuffer(cfg)
        for kinds, games in (((A.OPP_SCRIPT, A.OPP_SCRIPT),
                              cfg.data_games_ss),
                             ((A.OPP_SCRIPT, A.OPP_RANDOM),
                              cfg.data_games_sr)):
            done = 0
            while done < games:
                b = min(cfg.env_batch_per_device, games - done)
                b += b % 2
                state0 = t._initial_states(b)
                out = t._episode_loop(
                    lambda st, c, pr, k: t._scripted_chunk(st, c, pr, k,
                                                           kinds), state0)
                fresh.extend_from_actor(out.samples, out.status)
                done += b
        t.replay = fresh
        t_gen = time.time() - t0

        t1 = time.time()
        pi_l, v_l = t.train_epochs(epochs=args.epochs)
        t_train = time.time() - t1

        t2 = time.time()
        improved = t.gate(revert_on_fail=args.revert)
        t_gate = time.time() - t2

        t3 = time.time()
        bench = t.benchmark()
        t_bench = time.time() - t3
        # loop-end resume point: checkpoint + meta written back-to-back so
        # the restored weights and the restart loop number agree (the
        # mid-loop 'latest' saved by _accept is NOT the resume anchor)
        t.ckpt.save("latest", t.train_state)
        t.ckpt.save_meta({"iteration": loop + 1,
                          "key": np.asarray(t.key).tolist()})
        # committable weight snapshot (float16 params, ~25MB at 20
        # blocks): survives container resets once copied into artifacts/
        t.ckpt.save_params_npz(f"params_loop{loop}.npz", t.train_state)
        if improved:
            # rolling BEST snapshot — round 4's rolling snapshot tracked
            # 'latest' and committed the overfit endpoint while the
            # gate-accepted headline model sat gitignored (VERDICT r4);
            # the artifacts/ sync must copy THIS file
            t.ckpt.save_params_npz(
                "params_best.npz",
                t.train_state.replace(params=t.gen_params,
                                      batch_stats=t.gen_batch_stats))

        rec = {
            "loop": loop, "samples": len(t.replay),
            "pi_loss": pi_l, "v_loss": v_l, "improved": improved,
            "vs_random": bench[0], "vs_script": bench[1],
            "t_gen": round(t_gen, 1), "t_train": round(t_train, 1),
            "t_gate": round(t_gate, 1), "t_bench": round(t_bench, 1),
        }
        print(json.dumps(rec), flush=True)
        with open("progress.jsonl", "a") as f:
            f.write(json.dumps(rec) + "\n")

    t.ckpt.save("final", t.train_state)
    print("done", flush=True)


if __name__ == "__main__":
    main()
