"""Evaluate a trained checkpoint vs ScriptPlayer across MCTS sim counts.

Reproduces the reference's results-short.txt protocol (BASELINE.md):
win rate vs ScriptPlayer at 32/128/512 simulations, mirrored game pairs,
argmax move selection.

Usage: python experiments/eval_vs_script.py --ckpt experiments/bootstrap_out/checkpoints --role best --games 256
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="experiments/bootstrap_out/checkpoints")
    ap.add_argument("--role", default="best")
    ap.add_argument("--npz", default=None,
                    help="load weights from a float16 params npz "
                    "(checkpoints.save_params_npz) instead of --ckpt/--role")
    ap.add_argument("--games", type=int, default=256)
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--sims", type=int, nargs="+", default=[32, 128, 512])
    ap.add_argument("--out", default="experiments/eval_results.jsonl")
    ap.add_argument("--fast", action="store_true",
                    help="folded-pallas inference path")
    ap.add_argument("--int8", action="store_true",
                    help="with --fast: int8-quantized trunk")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--noise-eps", type=float, default=None,
                    help="override Config.noise_eps for the eval search "
                    "(the reference blends 0.25*0.3 into EVERY node's "
                    "prior, alphazero_mcts.cpp:78-86; 0.0 disables the "
                    "blend — at 512 sims the constant floor forces "
                    "~uniform exploration worth testing away)")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--cpuct", type=float, default=None,
                    help="override Config.cpuct (reference HP_EXPLORATION "
                    "= 1.1) for sims-scaling sweeps")
    ap.add_argument("--max-depth", type=int, default=48)
    ap.add_argument("--tree-reuse", action="store_true")
    args = ap.parse_args()
    from alphazero_risk_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    from alphazero_risk_tpu.config import Config
    from alphazero_risk_tpu.training import actor as A
    from alphazero_risk_tpu.training.trainer import Trainer
    from alphazero_risk_tpu.training.checkpoints import CheckpointManager

    for sims in args.sims:
        cfg = Config(blocks=args.blocks, mcts_simulations=sims,
                     max_depth=args.max_depth,
                     env_batch_per_device=args.batch,
                     max_game_steps=1000, fast_infer=args.fast,
                     fast_infer_int8=args.int8,
                     tree_reuse=args.tree_reuse,
                     actor_chunk_steps=max(16, 2048 // sims),
                     **({"noise_eps": args.noise_eps}
                        if args.noise_eps is not None else {}),
                     **({"cpuct": args.cpuct}
                        if args.cpuct is not None else {}))
        t = Trainer(cfg, seed=args.seed)
        t.ckpt = CheckpointManager(cfg, args.ckpt)
        if args.npz:
            t.train_state = t.ckpt.load_params_npz(args.npz, t.train_state)
        else:
            t.train_state = t.ckpt.restore(args.role, t.train_state)
        t.gen_params = t.train_state.params
        t.gen_batch_stats = t.train_state.batch_stats
        t0 = time.time()
        # wave-at-a-time with partial lines: a wedged tunnel RPC then
        # costs one wave, not the whole arm, and the stall-retry wrapper
        # (tools/run_with_retry.sh) can see per-wave progress
        wave = max(64, cfg.env_batch_per_device)
        res = None
        done = 0
        while done < args.games:
            g = min(wave, args.games - done)
            part = t.play(A.OPP_SCRIPT, g)
            res = part if res is None else {
                k: res[k] + part[k] for k in part}
            done += g
            if done < args.games:
                pl = {"partial": True, "sims": sims, "done": done,
                      "az_wins": res["p0_wins"],
                      "script_wins": res["p1_wins"],
                      "seconds": round(time.time() - t0, 1)}
                print(json.dumps(pl), flush=True)
                with open(args.out + ".partial", "a") as f:
                    f.write(json.dumps(pl) + "\n")
        rec = {"role": args.npz or args.role, "sims": sims,
               "games": args.games,
               "int8": args.int8, "fast": args.fast,
               "noise_eps": (args.noise_eps if args.noise_eps is not None
                             else cfg.noise_eps),
               "cpuct": cfg.cpuct, "tree_reuse": cfg.tree_reuse,
               "az_wins": res["p0_wins"], "script_wins": res["p1_wins"],
               "draws": res["draws"], "unfinished": res["unfinished"],
               "win_rate": res["p0_wins"] / max(
                   res["p0_wins"] + res["p1_wins"], 1),
               "seconds": round(time.time() - t0, 1)}
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
