"""Prove (or shelve) MCTS tree reuse with data.

The reference always reuses the chosen subtree between moves
(``trimNodes``, alphazero_mcts.cpp:229-245).  The array-MCTS equivalent
(``mcts.search.reroot``) carries compacted subtrees across moves; this
experiment measures what that buys on real hardware with a real model:

  * strength at equal simulation count: win rate vs ScriptPlayer with
    ``tree_reuse`` on vs off (same checkpoint, same sims, same games),
  * wall-clock: seconds per games budget (captures both the reroot
    compaction cost and the doubled node arrays).

Usage:
  python experiments/tree_reuse_eval.py --ckpt artifacts \
      --role ckpt-bootstrap-5block-r1 --games 512 --sims 32
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
    ap.add_argument("--ckpt", default="artifacts")
    ap.add_argument("--role", default="ckpt-bootstrap-5block-r1")
    ap.add_argument("--blocks", type=int, default=5)
    ap.add_argument("--games", type=int, default=512)
    ap.add_argument("--sims", type=int, default=32)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--int8", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--out", default="experiments/tree_reuse_eval.jsonl")
    args = ap.parse_args()
    from alphazero_risk_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    from alphazero_risk_tpu.config import Config
    from alphazero_risk_tpu.training import actor as A
    from alphazero_risk_tpu.training.checkpoints import CheckpointManager
    from alphazero_risk_tpu.training.trainer import Trainer

    for reuse in (False, True):
        cfg = Config(blocks=args.blocks, mcts_simulations=args.sims,
                     max_depth=48, env_batch_per_device=args.batch,
                     max_game_steps=1000, fast_infer=True,
                     fast_infer_int8=args.int8, tree_reuse=reuse,
                     actor_chunk_steps=max(16, 2048 // args.sims))
        t = Trainer(cfg, seed=321)
        t.ckpt = CheckpointManager(cfg, args.ckpt)
        t.train_state = t.ckpt.restore(args.role, t.train_state)
        t.gen_params = t.train_state.params
        t.gen_batch_stats = t.train_state.batch_stats
        t0 = time.time()
        res = t.play(A.OPP_SCRIPT, args.games)
        dt = time.time() - t0
        rec = {"kind": "vs_script", "tree_reuse": reuse,
               "sims": args.sims, "games": res["games"],
               "az_wins": res["p0_wins"], "script_wins": res["p1_wins"],
               "draws": res["draws"], "unfinished": res["unfinished"],
               "win_rate": round(res["p0_wins"] / max(
                   res["p0_wins"] + res["p1_wins"], 1), 4),
               "seconds": round(dt, 1)}
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
