"""Certify int8 inference play strength against bf16, same weights.

The 100K+ sims/s headline configuration runs the int8-quantized trunk
(models/fast_infer.py); this experiment proves the quantization does not
cost play strength, so the fast configuration is the configuration that
produces results (no reference analog — the reference has no quantized
path at all):

  1. head-to-head arena: int8 vs bf16, identical weights, mirrored game
     pairs, argmax moves — win share must sit within binomial noise of 50%
  2. eval vs ScriptPlayer with the int8 path (cross-checked against the
     bf16 number from the same checkpoint)

Usage:
  python experiments/int8_cert.py --ckpt artifacts \
      --role ckpt-bootstrap-5block-r1 --games 512
"""

import argparse
import json
import math
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
    ap.add_argument("--script-games", type=int, default=512)
    ap.add_argument("--sims", type=int, default=32)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default="experiments/int8_cert.jsonl")
    args = ap.parse_args()
    from alphazero_risk_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from alphazero_risk_tpu.config import Config
    from alphazero_risk_tpu.env.featurize import featurize
    from alphazero_risk_tpu.models.fast_infer import (
        apply_folded_impl, default_calib_feats, fold_for_inference)
    from alphazero_risk_tpu.training import actor as A
    from alphazero_risk_tpu.training.checkpoints import CheckpointManager
    from alphazero_risk_tpu.training.trainer import Trainer

    cfg = Config(blocks=args.blocks, mcts_simulations=args.sims,
                 max_depth=48, env_batch_per_device=args.batch,
                 max_game_steps=1000, fast_infer=True,
                 actor_chunk_steps=max(16, 2048 // args.sims))
    t = Trainer(cfg, seed=777)
    t.ckpt = CheckpointManager(cfg, args.ckpt)
    t.train_state = t.ckpt.restore(args.role, t.train_state)
    t.gen_params = t.train_state.params
    t.gen_batch_stats = t.train_state.batch_stats

    variables = {"params": t.gen_params, "batch_stats": t.gen_batch_stats}
    calib = default_calib_feats(cfg, jax.random.PRNGKey(17))
    folded8 = fold_for_inference(variables, cfg, int8=True,
                                 calib_feats=calib)
    folded16 = fold_for_inference(variables, cfg, int8=False)

    # ---- 1. head-to-head: seat A = int8, seat B = bf16 ----
    def eval_fn(state, legal, use_a):
        feats = featurize(state, cfg)
        l8, v8 = apply_folded_impl(folded8, feats, int8=True)
        l16, v16 = apply_folded_impl(folded16, feats, int8=False)
        logits = jnp.where(use_a[:, None], l8, l16)
        value = jnp.where(use_a, v8, v16)
        probs = jax.nn.softmax(jnp.where(legal, logits, -jnp.inf), axis=-1)
        return probs, value

    chunk = cfg.actor_chunk_steps
    arena = jax.jit(lambda s0, c, pr, k: A.run_episodes(
        eval_fn, s0, k, cfg, chunk, sample_moves=False, paired_eval=True,
        carry_in=c, prev_in=pr))

    games = args.games + args.games % 2
    tally = None
    done = 0
    t0 = time.time()
    while done < games:
        b = min(cfg.env_batch_per_device, games - done)
        b += b % 2
        state0 = t._initial_states(b)
        out = t._episode_loop(lambda st, c, pr, k: arena(st, c, pr, k),
                              state0)
        part = t._global_tally(np.asarray(out.status),
                               np.asarray(state0.cur_player))
        tally = part if tally is None else {
            k: tally[k] + part[k] for k in part}
        done += b
    n = tally["p0_wins"] + tally["p1_wins"]
    p = tally["p0_wins"] / max(n, 1)
    # two-sided binomial z vs 0.5
    z = (tally["p0_wins"] - n / 2) / max(math.sqrt(n * 0.25), 1e-9)
    rec = {"kind": "arena_int8_vs_bf16", "sims": args.sims,
           "games": tally["games"], "int8_wins": tally["p0_wins"],
           "bf16_wins": tally["p1_wins"], "draws": tally["draws"],
           "unfinished": tally["unfinished"],
           "int8_win_share": round(p, 4), "z_vs_0.5": round(z, 2),
           "ci95_half_width": round(
               1.96 * math.sqrt(p * (1 - p) / max(n, 1)), 4),
           "seconds": round(time.time() - t0, 1)}
    print(json.dumps(rec), flush=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(rec) + "\n")

    # ---- 2. int8 and bf16 vs ScriptPlayer, same games budget ----
    for name, int8 in (("int8", True), ("bf16", False)):
        tcfg = cfg.replace(fast_infer_int8=int8)
        tv = Trainer(tcfg, seed=999)
        tv.ckpt = CheckpointManager(tcfg, args.ckpt)
        tv.train_state = tv.ckpt.restore(args.role, tv.train_state)
        tv.gen_params = tv.train_state.params
        tv.gen_batch_stats = tv.train_state.batch_stats
        t0 = time.time()
        res = tv.play(A.OPP_SCRIPT, args.script_games)
        nw = res["p0_wins"] + res["p1_wins"]
        wr = res["p0_wins"] / max(nw, 1)
        rec = {"kind": f"vs_script_{name}", "sims": args.sims,
               "games": res["games"], "az_wins": res["p0_wins"],
               "script_wins": res["p1_wins"], "draws": res["draws"],
               "win_rate": round(wr, 4),
               "ci95_half_width": round(
                   1.96 * math.sqrt(wr * (1 - wr) / max(nw, 1)), 4),
               "seconds": round(time.time() - t0, 1)}
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
