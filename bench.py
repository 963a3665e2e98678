"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: vectorized env micro-steps/s/chip (north-star >= 1M, BASELINE.md).
Extras: batched MCTS simulations/s/chip (target >= 100K) and 20-block
network inference samples/s (reference best: ~2,720 samples/s/GPU at batch
512, python/log/batch-size-perf.txt).

Run on the real chip (default env) or `--quick` on CPU for smoke tests.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def _sync(out):
    """Force completion by fetching one element of EVERY leaf to the host.

    ``jax.block_until_ready`` can return before the computation finishes on
    tunneled PJRT backends (observed on axon: 0.07ms "latency" for a 20+ms
    program); a host read of an output element is a reliable barrier.  Leaves
    may come from separate dispatches, so each one is read.
    """
    return sum(float(leaf.ravel()[0].astype(jnp.float32))
               for leaf in jax.tree.leaves(out))


def _timeit(fn, *args, reps=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_env_steps(cfg, batch, steps):
    from alphazero_risk_tpu.env import rules
    from alphazero_risk_tpu.env.state import new_game

    state = new_game(jax.random.PRNGKey(0), batch)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            st, k = carry
            k, ka, kd = jax.random.split(k, 3)
            mask = rules.legal_actions(st, cfg)
            action = jax.random.categorical(
                ka, jnp.where(mask, 0.0, -1e9))
            st = rules.step_key(st, action.astype(jnp.int32), kd, cfg)
            return (st, k), ()

        (state, _), _ = jax.lax.scan(body, (state, key), None, length=steps)
        return state.army

    dt = _timeit(run, state, jax.random.PRNGKey(1))
    return batch * steps / dt


def bench_mcts(cfg, batch):
    import alphazero_risk_tpu.mcts.search as M
    from alphazero_risk_tpu.env.state import new_game
    from alphazero_risk_tpu.models.resnet import init_network
    from alphazero_risk_tpu.training.actor import make_eval_fn

    net, variables = init_network(cfg, jax.random.PRNGKey(0))
    eval_fn = make_eval_fn(net, cfg)
    params, bstats = variables["params"], variables["batch_stats"]

    root = new_game(jax.random.PRNGKey(2), batch)

    @jax.jit
    def run(root, key):
        res = M.search(
            root, key, cfg,
            lambda s, m: eval_fn(params, bstats, s, m))
        return res.visit_counts

    dt = _timeit(run, root, jax.random.PRNGKey(3))
    return batch * cfg.mcts_simulations / dt


def bench_mcts_fast(cfg, batch, int8=False):
    """MCTS with the production inference path: BN-folded weights, trunk in
    the BN-folded bf16/int8 XLA trunk (models/fast_infer.py)."""
    import alphazero_risk_tpu.mcts.search as M
    from alphazero_risk_tpu.env.state import new_game
    from alphazero_risk_tpu.models.fast_infer import (default_calib_feats,
                                                      fold_for_inference,
                                                      make_fast_eval_fn)
    from alphazero_risk_tpu.models.resnet import init_network

    _, variables = init_network(cfg, jax.random.PRNGKey(0))
    calib = default_calib_feats(cfg, jax.random.PRNGKey(17)) if int8 \
        else None
    folded = fold_for_inference(variables, cfg, int8=int8,
                                calib_feats=calib)
    eval_fn = make_fast_eval_fn(cfg, int8=int8)

    root = new_game(jax.random.PRNGKey(2), batch)

    @jax.jit
    def run(root, key):
        res = M.search(root, key, cfg,
                       lambda s, m: eval_fn(folded, s, m))
        return res.visit_counts

    dt = _timeit(run, root, jax.random.PRNGKey(3))
    return batch * cfg.mcts_simulations / dt


def bench_nn_fast(cfg, batch, inner=16, int8=False):
    from alphazero_risk_tpu.models.fast_infer import (apply_folded,
                                                      default_calib_feats,
                                                      fold_for_inference)
    from alphazero_risk_tpu.models.resnet import init_network

    _, variables = init_network(cfg, jax.random.PRNGKey(0))
    calib = default_calib_feats(cfg, jax.random.PRNGKey(17)) if int8 \
        else None
    folded = fold_for_inference(variables, cfg, int8=int8,
                                calib_feats=calib)
    xs = jax.random.uniform(jax.random.PRNGKey(1),
                            (inner, batch, 7, 6, cfg.num_features))

    @jax.jit
    def fwd(folded, xs):
        def body(acc, x):
            logits, value = apply_folded(folded, x, int8=int8)
            return acc + value.sum(), ()
        acc, _ = jax.lax.scan(body, 0.0, xs)
        return acc

    dt = _timeit(fwd, folded, xs)
    return inner * batch / dt


def bench_nn(cfg, batch, inner=16):
    """Steady-state inference throughput: ``inner`` chained forwards inside
    one dispatch (self-play evaluates leaves in exactly this regime; a
    single dispatch carries ~30ms of host->device latency that would
    otherwise dominate)."""
    from alphazero_risk_tpu.models.resnet import init_network

    net, variables = init_network(cfg, jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1),
                            (inner, batch, 7, 6, cfg.num_features))

    @jax.jit
    def fwd(v, xs):
        def body(acc, x):
            logits, value = net.apply(v, x, train=False)
            return acc + value.sum(), ()
        acc, _ = jax.lax.scan(body, 0.0, xs)
        return acc

    dt = _timeit(fwd, variables, xs)
    return inner * batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small sizes on CPU for smoke testing")
    args = ap.parse_args()

    if args.quick:
        jax.config.update("jax_platforms", "cpu")

    from alphazero_risk_tpu.config import Config

    if args.quick:
        cfg = Config(blocks=2, filters=32, value_hidden=32,
                     mcts_simulations=8, max_depth=12)
        cfg5 = cfg
        env_b, env_k, mcts_b, nn_b = 256, 32, 16, 64
    else:
        cfg = Config(mcts_simulations=32, max_depth=48)
        cfg5 = cfg.replace(blocks=5)
        env_b, env_k, mcts_b, nn_b = 8192, 128, 2048, 1024

    t0 = time.time()
    env_sps = bench_env_steps(cfg, env_b, env_k)
    print(f"# env_steps/s = {env_sps:,.0f} ({time.time()-t0:.0f}s)",
          file=sys.stderr)
    t0 = time.time()
    nn_sps = bench_nn(cfg, nn_b)
    print(f"# nn_samples/s = {nn_sps:,.0f} ({time.time()-t0:.0f}s)",
          file=sys.stderr)
    t0 = time.time()
    nn_fast_sps = bench_nn_fast(cfg, nn_b)
    print(f"# nn_samples/s (folded bf16) = {nn_fast_sps:,.0f} "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)
    t0 = time.time()
    nn_int8_sps = bench_nn_fast(cfg, nn_b, int8=True)
    print(f"# nn_samples/s (folded int8) = {nn_int8_sps:,.0f} "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)
    t0 = time.time()
    mcts_sps = bench_mcts(cfg, mcts_b)
    print(f"# mcts_sims/s (20 blocks) = {mcts_sps:,.0f} "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)
    t0 = time.time()
    mcts_fast_sps = bench_mcts_fast(cfg, mcts_b)
    print(f"# mcts_sims/s (20 blocks, folded bf16) = "
          f"{mcts_fast_sps:,.0f} ({time.time()-t0:.0f}s)", file=sys.stderr)
    t0 = time.time()
    mcts_int8_sps = bench_mcts_fast(cfg, mcts_b, int8=True)
    print(f"# mcts_sims/s (20 blocks, folded int8) = "
          f"{mcts_int8_sps:,.0f} ({time.time()-t0:.0f}s)", file=sys.stderr)
    t0 = time.time()
    mcts5_sps = bench_mcts(cfg5, mcts_b)
    print(f"# mcts_sims/s (5 blocks) = {mcts5_sps:,.0f} "
          f"({time.time()-t0:.0f}s)", file=sys.stderr)

    print(json.dumps({
        "metric": "env_steps_per_s_per_chip",
        "value": round(env_sps),
        "unit": "steps/s",
        "vs_baseline": round(env_sps / 1_000_000, 3),
        "extras": {
            "mcts_sims_per_s_20block": round(mcts_sps),
            "mcts_sims_per_s_20block_fast": round(mcts_fast_sps),
            "mcts_sims_per_s_20block_int8": round(mcts_int8_sps),
            "mcts_sims_per_s_5block": round(mcts5_sps),
            "mcts_sims_target_ratio": round(
                max(mcts_fast_sps, mcts_int8_sps) / 100_000, 3),
            "nn_infer_samples_per_s": round(nn_sps),
            "nn_infer_samples_per_s_fast": round(nn_fast_sps),
            "nn_infer_samples_per_s_int8": round(nn_int8_sps),
            "nn_vs_reference_gpu": round(
                max(nn_fast_sps, nn_int8_sps) / 2720, 2),
        },
    }))


if __name__ == "__main__":
    main()
