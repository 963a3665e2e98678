"""NN inference latency sweep over batch sizes.

Replaces the reference's LOG_PERFORMANCE batch probe
(``alphazero_gpu_cluster.cpp:17-69`` -> ``python/log/batch-size-perf.txt``):
measures steady-state ns/sample of the policy/value network at the same
batch sizes the reference logged (1..1024), writing the same
"batch ns_per_sample" text format for the chart tooling.

Reference numbers to beat (1 GPU, 20 blocks): b1 8.04ms, b32 674us,
b512 368us per sample.

Usage: python tools/nn_batch_sweep.py [--blocks 20] [--out log/batch-size-perf.txt]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=20)
    ap.add_argument("--out", default="log/batch-size-perf.txt")
    ap.add_argument("--inner", type=int, default=16,
                    help="chained forwards per dispatch")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from alphazero_risk_tpu.utils.compile_cache import setup_compile_cache
    setup_compile_cache()

    from alphazero_risk_tpu.config import Config
    from alphazero_risk_tpu.models.resnet import init_network

    cfg = Config(blocks=args.blocks)
    net, variables = init_network(cfg, jax.random.PRNGKey(0))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    lines = []
    for batch in (1, 8, 32, 128, 512, 1024, 2048, 4096):
        xs = jax.random.uniform(
            jax.random.PRNGKey(1),
            (args.inner, batch, 7, 6, cfg.num_features))

        @jax.jit
        def fwd(v, xs):
            def body(acc, x):
                _, value = net.apply(v, x, train=False)
                return acc + value.sum(), ()
            acc, _ = jax.lax.scan(body, 0.0, xs)
            return acc

        out = fwd(variables, xs)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fwd(variables, xs))
            best = min(best, time.perf_counter() - t0)
        ns_per_sample = best / (args.inner * batch) * 1e9
        line = f"{batch} {ns_per_sample:.0f}"
        lines.append(line)
        print(line, flush=True)

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"written {args.out}")


if __name__ == "__main__":
    main()
