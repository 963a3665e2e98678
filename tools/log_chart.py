"""Offline chart tooling: win-rate / loss / performance charts from logs.

Equivalent of the reference's ``python/src/log_chart.py`` (204 LoC of
matplotlib over the five log files), reading this framework's JSONL event
mirror (``log/events.jsonl``) which carries the same information as the
reference's improvement/benchmark/nn-training logs.

Usage: python tools/log_chart.py --log-dir log --out charts/
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def load_events(path):
    events = defaultdict(list)
    if not os.path.exists(path):
        return events
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            events[e.get("kind", "?")].append(e)
    return events


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-dir", default="log")
    ap.add_argument("--out", default="charts")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    events = load_events(os.path.join(args.log_dir, "events.jsonl"))
    os.makedirs(args.out, exist_ok=True)

    # Gating win-rate per iteration (reference improvement chart,
    # log_chart.py:23-41)
    imp = events["improvement"]
    if imp:
        it = [e["iteration"] for e in imp]
        wr = [e["new_wins"] / max(e["new_wins"] + e["old_wins"], 1)
              for e in imp]
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(it, wr, marker="o", label="new-vs-old win rate")
        ax.axhline(0.55, color="grey", ls="--", label="accept gate")
        ax.set_xlabel("iteration")
        ax.set_ylabel("win rate")
        ax.set_title("Gating arena")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "improvement.png"), dpi=120)

    # Benchmark vs random / script (reference benchmark chart,
    # log_chart.py:44-80)
    ben = events["benchmark"]
    if ben:
        it = [e["iteration"] for e in ben]
        vr = [e["vs_random"]["p0_wins"] / max(e["vs_random"]["games"], 1)
              for e in ben]
        vs = [e["vs_script"]["p0_wins"] / max(e["vs_script"]["games"], 1)
              for e in ben]
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(it, vr, marker="o", label="vs RandomPlayer")
        ax.plot(it, vs, marker="s", label="vs ScriptPlayer")
        ax.set_xlabel("iteration")
        ax.set_ylabel("win share")
        ax.set_ylim(0, 1)
        ax.set_title("Benchmarks")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "benchmark.png"), dpi=120)

    # Training losses (reference nn chart, log_chart.py:133-166)
    nne = events["nn_epoch"]
    if nne:
        xs = list(range(len(nne)))
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(xs, [e["pi_loss"] for e in nne], label="policy CE")
        ax.plot(xs, [e["v_loss"] for e in nne], label="value MSE")
        ax.set_xlabel("epoch (cumulative)")
        ax.set_ylabel("loss")
        ax.set_title("Training losses")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "nn_training.png"), dpi=120)

    # NN batch-size sweep (reference batch-size-perf chart,
    # log_chart.py:83-100) — produced by tools/nn_batch_sweep.py
    sweep_path = os.path.join(args.log_dir, "batch-size-perf.txt")
    if os.path.exists(sweep_path):
        bs, ns = [], []
        with open(sweep_path) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 2:
                    bs.append(int(parts[0]))
                    ns.append(float(parts[1]))
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(bs, ns, marker="o")
        ax.set_xscale("log", base=2)
        ax.set_yscale("log")
        ax.set_xlabel("batch size")
        ax.set_ylabel("ns / sample")
        ax.set_title("NN inference latency per sample")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "batch-size-perf.png"), dpi=120)

    print(f"charts written to {args.out}/")


if __name__ == "__main__":
    main()
