"""Export an orbax checkpoint role to a committable float16 params npz.

The round-3 post-mortem (RESULTS.md): headline weights that live only in
gitignored experiments/*_out/ die with the container between rounds.  This
tool converts any checkpoint role into the ~5MB float16 npz format
(checkpoints.save_params_npz) that is cheap enough to commit into
artifacts/ the moment a measurement makes the weights worth keeping.

Usage:
  python tools/export_npz.py --ckpt experiments/bootstrap20_out/checkpoints \
      --role best --blocks 20 --out artifacts/params-20block-r4-best.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--role", default="best")
    ap.add_argument("--blocks", type=int, default=20)
    ap.add_argument("--filters", type=int, default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    # CPU is always sufficient for a restore + re-serialize, and never
    # contends with a training run holding the TPU.
    import jax
    jax.config.update("jax_platforms", "cpu")

    from alphazero_risk_tpu.config import Config
    from alphazero_risk_tpu.training.learner import create_train_state
    from alphazero_risk_tpu.training.checkpoints import CheckpointManager

    cfg = Config(blocks=args.blocks,
                 **({"filters": args.filters, "value_hidden": args.filters}
                    if args.filters else {}))
    _, _, ts = create_train_state(cfg, jax.random.PRNGKey(0))
    mgr = CheckpointManager(cfg, os.path.abspath(args.ckpt))
    assert mgr.exists(args.role), f"no role '{args.role}' in {args.ckpt}"
    ts = mgr.restore(args.role, ts)
    mgr.save_params_npz(os.path.abspath(args.out), ts)
    import numpy as np
    with np.load(args.out) as z:
        n = sum(int(np.prod(z[k].shape)) for k in z.files)
    print(f"exported {args.ckpt}/{args.role} -> {args.out} "
          f"({n:,} scalars, {os.path.getsize(args.out)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
