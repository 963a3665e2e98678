"""Checkpoint management: latest / best / per-iteration roles.

Replaces the reference's TF1 in-graph saver ops and its checkpoint-file
weight bus (alphazero_nn.cpp:181-214, alphazero_gpu_cluster.cpp:221-231,
settings.h:25-27).  On-device params are the single source of truth; files
exist only for persistence/resume.  Uses orbax-checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp

from ..config import Config


class CheckpointManager:
    def __init__(self, cfg: Config, base_dir: Optional[str] = None):
        self.dir = os.path.abspath(base_dir or cfg.checkpoint_dir)
        os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, role: str) -> str:
        return os.path.join(self.dir, role)

    def save(self, role: str, train_state: Any) -> None:
        """role: 'latest', 'best', 'iter-<n>', 'temp' (settings.h:25-27)."""
        path = self._path(role)
        self._ckpt.save(path, train_state, force=True)
        self._ckpt.wait_until_finished()

    def restore(self, role: str, target: Any) -> Any:
        """Restore into the structure of ``target``; returns target when the
        checkpoint does not exist (reference inits fresh weights then,
        alphazero_nn.cpp:197-202)."""
        if not self.exists(role):
            import sys
            print(f"[checkpoints] no '{role}' checkpoint at "
                  f"{self._path(role)}; using fresh weights",
                  file=sys.stderr)
            return target
        return self._ckpt.restore(self._path(role), target)

    def exists(self, role: str) -> bool:
        """Checkpoint existence, agreed across the process world: on a pod
        without a shared filesystem a host-local check would silently
        desync (some hosts restore, others init fresh).  checkpoint_dir
        must be shared in multi-host runs — this assert catches it."""
        local = os.path.exists(self._path(role))
        import jax
        if jax.process_count() > 1:
            from ..parallel.distributed import allgather_min
            world_min = allgather_min(int(local))
            world_max = -allgather_min(-int(local))
            assert world_min == world_max, (
                f"checkpoint '{role}' exists on some hosts but not others "
                f"— checkpoint_dir must be a shared filesystem")
            return bool(world_min)
        return local

    # ---- lightweight weight snapshots: float16 params + batch_stats in
    # one npz (~1/6 the orbax train_state: no Adam moments, half-precision
    # storage).  Cheap enough to commit into git after EVERY bootstrap
    # loop — the round-3 20-block checkpoint died with the container
    # because nothing small enough to commit continuously existed. ----
    def save_params_npz(self, path: str, train_state: Any) -> None:
        import jax
        import numpy as np

        flat = {}
        for kind, tree in (("p", train_state.params),
                           ("b", train_state.batch_stats)):
            leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
            for kp, leaf in leaves:
                key = kind + "/" + "/".join(
                    getattr(e, "key", str(e)) for e in kp)
                arr = np.asarray(leaf)
                if arr.dtype == np.float32:
                    arr = arr.astype(np.float16)
                flat[key] = arr
        tmp = path + ".tmp.npz"
        np.savez_compressed(tmp, **flat)
        os.replace(tmp, path)

    def load_params_npz(self, path: str, train_state: Any) -> Any:
        """Returns train_state with params/batch_stats replaced from the
        npz (float16 storage upcast to the template leaf dtypes)."""
        import jax
        import numpy as np

        with np.load(path) as z:
            flat = dict(z)

        def rebuild(kind, tree):
            leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
            out = []
            for kp, leaf in leaves:
                key = kind + "/" + "/".join(
                    getattr(e, "key", str(e)) for e in kp)
                arr = flat[key].astype(leaf.dtype)
                assert arr.shape == leaf.shape, (key, arr.shape,
                                                 leaf.shape)
                out.append(arr)
            return jax.tree_util.tree_unflatten(treedef, out)

        return train_state.replace(
            params=rebuild("p", train_state.params),
            batch_stats=rebuild("b", train_state.batch_stats))

    # ---- sidecar metadata: {iteration, rng key, ...} so resume continues
    # numbering and does not replay identical game deals
    # (completes the reference's restart-the-binary resume,
    # alphazero_trainer.cpp:14-15) ----
    def save_meta(self, meta: dict) -> None:
        tmp = os.path.join(self.dir, "meta.json.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.dir, "meta.json"))

    def load_meta(self) -> Optional[dict]:
        path = os.path.join(self.dir, "meta.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)
