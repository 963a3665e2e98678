"""Checkpoint management: latest / best / per-iteration roles.

Replaces the reference's TF1 in-graph saver ops and its checkpoint-file
weight bus (alphazero_nn.cpp:181-214, alphazero_gpu_cluster.cpp:221-231,
settings.h:25-27).  On-device params are the single source of truth; files
exist only for persistence/resume.  Uses orbax-checkpoint.
"""

from __future__ import annotations

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
        path = self._path(role)
        if not os.path.exists(path):
            import sys
            print(f"[checkpoints] no '{role}' checkpoint at {path}; "
                  f"using fresh weights", file=sys.stderr)
            return target
        return self._ckpt.restore(path, target)

    def exists(self, role: str) -> bool:
        return os.path.exists(self._path(role))
