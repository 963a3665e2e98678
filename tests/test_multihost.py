"""Multi-process multi-host runtime test.

Launches tools/multihost_smoke.py, which forms a REAL ``jax.distributed``
world of separate OS processes (gloo CPU collectives standing in for
ICI/DCN) and runs DP training steps, sharded env stepping, scripted data
generation, and cross-process metric aggregation.  This is the
cross-process analog of the in-process 8-device mesh the rest of the suite
uses — the reference has no equivalent (it is single-process by design,
SURVEY.md section 5)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "multihost_smoke.py")


def _free_port() -> int:
    """A currently-free TCP port (avoids collisions between concurrent
    test runs / TIME_WAIT leftovers of earlier ones)."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("nprocs,local", [(2, 2)])
def test_multihost_world(nprocs, local):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, TOOL, "--nprocs", str(nprocs),
         "--local-devices", str(local), "--port", str(_free_port()),
         "--timeout", "560"],
        capture_output=True, text=True, timeout=580, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["ok"]
    assert summary["devices"] == nprocs * local
    assert summary["scripted_samples"] > 0


def test_multihost_world_4proc_trimmed():
    """A 4-process x 2-device world (trimmed phases: DP updates, sharded
    env, collectives) with the weak-scaling measurement — un-slow-marked
    so every suite run proves the 4-host path."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, TOOL, "--nprocs", "4", "--local-devices", "2",
         "--port", str(_free_port()), "--timeout", "560",
         "--trim", "--scaling"],
        capture_output=True, text=True, timeout=580, env=env)
    assert out.returncode == 0, out.stdout + out.stderr
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["ok"]
    assert summary["devices"] == 8
    sc = summary["scaling"]
    assert sc["per_host_env_steps_per_s_1proc"] > 0
    assert 0 < sc["efficiency"]  # raw CPU-proxy number; see its note
