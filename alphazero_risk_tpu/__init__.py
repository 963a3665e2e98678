"""alphazero_risk_tpu — a TPU-native AlphaZero framework for the game Risk.

Ground-up JAX/XLA re-design of JGasp/alphazero-risk: thousands of games as
one batched pytree stepped in lockstep under jit, array-based MCTS with exact
chance nodes, a Flax ResNet learner, and data-parallel scale-out over a
``jax.sharding.Mesh``.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: supervisor restarts and repeated
# experiment launches otherwise pay the full multi-minute first-compile of
# the actor/arena graphs on every fresh process.  Opt out with
# AZR_COMPILE_CACHE="".
_cache = _os.environ.get("AZR_COMPILE_CACHE",
                         _os.path.expanduser("~/.cache/azr-jax"))
if _cache:
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import Config, DEFAULT_CONFIG  # noqa: E402

__version__ = "0.1.0"
