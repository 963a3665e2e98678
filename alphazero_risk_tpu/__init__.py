"""alphazero_risk_tpu — a TPU-native AlphaZero framework for the game Risk.

Ground-up JAX/XLA re-design of JGasp/alphazero-risk: thousands of games as
one batched pytree stepped in lockstep under jit, array-based MCTS with exact
chance nodes, a Flax ResNet learner, and data-parallel scale-out over a
``jax.sharding.Mesh``.
"""

# NOTE: importing this package must stay side-effect free (no jax import,
# no global jax config mutation) — consumers importing it just for Config
# must not pay for or perturb a jax runtime.  The persistent XLA compile
# cache lives in utils/compile_cache.py and is enabled explicitly by the
# CLI and experiment drivers.
from .config import Config, DEFAULT_CONFIG

__version__ = "0.1.0"
