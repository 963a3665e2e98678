"""alphazero_risk_tpu — a TPU-native AlphaZero framework for the game Risk.

Ground-up JAX/XLA re-design of JGasp/alphazero-risk: thousands of games as
one batched pytree stepped in lockstep under jit, array-based MCTS with exact
chance nodes, a Flax ResNet learner, and data-parallel scale-out over a
``jax.sharding.Mesh``.
"""

from .config import Config, DEFAULT_CONFIG

__version__ = "0.1.0"
