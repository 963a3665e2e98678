"""AlphaZero residual network for the 7x6 Risk board image.

Architecture mirrors the reference's frozen TF1 graph
(``python/src/build_graph.py:37-103``): 3x3 conv(256)+BN+ReLU stem, N
residual blocks [conv-BN-ReLU-conv-BN-add-ReLU], a 2-filter policy head to
a 43-way softmax and a 1-filter value head through dense(256) to tanh.

TPU-native choices:
  * bfloat16 activations / float32 params & batch-norm statistics — the MXU
    runs bf16 natively, and the 7x6x256 activations make every conv an
    MXU-shaped matmul (XLA lowers 3x3 convs on 7x6 boards to im2col GEMMs).
  * BatchNorm epsilon/momentum match tf1.layers defaults (1e-3 / 0.99).
  * The reference stem normalizes over a spatial axis (``axis=1`` on NHWC,
    build_graph.py:68) — an upstream bug we do not reproduce; all BN here is
    per-channel.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config, NUM_ACTIONS


class ResBlock(nn.Module):
    filters: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.filters, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv_a")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn_a")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv_b")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn_b")(y)
        return nn.relu(y + x)


class AZNet(nn.Module):
    """Policy/value network. ``__call__`` returns (policy_logits, value)."""

    blocks: int = 20
    filters: int = 256
    value_hidden: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        x = x.astype(self.dtype)
        x = nn.Conv(self.filters, (3, 3), use_bias=False, dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        for i in range(self.blocks):
            x = ResBlock(self.filters, self.dtype, name=f"block_{i}")(
                x, train)

        p = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="policy_conv")(x)
        p = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="policy_bn")(p)
        p = nn.relu(p).reshape(p.shape[0], -1)
        logits = nn.Dense(NUM_ACTIONS, dtype=self.dtype,
                          name="policy_dense")(p)

        v = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name="value_conv")(x)
        v = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="value_bn")(v)
        v = nn.relu(v).reshape(v.shape[0], -1)
        v = nn.relu(nn.Dense(self.value_hidden, dtype=self.dtype,
                             name="value_dense1")(v))
        v = nn.Dense(1, dtype=self.dtype, name="value_dense2")(v)
        value = jnp.tanh(v.astype(jnp.float32)).squeeze(-1)

        return logits.astype(jnp.float32), value


def build_network(cfg: Config) -> AZNet:
    return AZNet(blocks=cfg.blocks, filters=cfg.filters,
                 value_hidden=cfg.value_hidden)


def init_network(cfg: Config, key: jax.Array):
    """Returns (net, variables) with variables = {params, batch_stats}."""
    net = build_network(cfg)
    dummy = jnp.zeros((1, 7, 6, cfg.num_features), jnp.float32)
    variables = net.init(key, dummy, train=False)
    return net, variables
