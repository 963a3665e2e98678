"""Fast inference path: BN-folded, pallas-fused forward for self-play.

The learner trains the plain Flax ``AZNet`` (``models/resnet.py``); actors
and arenas only ever run inference.  This module folds each BatchNorm into
its preceding conv (inference-only transform), re-lays the 3x3 trunk convs
out as 9 shift-taps, and evaluates the trunk with the VMEM-resident pallas
kernel (``ops/fused_trunk.py``) in bf16 or int8.  Stem and heads are a few
small matmuls and stay in plain XLA.

Reference model this accelerates: ``python/src/build_graph.py:37-103``
(the reference pays one HBM round-trip per conv through TF; here the trunk
touches HBM once in, once out).

Numerics: bf16 path matches the Flax forward to bf16 rounding; the int8
path quantizes trunk weights per-output-channel and activations per-tile
(dynamic symmetric).  Use ``tests/test_fast_infer.py``'s agreement metrics
before trusting a new variant.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.fused_trunk import fused_trunk_bf16, fused_trunk_int8

BOARD = 42


def _fold_conv_bn(kernel, bn) -> tuple[jax.Array, jax.Array]:
    """Fold BN(scale,bias,mean,var) into a conv kernel [..., Cout]."""
    s = bn["scale"] / jnp.sqrt(bn["var"] + 1e-3)
    return kernel * s, bn["bias"] - bn["mean"] * s


def _taps(kernel: jax.Array) -> jax.Array:
    """[3,3,C,C] HWIO -> [9,C,C] in the kernel's row-major tap order."""
    return kernel.reshape(9, kernel.shape[2], kernel.shape[3])


def fold_params(variables: Dict[str, Any], cfg: Config) -> Dict[str, Any]:
    """Fold {params, batch_stats} of an AZNet into an inference pytree."""
    p, bs = variables["params"], variables["batch_stats"]

    def bn(name):
        return {**p[name], **bs[name]}

    stem_w, stem_b = _fold_conv_bn(p["stem_conv"]["kernel"], bn("stem_bn"))

    trunk_w, trunk_b = [], []
    for i in range(cfg.blocks):
        blk = p[f"block_{i}"]
        bsb = bs[f"block_{i}"]
        wa, ba = _fold_conv_bn(blk["conv_a"]["kernel"],
                               {**blk["bn_a"], **bsb["bn_a"]})
        wb, bb = _fold_conv_bn(blk["conv_b"]["kernel"],
                               {**blk["bn_b"], **bsb["bn_b"]})
        trunk_w.append(jnp.stack([_taps(wa), _taps(wb)]))
        trunk_b.append(jnp.stack([ba, bb]))

    pol_w, pol_b = _fold_conv_bn(p["policy_conv"]["kernel"],
                                 bn("policy_bn"))
    val_w, val_b = _fold_conv_bn(p["value_conv"]["kernel"], bn("value_bn"))

    folded = {
        "stem_w": stem_w.astype(jnp.bfloat16),
        "stem_b": stem_b.astype(jnp.float32),
        "trunk_w": jnp.stack(trunk_w).astype(jnp.bfloat16),
        "trunk_b": jnp.stack(trunk_b).astype(jnp.float32),
        "pol_w": pol_w[0, 0].astype(jnp.float32),      # [C, 2]
        "pol_b": pol_b.astype(jnp.float32),
        "pol_dense_w": p["policy_dense"]["kernel"].astype(jnp.float32),
        "pol_dense_b": p["policy_dense"]["bias"].astype(jnp.float32),
        "val_w": val_w[0, 0].astype(jnp.float32),      # [C, 1]
        "val_b": val_b.astype(jnp.float32),
        "val_d1_w": p["value_dense1"]["kernel"].astype(jnp.float32),
        "val_d1_b": p["value_dense1"]["bias"].astype(jnp.float32),
        "val_d2_w": p["value_dense2"]["kernel"].astype(jnp.float32),
        "val_d2_b": p["value_dense2"]["bias"].astype(jnp.float32),
    }
    return folded


def quantize_trunk(folded: Dict[str, Any]) -> Dict[str, Any]:
    """Add int8 trunk weights: per-output-channel symmetric scales."""
    w = folded["trunk_w"].astype(jnp.float32)          # [L,2,9,C,C]
    ws = jnp.max(jnp.abs(w), axis=(2, 3)) / 127.0      # [L,2,C]
    ws = jnp.maximum(ws, 1e-12)
    wq = jnp.clip(jnp.round(w / ws[:, :, None, None, :]), -127, 127)
    return {**folded, "trunk_wq": wq.astype(jnp.int8),
            "trunk_ws": ws.astype(jnp.float32)}


def _stem(folded, x):
    """x [B,7,6,F] -> [B,42,C] f32 (post-ReLU)."""
    h = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), folded["stem_w"],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    h = jnp.maximum(h + folded["stem_b"], 0.0)
    return h.reshape(h.shape[0], BOARD, -1)


def _heads(folded, h):
    """h [B,42,C] -> (logits [B,43] f32, value [B] f32)."""
    hf = h.astype(jnp.float32)
    p = jnp.maximum(jnp.einsum("bpc,ck->bpk", hf, folded["pol_w"])
                    + folded["pol_b"], 0.0)
    p = p.reshape(p.shape[0], -1)                      # [B, 84] (pos, ch)
    logits = p @ folded["pol_dense_w"] + folded["pol_dense_b"]

    v = jnp.maximum(jnp.einsum("bpc,ck->bpk", hf, folded["val_w"])
                    + folded["val_b"], 0.0)
    v = v.reshape(v.shape[0], -1)                      # [B, 42]
    v = jnp.maximum(v @ folded["val_d1_w"] + folded["val_d1_b"], 0.0)
    v = v @ folded["val_d2_w"] + folded["val_d2_b"]
    return logits, jnp.tanh(v).squeeze(-1)


@functools.partial(jax.jit, static_argnames=("int8", "tile_b"))
def apply_folded(folded: Dict[str, Any], x: jax.Array, *,
                 int8: bool = False, tile_b: int = 32):
    """Forward pass on folded params.  x [B,7,6,F] -> (logits, value)."""
    h = _stem(folded, x)
    # B is static under jit; shrink the tile to a divisor of B so any batch
    # size works (pallas batch tiles must divide the batch).
    tb = pick_tile_b(x.shape[0], tile_b)
    if int8:
        h = fused_trunk_int8(h, folded["trunk_wq"], folded["trunk_ws"],
                             folded["trunk_b"], tile_b=tb)
    else:
        h = fused_trunk_bf16(h, folded["trunk_w"], folded["trunk_b"],
                             tile_b=tb)
    return _heads(folded, h)


def make_fast_eval_fn(cfg: Config, *, int8: bool = False,
                      tile_b: int = 32):
    """MCTS eval_fn over folded params (drop-in for
    ``training.actor.make_eval_fn`` minus batch_stats plumbing)."""
    from ..env.featurize import featurize

    def eval_fn(folded, state, legal):
        feats = featurize(state, cfg)
        logits, value = apply_folded(folded, feats, int8=int8,
                                     tile_b=tile_b)
        probs = jax.nn.softmax(jnp.where(legal, logits, -jnp.inf), axis=-1)
        return probs, value

    return eval_fn


def make_fast_paired_eval_fn(cfg: Config, *, int8: bool = False,
                             tile_b: int = 32):
    """Two-model eval_fn over folded params for gating arenas: each game's
    leaf is scored by the root mover's own network (drop-in for
    ``training.actor.make_paired_eval_fn``)."""
    from ..env.featurize import featurize

    def eval_fn(folded_a, folded_b, use_a, state, legal):
        feats = featurize(state, cfg)
        la, va = apply_folded(folded_a, feats, int8=int8, tile_b=tile_b)
        lb, vb = apply_folded(folded_b, feats, int8=int8, tile_b=tile_b)
        logits = jnp.where(use_a[:, None], la, lb)
        value = jnp.where(use_a, va, vb)
        probs = jax.nn.softmax(jnp.where(legal, logits, -jnp.inf), axis=-1)
        return probs, value

    return eval_fn


def fold_for_inference(variables: Dict[str, Any], cfg: Config, *,
                       int8: bool = False) -> Dict[str, Any]:
    """One-call fold (+ optional int8 trunk quantization) of live training
    variables into the inference pytree actors consume."""
    folded = fold_params(variables, cfg)
    if int8:
        folded = quantize_trunk(folded)
    return folded


def pick_tile_b(batch: int, preferred: int = 32) -> int:
    """Largest divisor of ``batch`` that is <= preferred (pallas tiles must
    divide the batch)."""
    t = min(preferred, batch)
    while batch % t:
        t -= 1
    return t
