"""Fast inference path: BN-folded bf16 / int8 forward for self-play.

The learner trains the plain Flax ``AZNet`` (``models/resnet.py``); actors
and arenas only ever run inference.  This module folds each BatchNorm into
its preceding conv (inference-only transform) and runs the residual trunk
either in bf16 or quantized to int8 — both on XLA convs.

Why XLA convs and not a hand-written pallas kernel: a VMEM-resident
pallas trunk (9 shift-taps per 3x3 conv via ``pltpu.roll``) was built and
measured in rounds 1-2 — it LOST to plain XLA in every configuration
(BENCH_r02: 82.4K vs 84.1K samples/s bf16; the int8 pallas variant lost
by more because the 9 sublane rotates per conv cost more VPU time than
the MXU saves, while XLA's conv lowering shifts in-register).  XLA
already reaches ~94% of the bf16 matmul roofline on this 7x6x256 shape,
so the kernel was deleted rather than carried as shelf-ware.  The wins
that remain and are kept: BN folding (one fewer elementwise pass per
conv), f32 heads, int8 trunk with static calibrated activation scales
(BENCH_r02: 139K int8 vs 84K bf16 samples/s).

Reference model this accelerates: ``python/src/build_graph.py:37-103``.

Numerics: bf16 path matches the Flax forward to bf16 rounding; the int8
path quantizes trunk weights per-output-channel and activations with
static calibrated scales.  Play strength is certified, not assumed:
int8-vs-bf16 arena with identical weights = 50.3% over 512 mirrored
games (experiments/int8_cert.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import Config

BOARD = 42


def _fold_conv_bn(kernel, bn) -> tuple[jax.Array, jax.Array]:
    """Fold BN(scale,bias,mean,var) into a conv kernel [..., Cout]."""
    s = bn["scale"] / jnp.sqrt(bn["var"] + 1e-3)
    return kernel * s, bn["bias"] - bn["mean"] * s


def fold_params(variables: Dict[str, Any], cfg: Config) -> Dict[str, Any]:
    """Fold {params, batch_stats} of an AZNet into an inference pytree.
    Trunk kernels are stored stacked as [L, 2, 3, 3, C, C] (HWIO)."""
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
        trunk_w.append(jnp.stack([wa, wb]))
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
    w = folded["trunk_w"].astype(jnp.float32)          # [L,2,3,3,C,C]
    ws = jnp.max(jnp.abs(w), axis=(2, 3, 4)) / 127.0   # [L,2,C]
    ws = jnp.maximum(ws, 1e-12)
    wq = jnp.clip(jnp.round(w / ws[:, :, None, None, None, :]), -127, 127)
    return {**folded, "trunk_wq": wq.astype(jnp.int8),
            "trunk_ws": ws.astype(jnp.float32)}


def _stem(folded, x):
    """x [B,7,6,F] -> [B,7,6,C] f32 (post-ReLU)."""
    h = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), folded["stem_w"],
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(h + folded["stem_b"], 0.0)


def _conv_i8(q, w):
    """int8 x int8 -> int32 3x3 SAME conv on the MXU."""
    return jax.lax.conv_general_dilated(
        q, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def _quant_dyn(h):
    """Dynamic per-tensor symmetric quantization."""
    s = jnp.maximum(jnp.max(jnp.abs(h)), 1e-6) / 127.0
    q = jnp.clip(jnp.round(h * (1.0 / s)), -127, 127).astype(jnp.int8)
    return q, s


def _trunk_xla_bf16(folded, h):
    """BN-folded bf16 residual trunk on XLA convs.  h [B,7,6,C] f32."""
    L = folded["trunk_w"].shape[0]
    w = folded["trunk_w"]
    b = folded["trunk_b"]
    for l in range(L):
        x = h
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w[l, 0], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b[l, 0], 0.0)
        z = jax.lax.conv_general_dilated(
            y.astype(jnp.bfloat16), w[l, 1], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        h = jnp.maximum(z + b[l, 1] + x, 0.0)
    return h


def _trunk_xla_int8(folded, h):
    """int8 residual trunk on XLA convs.  h [B,7,6,C] f32 -> same.

    Activation scales: static per-conv if ``act_s`` was calibrated into
    the folded pytree (quantize then fuses into the preceding elementwise
    op — no reduction barrier), dynamic per-tensor otherwise."""
    L = folded["trunk_wq"].shape[0]
    w = folded["trunk_wq"]
    ws = folded["trunk_ws"]
    b = folded["trunk_b"]
    act_s = folded.get("act_s")          # [L, 2] f32 or None
    for l in range(L):
        x = h
        if act_s is None:
            q, s = _quant_dyn(x)
        else:
            s = act_s[l, 0]
            q = jnp.clip(jnp.round(x * (1.0 / s)), -127, 127
                         ).astype(jnp.int8)
        y = _conv_i8(q, w[l, 0]).astype(jnp.float32)
        y = jnp.maximum(y * (s * ws[l, 0]) + b[l, 0], 0.0)
        if act_s is None:
            q2, s2 = _quant_dyn(y)
        else:
            s2 = act_s[l, 1]
            q2 = jnp.clip(jnp.round(y * (1.0 / s2)), -127, 127
                          ).astype(jnp.int8)
        z = _conv_i8(q2, w[l, 1]).astype(jnp.float32)
        z = z * (s2 * ws[l, 1]) + b[l, 1]
        h = jnp.maximum(z + x, 0.0)
    return h


def calibrate_trunk(folded: Dict[str, Any], feats: jax.Array,
                    margin: float = 1.25) -> Dict[str, Any]:
    """Record static per-conv activation scales (max-abs over ``feats``,
    a representative [B,7,6,F] feature batch, times a clipping-safety
    ``margin`` for activations outside the calibration set) into the
    folded pytree.  Returns a new pytree whose int8 path quantizes with
    fused static scales instead of per-batch dynamic reductions."""
    L = folded["trunk_w"].shape[0]
    wbf = folded["trunk_w"]
    b = folded["trunk_b"]

    @jax.jit
    def run(feats):
        h = _stem(folded, feats)
        scales = []
        for l in range(L):
            x = h
            scales.append(jnp.max(jnp.abs(x)))
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), wbf[l, 0], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            y = jnp.maximum(y + b[l, 0], 0.0)
            scales.append(jnp.max(jnp.abs(y)))
            z = jax.lax.conv_general_dilated(
                y.astype(jnp.bfloat16), wbf[l, 1], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            h = jnp.maximum(z + b[l, 1] + x, 0.0)
        return jnp.stack(scales).reshape(L, 2)

    act_max = run(feats)
    act_s = jnp.maximum(act_max * margin, 1e-6) / 127.0
    return {**folded, "act_s": act_s.astype(jnp.float32)}


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


def apply_folded_impl(folded: Dict[str, Any], x: jax.Array, *,
                      int8: bool = False):
    """Forward pass on folded params.  x [B,7,6,F] -> (logits, value).

    NOT jitted: call this from inside your own jitted computation (a
    nested jit is a call boundary that blocks XLA from fusing the
    quantize/rescale elementwise work into neighbors — measured 1.8x
    slower).  ``apply_folded`` is the jitted wrapper for direct use."""
    h = _stem(folded, x)                              # [B,7,6,C]
    h = _trunk_xla_int8(folded, h) if int8 else _trunk_xla_bf16(folded, h)
    # Layout firewall: without it XLA back-propagates the value head's
    # degenerate 1-output-channel contraction layout through the whole
    # trunk (measured 1.8x slowdown on the int8 path).
    h = jax.lax.optimization_barrier(h)
    h = h.reshape(h.shape[0], BOARD, -1)
    return _heads(folded, h)


apply_folded = jax.jit(apply_folded_impl, static_argnames=("int8",))


def make_fast_eval_fn(cfg: Config, *, int8: bool = False):
    """MCTS eval_fn over folded params (drop-in for
    ``training.actor.make_eval_fn`` minus batch_stats plumbing)."""
    from ..env.featurize import featurize

    def eval_fn(folded, state, legal):
        feats = featurize(state, cfg)
        logits, value = apply_folded_impl(folded, feats, int8=int8)
        probs = jax.nn.softmax(jnp.where(legal, logits, -jnp.inf), axis=-1)
        return probs, value

    return eval_fn


def make_fast_paired_eval_fn(cfg: Config, *, int8: bool = False):
    """Two-model eval_fn over folded params for gating arenas: each game's
    leaf is scored by the root mover's own network (drop-in for
    ``training.actor.make_paired_eval_fn``)."""
    from ..env.featurize import featurize

    def eval_fn(folded_a, folded_b, use_a, state, legal):
        feats = featurize(state, cfg)
        la, va = apply_folded_impl(folded_a, feats, int8=int8)
        lb, vb = apply_folded_impl(folded_b, feats, int8=int8)
        logits = jnp.where(use_a[:, None], la, lb)
        value = jnp.where(use_a, va, vb)
        probs = jax.nn.softmax(jnp.where(legal, logits, -jnp.inf), axis=-1)
        return probs, value

    return eval_fn


def default_calib_feats(cfg: Config, key: jax.Array,
                        batch: int = 256) -> jax.Array:
    """Representative feature batch for int8 activation calibration:
    featurized fresh initial states plus uniform noise over the feature
    cube (all planes are [0,1] by construction, so the noise half
    upper-bounds phases/plane combinations the initial states lack)."""
    from ..env.featurize import featurize
    from ..env.state import new_game

    st = new_game(key, batch)
    f1 = featurize(st, cfg)
    f2 = jax.random.uniform(jax.random.fold_in(key, 1), f1.shape)
    return jnp.concatenate([f1, f2], 0)


def fold_for_inference(variables: Dict[str, Any], cfg: Config, *,
                       int8: bool = False,
                       calib_feats: Any = None) -> Dict[str, Any]:
    """One-call fold (+ optional int8 trunk quantization) of live training
    variables into the inference pytree actors consume.  With
    ``calib_feats`` (a representative [B,7,6,F] feature batch), the int8
    path additionally records static activation scales so quantization
    fuses instead of reducing per batch."""
    folded = fold_params(variables, cfg)
    if int8:
        folded = quantize_trunk(folded)
        if calib_feats is not None:
            folded = calibrate_trunk(folded, calib_feats)
    return folded
