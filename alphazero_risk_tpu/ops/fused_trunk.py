"""Pallas TPU kernel: fused residual trunk for the AZNet CNN.

The 20-block residual trunk is where all inference FLOPs live
(reference model: ``python/src/build_graph.py:37-74`` — N blocks of
[conv3x3(256) - BN - ReLU - conv3x3(256) - BN - add - ReLU] on a 7x6
board).  XLA's generic conv lowering reaches only ~40% of the v5e MXU on
this shape (board too small to tile well, one HBM round-trip per conv), so
this kernel:

  * keeps the activation tile **resident in VMEM** across all blocks — HBM
    sees the trunk input once and the trunk output once; block weights are
    streamed (and double-buffered) by the pallas grid pipeline;
  * lowers each 3x3 conv to **9 shifted GEMMs** on a [TB*42, C] matrix:
    with the board flattened row-major, tap (di, dj) is a row shift by
    6*di+dj, so ``pltpu.roll`` + a per-tap validity mask replace im2col —
    no patch materialization, every MAC lands on the MXU;
  * optionally runs the GEMMs in **int8** (per-output-channel folded-BN
    weight scales x one dynamic per-tile activation scale), which doubles
    MXU throughput on v5e;
  * folds BatchNorm into weights/bias ahead of time (inference only — the
    learner trains the plain Flax net; see ``models/fast_infer.py``).

Layout: activations [B*42, C] (board position is folded into rows; C=256
lanes). Grid = (batch_tiles, blocks) with blocks innermost so the residual
scratch carries across a tile's whole trunk.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BOARD_H, BOARD_W = 7, 6
BOARD = BOARD_H * BOARD_W  # 42

# Tap order: row-major over (di, dj) in {-1,0,1}^2. Shift in flattened
# row-major position space: k = 6*di + dj.
TAP_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]
TAP_SHIFTS = [BOARD_W * di + dj for di, dj in TAP_OFFSETS]


def _tap_masks(tile_rows: int) -> np.ndarray:
    """[tile_rows, 9] float32 — 1 where the shifted source position is
    on-board for the destination position (rows are b*42+p).  Taps live in
    the lane dim so the VMEM block is [rows, 9] (a [9, rows, 1] layout
    would pad the lane dim 1 -> 128 and waste ~12MB of VMEM)."""
    p = np.arange(BOARD)
    prow, pcol = p // BOARD_W, p % BOARD_W
    masks = np.zeros((9, BOARD), np.float32)
    for t, (di, dj) in enumerate(TAP_OFFSETS):
        ok = ((prow + di >= 0) & (prow + di < BOARD_H)
              & (pcol + dj >= 0) & (pcol + dj < BOARD_W))
        masks[t] = ok.astype(np.float32)
    reps = tile_rows // BOARD
    return np.tile(masks, (1, reps)).T.copy()


def _conv9_bf16(h, w_taps, masks):
    """h [R, C] f32 -> [R, C] f32: sum of 9 shifted masked GEMMs.

    w_taps [9, C, C] bf16 (tap, in, out).  Mosaic only implements rotates
    on 32-bit data, so the roll happens in f32 and the bf16 cast follows."""
    acc = None
    for t, k in enumerate(TAP_SHIFTS):
        xs = pltpu.roll(h, (-k) % h.shape[0], 0) if k else h
        xs = (xs * masks[:, t:t + 1]).astype(jnp.bfloat16)
        d = jax.lax.dot_general(
            xs, w_taps[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    return acc


def _conv9_int8(h, w9, masks_i):
    """h [R, C] f32 (>= 0 after ReLU) -> ([R, C] int32, scale f32).

    Quantize ONCE per conv (dynamic per-tile symmetric), keep the
    quantized copy in int32 so Mosaic's 32-bit-only rotate applies, then
    assemble all 9 masked shifts into one [R, 9C] int8 matrix and hit the
    MXU with a single GEMM against ``w9`` [9C, C] int8.  Versus a
    quantize-per-tap formulation this does 1/9th of the round/clip VPU
    work and keeps at most one int8 copy of the activations live (the
    per-tap f32 variant kept nine f32 copies live -> scoped-VMEM OOM)."""
    m = jnp.max(jnp.abs(h))
    s = jnp.maximum(m, 1e-6) / 127.0
    q = jnp.clip(jnp.round(h * (1.0 / s)), -127, 127).astype(jnp.int32)
    parts = []
    for t, k in enumerate(TAP_SHIFTS):
        xs = pltpu.roll(q, (-k) % q.shape[0], 0) if k else q
        parts.append((xs * masks_i[:, t:t + 1]).astype(jnp.int8))
    x9 = jnp.concatenate(parts, axis=1)                # [R, 9C] int8
    acc = jax.lax.dot_general(
        x9, w9, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc, s


def _trunk_kernel_bf16(m_ref, x_ref, w_ref, b_ref, out_ref, res_ref):
    masks_c = m_ref
    k = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        res_ref[:] = x_ref[:].astype(jnp.float32)

    x = res_ref[:]
    y = _conv9_bf16(x, w_ref[0], masks_c) + b_ref[0][None, :]
    y = jnp.maximum(y, 0.0)
    z = _conv9_bf16(y, w_ref[1], masks_c) + b_ref[1][None, :]
    res_ref[:] = jnp.maximum(z + x, 0.0)

    @pl.when(k == nb - 1)
    def _():
        out_ref[:] = res_ref[:].astype(out_ref.dtype)


def _trunk_kernel_int8(m_ref, x_ref, w_ref, s_ref, b_ref, out_ref,
                       res_ref):
    masks_i = m_ref[:]
    k = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        res_ref[:] = x_ref[:].astype(jnp.float32)

    x = res_ref[:]
    acc, sx = _conv9_int8(x, w_ref[0], masks_i)
    y = acc.astype(jnp.float32) * (sx * s_ref[0][None, :]) + b_ref[0][None, :]
    y = jnp.maximum(y, 0.0)
    acc2, sy = _conv9_int8(y, w_ref[1], masks_i)
    z = (acc2.astype(jnp.float32) * (sy * s_ref[1][None, :])
         + b_ref[1][None, :])
    res_ref[:] = jnp.maximum(z + x, 0.0)

    @pl.when(k == nb - 1)
    def _():
        out_ref[:] = res_ref[:].astype(out_ref.dtype)


class _Lead:
    """View of a ref whose block has a leading length-1 grid axis."""

    def __init__(self, ref):
        self.ref = ref

    def __getitem__(self, i):
        return self.ref[0, i]


@functools.partial(jax.jit, static_argnames=("tile_b",))
def fused_trunk_bf16(x: jax.Array, w: jax.Array, b: jax.Array,
                     tile_b: int = 32) -> jax.Array:
    """x [B, 42, C] bf16/f32; w [blocks, 2, 9, C, C] bf16; b [blocks, 2, C]
    f32. Returns [B, 42, C] bf16."""
    B, board, C = x.shape
    assert board == BOARD
    blocks = w.shape[0]
    tile_b = min(tile_b, B)
    assert B % tile_b == 0
    rows = tile_b * BOARD
    masks = jnp.asarray(_tap_masks(rows))
    x2 = x.reshape(B * BOARD, C).astype(jnp.bfloat16)

    def kern(m_ref, x_ref, w_ref, b_ref, out_ref, res_ref):
        _trunk_kernel_bf16(m_ref, x_ref, _Lead(w_ref), _Lead(b_ref),
                           out_ref, res_ref)

    out = pl.pallas_call(
        kern,
        grid=(B // tile_b, blocks),
        in_specs=[
            pl.BlockSpec((rows, 9), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, C), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 9, C, C), lambda i, k: (k, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda i, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, C), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * BOARD, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, C), jnp.float32)],
    )(masks, x2, w, b)
    return out.reshape(B, BOARD, C)


@functools.partial(jax.jit, static_argnames=("tile_b",))
def fused_trunk_int8(x: jax.Array, wq: jax.Array, ws: jax.Array,
                     b: jax.Array, tile_b: int = 32) -> jax.Array:
    """x [B, 42, C]; wq [blocks, 2, 9, C, C] int8; ws [blocks, 2, C] f32
    per-output-channel weight scales; b [blocks, 2, C] f32 bias."""
    B, board, C = x.shape
    assert board == BOARD
    blocks = wq.shape[0]
    tile_b = min(tile_b, B)
    assert B % tile_b == 0
    rows = tile_b * BOARD
    masks_i = jnp.asarray(_tap_masks(rows)).astype(jnp.int32)
    x2 = x.reshape(B * BOARD, C).astype(jnp.float32)
    # [blocks, 2, 9, C, C] -> [blocks, 2, 9C, C]: rows ordered (tap, cin),
    # matching the tap-major column order of the kernel's concatenated
    # activation matrix.
    w9 = wq.reshape(blocks, 2, 9 * C, C)

    def kern(m_ref, x_ref, w_ref, s_ref, b_ref, out_ref, res_ref):
        _trunk_kernel_int8(m_ref, x_ref, _Lead(w_ref), _Lead(s_ref),
                           _Lead(b_ref), out_ref, res_ref)

    out = pl.pallas_call(
        kern,
        grid=(B // tile_b, blocks),
        in_specs=[
            pl.BlockSpec((rows, 9), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, C), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 9 * C, C), lambda i, k: (k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda i, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C), lambda i, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, C), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * BOARD, C), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((rows, C), jnp.float32)],
    )(masks_i, x2, w9, ws, b)
    return out.reshape(B, BOARD, C)
