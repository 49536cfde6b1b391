"""Pallas TPU kernel for fixed-shape greedy NMS (2D + 3D).

Native-kernel counterpart of ``ops/nms.py`` (the XLA formulation), replacing
the reference's CUDA bitmask NMS (``cuda_functions/nms_2D/src/cuda/
nms_kernel.cu``). Same numerics: +1-pixel IoU convention, strict-> suppression,
score order with ties toward lower index.

Kernel shape: one grid lane per (batch element x class) NMS problem; per
lane the candidate coordinates/scores live in VMEM as (1, N) rows (lanes
along N), and a ``max_output``-step select-and-suppress loop runs entirely
on-chip — argmax (VPU reduction) + one fused IoU row per kept box, no HBM
round-trips between iterations. N is padded to a multiple of 128 by the
wrapper; invalid slots carry -inf scores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _nms_kernel_factory(dim: int, max_output: int, n: int, pixel_offset: float):
    def kernel(coords_ref, scores_ref, thresh_ref, idx_ref, mask_ref, active):
        # coords_ref: (1, n_coords, N) | scores_ref: (1, 1, N)
        # idx_ref/mask_ref: (1, 1, max_output) int32 | active: VMEM (1, N)
        active[:] = scores_ref[0]
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), dimension=1)
        out_cols = jax.lax.broadcasted_iota(jnp.int32, (1, max_output), dimension=1)
        thresh = thresh_ref[0]

        def body(i, carry):
            idx_acc, mask_acc = carry
            row = active[:]  # (1, n)
            best_score = jnp.max(row)
            best = jnp.argmax(row).astype(jnp.int32)  # flat == column (1 row)
            best_ok = best_score > NEG_INF
            onehot = col_ids == best  # winner extraction without dynamic_slice

            inter = jnp.ones((1, n), jnp.float32)
            area_b = jnp.float32(1.0)
            area_all = jnp.ones((1, n), jnp.float32)
            for ax in range(dim):
                lo_i, hi_i = (0, 2) if ax == 0 else (1, 3) if ax == 1 else (4, 5)
                lo = coords_ref[0, lo_i, :].reshape(1, n)
                hi = coords_ref[0, hi_i, :].reshape(1, n)
                blo = jnp.sum(jnp.where(onehot, lo, 0.0))
                bhi = jnp.sum(jnp.where(onehot, hi, 0.0))
                seg = jnp.minimum(bhi, hi) - jnp.maximum(blo, lo) + pixel_offset
                inter = inter * jnp.maximum(seg, 0.0)
                area_b = area_b * (bhi - blo + pixel_offset)
                area_all = area_all * (hi - lo + pixel_offset)
            union = area_b + area_all - inter
            iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

            kill = (iou > thresh) | onehot
            active[:] = jnp.where(best_ok & kill, NEG_INF, active[:])
            # accumulate results in loop-carried vectors (Mosaic requires
            # lane-aligned ref stores; a single aligned store happens at the end)
            slot = out_cols == i
            idx_acc = jnp.where(slot, jnp.where(best_ok, best, -1), idx_acc)
            mask_acc = jnp.where(slot, best_ok.astype(jnp.int32), mask_acc)
            return idx_acc, mask_acc

        init = (
            jnp.full((1, max_output), -1, jnp.int32),
            jnp.zeros((1, max_output), jnp.int32),
        )
        idx_acc, mask_acc = jax.lax.fori_loop(0, max_output, body, init)
        idx_ref[0] = idx_acc
        mask_ref[0] = mask_acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("max_output", "pixel_offset", "interpret")
)
def nms_pallas(boxes, scores, iou_threshold, max_output: int, valid=None, pixel_offset: float = 1.0,
               interpret: bool = False):
    """Batched greedy NMS on TPU via Pallas.

    boxes: (L, N, 4|6); scores: (L, N); valid: optional (L, N) bool.
    Returns (keep_idx (L, max_output) int32 [-1 padded], keep_mask (L,
    max_output) bool). Semantics identical to ``ops.nms.batched_nms``.
    """
    L, N = scores.shape
    dim = 2 if boxes.shape[-1] == 4 else 3
    n_pad = (-N) % 128
    n = N + n_pad

    scores_f = scores.astype(jnp.float32)
    if valid is not None:
        scores_f = jnp.where(valid, scores_f, NEG_INF)
    scores_f = jnp.pad(scores_f, ((0, 0), (0, n_pad)), constant_values=NEG_INF)[:, None]  # (L, 1, n)
    coords = jnp.moveaxis(boxes.astype(jnp.float32), -1, 1)  # (L, 2d, N)
    coords = jnp.pad(coords, ((0, 0), (0, 0), (0, n_pad)))

    kernel = _nms_kernel_factory(dim, max_output, n, pixel_offset)
    thresh = jnp.full((1,), iou_threshold, jnp.float32)

    idx, mask = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, 2 * dim, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, max_output), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, max_output), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, 1, max_output), jnp.int32),
            jax.ShapeDtypeStruct((L, 1, max_output), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, n), jnp.float32)],
        interpret=interpret,
    )(coords, scores_f, thresh)

    return idx[:, 0], mask[:, 0].astype(bool)
