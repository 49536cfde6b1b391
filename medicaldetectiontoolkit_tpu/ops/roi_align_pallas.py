"""Pallas TPU kernel for FPN level-routed RoIAlign (pyramid crop_and_resize).

Native-kernel counterpart of ``ops/roi_align.py`` + the pyramid level routing
in ``models/mrcnn.py`` (reference numerics:
``cuda_functions/roi_align_3D/roi_align/src/cuda/crop_and_resize_kernel.cu``
lines 20-150 forward, 153-304 backward; level assignment
``/root/reference/models/mrcnn.py:403``).

Why a kernel: the XLA formulation crops every RoI from EVERY pyramid level
and masks (fixed shapes force it), materializing (R, crop_h, W_l, Z_l, C)
row intermediates in HBM for each of the 4 levels — gigabytes of write+read
traffic per Mask R-CNN step. Here the Pallas pipeline itself streams exactly
the two feature rows each output row needs, from exactly the assigned level:

  * the feature pyramid is padded + stacked into one (L, B, maxH, maxW,
    (maxZ,) C) array so a single BlockSpec can address any level;
  * per-RoI level / batch / floor-ceil row indices are *scalar-prefetched*,
    and the row BlockSpec index_maps read them — the pipeline double-buffers
    the row DMAs across the (R, crop_h) grid with zero manual DMA code, and
    skips the fetch entirely when consecutive grid steps need the same row;
  * x/z corners are resolved by dynamic in-VMEM gathers; interpolation
    weights ride along as scalar-prefetched f32.

Numerics are identical to ``ops/roi_align.py`` (half-pixel ``scale/2 - 0.5``
sampling, coordinate clamping, floor/ceil lerp) because the per-axis
coordinates are computed by the same host-side helper. The backward pass is
a custom VJP that differentiates the XLA formulation (scatter-add into the
feature maps, boxes/indices non-differentiable) — bit-identical gradients to
the oracle path, matching the reference's atomicAdd backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from medicaldetectiontoolkit_tpu.ops import roi_align as roi_xla


def _level_axis_indices(boxes, levels_idx, crop: int, sizes, lo_col: int, hi_col: int):
    """floor/ceil indices + lerp weights on the assigned level's grid.

    boxes: (R, 2*dim) normalized; levels_idx: (R,) int32; sizes: per-level
    axis extents. Returns (idx0, idx1) int32 (R, crop) and lerp f32 (R, crop).
    """
    idx0 = jnp.zeros((boxes.shape[0], crop), jnp.int32)
    idx1 = jnp.zeros_like(idx0)
    lerp = jnp.zeros((boxes.shape[0], crop), jnp.float32)
    for lvl, size in enumerate(sizes):
        coords = roi_xla._axis_coords(
            boxes[:, lo_col].astype(jnp.float32), boxes[:, hi_col].astype(jnp.float32), crop, int(size)
        )
        i0, i1, lw = roi_xla._lerp_weights(coords, int(size))
        sel = (levels_idx == lvl)[:, None]
        idx0 = jnp.where(sel, i0, idx0)
        idx1 = jnp.where(sel, i1, idx1)
        lerp = jnp.where(sel, lw, lerp)
    return idx0, idx1, lerp


def pyramid_roi_align_xla(feature_maps, boxes, box_indices, levels_idx, crop_size):
    """Crop-every-level-and-select XLA formulation (oracle + VJP source)."""
    pooled = None
    for lvl, fmap in enumerate(feature_maps):
        crop = roi_xla.roi_align(fmap, boxes, box_indices, tuple(crop_size))
        sel = (levels_idx == lvl).reshape((-1,) + (1,) * (crop.ndim - 1))
        masked = jnp.where(sel, crop, 0.0)
        pooled = masked if pooled is None else pooled + masked
    return pooled


def _pyramid_kernel_factory(dim: int, crop_size, out_dtype):
    if dim == 3:
        ch, cw, cz = crop_size
    else:
        ch, cw = crop_size

    def kernel(lvl_ref, bix_ref, y0_ref, y1_ref, ly_ref, x0_ref, x1_ref, lx_ref,
               *rest):
        if dim == 3:
            z0_ref, z1_ref, lz_ref, row0_ref, row1_ref, out_ref, col_ref = rest
        else:
            row0_ref, row1_ref, out_ref = rest
        r = pl.program_id(0)
        j = pl.program_id(1)
        # all (crop, R) index/lerp arrays are transposed so their minor dim
        # is R: Mosaic pads a 2D SMEM operand's minor dim to 128 lanes, which
        # blew a (R, 7) array up to (R, 128) and overflowed SMEM on hardware
        ly = ly_ref[j, r].astype(out_dtype)

        for ox in range(cw):
            x0 = x0_ref[ox, r]
            x1 = x1_ref[ox, r]
            lx = lx_ref[ox, r].astype(out_dtype)
            if dim == 3:
                # rows: (1, 1, 1, maxW, maxZ, C); gather the two x-columns.
                # Lerp y first, then x, then z — the exact association of the
                # XLA oracle, for bit-identical outputs.
                a00 = row0_ref[0, 0, 0, pl.ds(x0, 1)][0]  # (maxZ, C)
                a01 = row0_ref[0, 0, 0, pl.ds(x1, 1)][0]
                a10 = row1_ref[0, 0, 0, pl.ds(x0, 1)][0]
                a11 = row1_ref[0, 0, 0, pl.ds(x1, 1)][0]
                colx0 = a00 * (1 - ly) + a10 * ly
                colx1 = a01 * (1 - ly) + a11 * ly
                # stage in VMEM scratch: Mosaic supports dynamic slicing on
                # refs, not on computed arrays
                col_ref[:] = colx0 * (1 - lx) + colx1 * lx  # (maxZ, C)
                for oz in range(cz):
                    z0 = z0_ref[oz, r]
                    z1 = z1_ref[oz, r]
                    lz = lz_ref[oz, r].astype(out_dtype)
                    front = col_ref[pl.ds(z0, 1)]  # (1, C)
                    back = col_ref[pl.ds(z1, 1)]
                    out_ref[0, 0, ox, oz, :] = (front * (1 - lz) + back * lz)[0]
            else:
                # rows: (1, 1, 1, maxW, C); y-lerp first (oracle association)
                a0 = row0_ref[0, 0, 0, pl.ds(x0, 1)][0]  # (C,)
                a1 = row0_ref[0, 0, 0, pl.ds(x1, 1)][0]
                b0 = row1_ref[0, 0, 0, pl.ds(x0, 1)][0]
                b1 = row1_ref[0, 0, 0, pl.ds(x1, 1)][0]
                colx0 = a0 * (1 - ly) + b0 * ly
                colx1 = a1 * (1 - ly) + b1 * ly
                out_ref[0, 0, ox, :] = colx0 * (1 - lx) + colx1 * lx

    return kernel


# scalar-prefetch operands live in SMEM (1 MB per core); cap the per-call
# footprint well below that and chunk the roi axis when it would exceed it
# (first real-hardware compile failed with a 5 MB prefetch operand at
# Mask R-CNN's classify-all size, R = batch * post_nms_rois = 10000)
_MAX_SMEM_BYTES = 400_000


def _bytes_per_roi(crop_size):
    # levels_idx + batch_ix (2 int32) + per-axis (idx0, idx1, lerp) rows
    return 4 * (2 + 3 * sum(crop_size))


@functools.partial(jax.jit, static_argnames=("crop_size", "interpret"))
def pyramid_roi_align_pallas(feature_maps, boxes, box_indices, levels_idx, crop_size,
                             interpret: bool = False):
    """Level-routed RoIAlign over an FPN pyramid, one fused Pallas program.

    feature_maps: list of (B, H_l, W_l, (Z_l,) C), channel-last.
    boxes: (R, 2*dim) normalized [0, 1]; box_indices: (R,) int32 batch ids;
    levels_idx: (R,) int32 in [0, len(feature_maps)).
    Returns (R, *crop_size, C) crops, same numerics as
    ``pyramid_roi_align_xla``. Large R is split into SMEM-sized chunks that
    reuse one compiled kernel.
    """
    boxes = jax.lax.stop_gradient(boxes)
    dim = len(crop_size)
    L = len(feature_maps)
    R = boxes.shape[0]
    C = feature_maps[0].shape[-1]
    dtype = feature_maps[0].dtype
    if dtype in (jnp.bfloat16, jnp.float16):
        # The kernel's dynamic-row z-gather (vector.load on the VMEM scratch)
        # only proves sublane alignment for f32's (8, 128) tiling — bf16's
        # (16, 128) packing fails Mosaic's multiple-of-8 check. Run the kernel
        # in f32; this also matches the XLA oracle's output dtype (bf16
        # features x f32 lerp weights promote to f32), so the forward dtype is
        # identical across backends and the custom VJP sees consistent avals.
        dtype = jnp.float32
        feature_maps = [fm.astype(jnp.float32) for fm in feature_maps]
    spatial = [fm.shape[1 : 1 + dim] for fm in feature_maps]
    max_sp = tuple(max(s[ax] for s in spatial) for ax in range(dim))

    stacked = jnp.stack(
        [
            jnp.pad(fm, [(0, 0)] + [(0, max_sp[ax] - fm.shape[1 + ax]) for ax in range(dim)] + [(0, 0)])
            for fm in feature_maps
        ]
    )  # (L, B, maxH, maxW, (maxZ,) C)

    levels_idx = levels_idx.astype(jnp.int32)
    box_indices = box_indices.astype(jnp.int32)
    y0, y1, ly = _level_axis_indices(boxes, levels_idx, crop_size[0], [s[0] for s in spatial], 0, 2)
    x0, x1, lx = _level_axis_indices(boxes, levels_idx, crop_size[1], [s[1] for s in spatial], 1, 3)
    scalars = [levels_idx, box_indices, y0, y1, ly, x0, x1, lx]
    if dim == 3:
        z0, z1, lz = _level_axis_indices(boxes, levels_idx, crop_size[2], [s[2] for s in spatial], 4, 5)
        scalars += [z0, z1, lz]

    chunk = max(1, _MAX_SMEM_BYTES // _bytes_per_roi(crop_size))
    if R > chunk:
        n_chunks = -(-R // chunk)
        pad = n_chunks * chunk - R
        padded = [jnp.pad(s, [(0, pad)] + [(0, 0)] * (s.ndim - 1)) for s in scalars]
        parts = [
            _pyramid_call(stacked, [s[i * chunk : (i + 1) * chunk] for s in padded],
                          crop_size, max_sp, C, dtype, interpret)
            for i in range(n_chunks)
        ]
        return jnp.concatenate(parts)[:R]
    return _pyramid_call(stacked, scalars, crop_size, max_sp, C, dtype, interpret)


def _pyramid_call(stacked, scalars, crop_size, max_sp, C, dtype, interpret):
    dim = len(crop_size)
    R = scalars[0].shape[0]
    # (R, crop) -> (crop, R): keep the big dim minor in SMEM (see kernel note)
    scalars = [s.T if s.ndim == 2 else s for s in scalars]
    # row blocks: pipeline fetches exactly the (level, batch, y-row) each
    # grid step needs, addressed via the scalar-prefetched index arrays
    row_block = (1, 1, 1) + max_sp[1:] + (C,)

    def row_map(which):
        if dim == 3:
            return lambda r, j, lvl, bix, yy0, yy1, *_: (
                lvl[r], bix[r], (yy0 if which == 0 else yy1)[j, r], 0, 0, 0)
        return lambda r, j, lvl, bix, yy0, yy1, *_: (
            lvl[r], bix[r], (yy0 if which == 0 else yy1)[j, r], 0, 0)

    out_block = (1, 1) + tuple(crop_size[1:]) + (C,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(R, crop_size[0]),
        in_specs=[
            pl.BlockSpec(row_block, row_map(0)),
            pl.BlockSpec(row_block, row_map(1)),
        ],
        out_specs=pl.BlockSpec(out_block, lambda r, j, *_: (r, j) + (0,) * dim),
        # Mosaic supports dynamic slicing on refs but not on computed values;
        # 3D stages the x-resolved column here for the z-gather
        scratch_shapes=[pltpu.VMEM((max_sp[2], C), dtype)] if dim == 3 else [],
    )

    kernel = _pyramid_kernel_factory(dim, tuple(crop_size), dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, crop_size[0]) + tuple(crop_size[1:]) + (C,), dtype),
        interpret=interpret,
    )(*scalars, stacked, stacked)
    return out


def _use_pallas():
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover - backend probing must never crash
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pyramid_roi_align(feature_maps, boxes, box_indices, levels_idx, crop_size):
    """Auto-dispatched pyramid RoIAlign: Pallas kernel on TPU, XLA elsewhere.

    Differentiable w.r.t. the feature maps only (reference contract,
    ``crop_and_resize.py:51``); backward is the XLA formulation's VJP
    (scatter-add), so gradients are identical on every backend.
    """
    if _use_pallas():
        return pyramid_roi_align_pallas(feature_maps, boxes, box_indices, levels_idx, crop_size)
    return pyramid_roi_align_xla(feature_maps, boxes, box_indices, levels_idx, crop_size)


def _pyramid_fwd(feature_maps, boxes, box_indices, levels_idx, crop_size):
    out = pyramid_roi_align(feature_maps, boxes, box_indices, levels_idx, crop_size)
    return out, (feature_maps, boxes, box_indices, levels_idx)


def _pyramid_bwd(crop_size, residuals, g):
    feature_maps, boxes, box_indices, levels_idx = residuals
    out, vjp = jax.vjp(
        lambda fms: pyramid_roi_align_xla(fms, boxes, box_indices, levels_idx, crop_size),
        feature_maps,
    )
    # Dtype alignment: the XLA oracle promotes to the lerp weights' dtype
    # (bf16 features x f32 boxes -> f32 crops) while the Pallas forward
    # preserves the feature dtype, so with bf16 feature maps the incoming
    # cotangent is bf16 but the oracle's pullback expects f32. Cast the
    # cotangent to the oracle's output dtype; the pullback itself returns
    # cotangents matching the feature maps' own avals.
    (d_fms,) = vjp(g.astype(out.dtype))
    return d_fms, None, None, None


pyramid_roi_align.defvjp(_pyramid_fwd, _pyramid_bwd)
