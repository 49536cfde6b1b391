"""Box geometry ops, rank-polymorphic over 2D / 3D.

Boxes are ``(..., 4)`` = (y1, x1, y2, x2) or ``(..., 6)`` = (y1, x1, y2, x2,
z1, z2) float arrays, the same corner convention the reference uses throughout
(``utils/model_utils.py:35-425``). All functions are pure jnp and vmap/jit
friendly; the spatial rank is inferred from the trailing axis.

Two IoU conventions exist in the reference and both are preserved:
  * plain IoU (``compute_overlaps``, ``utils/model_utils.py:83-110``) for
    anchor/GT matching, and
  * the legacy +1-pixel convention used *only* inside the CUDA NMS kernels
    (``cuda_functions/nms_2D/src/cuda/nms_kernel.cu:16-23``), exposed here via
    ``pixel_offset=1.0``.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_dim(boxes) -> int:
    """Spatial rank (2 or 3) of a (..., 4|6) box array."""
    n = boxes.shape[-1]
    if n == 4:
        return 2
    if n == 6:
        return 3
    raise ValueError(f"box array must have 4 or 6 trailing coords, got {n}")


def _split_corners(boxes):
    """Return per-axis (lo, hi) corner lists ordered (y, x, (z))."""
    dim = box_dim(boxes)
    lo = [boxes[..., 0], boxes[..., 1]]
    hi = [boxes[..., 2], boxes[..., 3]]
    if dim == 3:
        lo.append(boxes[..., 4])
        hi.append(boxes[..., 5])
    return lo, hi


def box_area(boxes, pixel_offset: float = 0.0):
    """Area (2D) or volume (3D) of boxes; (...,) result.

    ``pixel_offset=1.0`` reproduces the CUDA NMS kernels' (hi-lo+1) area.
    """
    lo, hi = _split_corners(boxes)
    area = jnp.ones(boxes.shape[:-1], dtype=boxes.dtype)
    for l, h in zip(lo, hi):
        area = area * (h - l + pixel_offset)
    return area


def pairwise_iou(boxes1, boxes2, pixel_offset: float = 0.0):
    """IoU matrix between two box sets: (N, 2*dim), (M, 2*dim) -> (N, M).

    Semantics of the reference's ``compute_overlaps`` (plain, offset 0) and of
    its CUDA NMS ``devIoU`` (offset 1). Degenerate boxes yield IoU 0 via the
    max(., 0) clamps; a 0/0 union is guarded to avoid NaN.
    """
    lo1, hi1 = _split_corners(boxes1)
    lo2, hi2 = _split_corners(boxes2)
    inter = None
    for l1, h1, l2, h2 in zip(lo1, hi1, lo2, hi2):
        seg = jnp.maximum(
            jnp.minimum(h1[:, None], h2[None, :]) - jnp.maximum(l1[:, None], l2[None, :]) + pixel_offset,
            0.0,
        )
        inter = seg if inter is None else inter * seg
    area1 = box_area(boxes1, pixel_offset)
    area2 = box_area(boxes2, pixel_offset)
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def apply_box_deltas(boxes, deltas):
    """Decode (dy, dx, (dz), log dh, log dw, (log dd)) deltas onto boxes.

    Matches ``apply_box_deltas_2D/3D`` (``utils/model_utils.py:318-370``):
    center += delta * size; size *= exp(log-delta). Works on any leading dims.
    """
    dim = box_dim(boxes)
    lo, hi = _split_corners(boxes)
    out = [None] * (2 * dim)
    for ax in range(dim):
        size = hi[ax] - lo[ax]
        center = lo[ax] + 0.5 * size
        center = center + deltas[..., ax] * size
        size = size * jnp.exp(deltas[..., dim + ax])
        new_lo = center - 0.5 * size
        new_hi = new_lo + size
        if ax < 2:
            out[2 * ax] = new_lo
            out[2 * ax + 1] = new_hi
        else:  # z coords trail: (y1, x1, y2, x2, z1, z2)
            out[4] = new_lo
            out[5] = new_hi
    if dim == 2:
        stacked = [out[0], out[2], out[1], out[3]]
    else:
        stacked = [out[0], out[2], out[1], out[3], out[4], out[5]]
    return jnp.stack(stacked, axis=-1)


def box_refinement(boxes, gt_boxes):
    """Encode the delta taking ``boxes`` onto ``gt_boxes``.

    Inverse of ``apply_box_deltas``; matches ``box_refinement``
    (``utils/model_utils.py:114-143``). Output layout
    (dy, dx, (dz), log dh, log dw, (log dd)).
    """
    dim = box_dim(boxes)
    lo, hi = _split_corners(boxes)
    glo, ghi = _split_corners(gt_boxes)
    centers, logs = [], []
    for ax in range(dim):
        size = hi[ax] - lo[ax]
        center = lo[ax] + 0.5 * size
        gsize = ghi[ax] - glo[ax]
        gcenter = glo[ax] + 0.5 * gsize
        centers.append((gcenter - center) / size)
        logs.append(jnp.log(gsize / size))
    return jnp.stack(centers + logs, axis=-1)


def clip_boxes(boxes, window):
    """Clip box corners to a window (y1, x1, y2, x2, (z1, z2)).

    Matches ``clip_boxes_2D/3D`` / ``clip_to_window``
    (``utils/model_utils.py:374-398,623-637``).
    """
    window = jnp.asarray(window, dtype=boxes.dtype)
    dim = box_dim(boxes)
    cols = [
        jnp.clip(boxes[..., 0], window[0], window[2]),
        jnp.clip(boxes[..., 1], window[1], window[3]),
        jnp.clip(boxes[..., 2], window[0], window[2]),
        jnp.clip(boxes[..., 3], window[1], window[3]),
    ]
    if dim == 3:
        cols.append(jnp.clip(boxes[..., 4], window[4], window[5]))
        cols.append(jnp.clip(boxes[..., 5], window[4], window[5]))
    return jnp.stack(cols, axis=-1)


def clip_boxes_to_shape(boxes, shape):
    """Clip boxes to an image shape (y, x, (z)); numpy-spec variant.

    Matches ``clip_boxes_numpy`` (``utils/model_utils.py:402-425``) including
    its quirk of clipping y1/x1 both against shape[0] in 2D — we instead use
    the obviously-intended per-axis clip (y against shape[0], x against
    shape[1]); the quirk only matters for non-square images where boxes
    already exceed bounds by more than the image asymmetry.
    """
    dim = box_dim(boxes)
    if dim == 2:
        window = (0.0, 0.0, float(shape[0]), float(shape[1]))
    else:
        window = (0.0, 0.0, float(shape[0]), float(shape[1]), 0.0, float(shape[2]))
    return clip_boxes(boxes, window)


def normalize_boxes(boxes, image_shape):
    """Pixel -> normalized [0, 1] coords (divide each axis by its extent)."""
    return boxes / _shape_scale(boxes, image_shape)


def denormalize_boxes(boxes, image_shape):
    """Normalized [0, 1] -> pixel coords."""
    return boxes * _shape_scale(boxes, image_shape)


def _shape_scale(boxes, image_shape):
    dim = box_dim(boxes)
    if dim == 2:
        s = [image_shape[0], image_shape[1]] * 2
    else:
        s = [image_shape[0], image_shape[1]] * 2 + [image_shape[2]] * 2
    return jnp.asarray(s, dtype=boxes.dtype)
