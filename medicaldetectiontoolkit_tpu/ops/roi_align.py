"""RoIAlign (TF-style crop_and_resize), 2D bilinear + 3D trilinear.

TPU-native replacement for the reference's CUDA extensions
(``cuda_functions/roi_align_2D/roi_align/src/cuda/crop_and_resize_kernel.cu``
and the 3D variant). Numerics preserved exactly:

  * per-axis source coordinate for output cell ``i`` of ``crop > 1`` cells:
    ``lo * S + i * scale + scale/2 - 0.5`` with ``scale = (hi - lo) * S / crop``
    (the half-pixel-corrected variant, see kernel lines 41-74), where
    (lo, hi) are the box corners normalized to [0, 1] and S the source extent;
  * for ``crop == 1``: the box-center sample ``0.5 * (lo + hi) * S``;
  * the *coordinate* (not the index) is clamped to [0, S-1] before linear
    interpolation between floor/ceil neighbors — single sample per cell, no
    max-pool (also asserted at ``models/mrcnn.py:427-436``).

Instead of a scalar per-output-element CUDA loop, interpolation is expressed
as separable per-axis gathers + lerps, which XLA lowers to batched gathers and
fused VPU ops; the backward pass (scatter-add into the feature map, matching
the reference's atomicAdd backward kernel) comes from autodiff of the gather.
Gradients flow to the image only — boxes and indices are integer/stop-gradient
consumers, matching ``crop_and_resize.py:51``'s (grad_image, None, None).

Layout is channel-last (B, y, x, (z), C) — the TPU-friendly layout used
throughout this framework (the reference is NCHW(Z)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _axis_coords(lo, hi, crop: int, size: int):
    """Source coords for one axis; lo/hi (N,) normalized, returns (N, crop)."""
    if crop > 1:
        scale = (hi - lo) * size / crop  # (N,)
        cells = jnp.arange(crop, dtype=lo.dtype)
        coords = lo[:, None] * size + cells[None, :] * scale[:, None] + scale[:, None] / 2 - 0.5
    else:
        coords = (0.5 * (lo + hi) * size)[:, None]
    return jnp.clip(coords, 0.0, float(size - 1))


def _lerp_weights(coords, size: int):
    """floor index, +1-clamped index and lerp weight for linear interp."""
    idx0 = jnp.floor(coords)
    lerp = coords - idx0
    idx0 = idx0.astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, size - 1)
    return idx0, idx1, lerp


@functools.partial(jax.jit, static_argnames=("crop_size",))
def roi_align(image, boxes, box_indices, crop_size):
    """Crop-and-resize rois out of a feature map.

    Args:
      image: (B, H, W, C) or (B, H, W, Z, C) feature map, channel-last.
      boxes: (N, 4|6) boxes in normalized [0, 1] coords (y1, x1, y2, x2,
        (z1, z2)). Not differentiated (stop_gradient applied).
      box_indices: (N,) int32 batch element per box.
      crop_size: static tuple (ch, cw) or (ch, cw, cz).

    Returns:
      (N, *crop_size, C) crops.
    """
    boxes = jax.lax.stop_gradient(boxes)
    dim = len(crop_size)
    if dim == 2:
        return _roi_align_2d(image, boxes, box_indices, crop_size)
    if dim == 3:
        return _roi_align_3d(image, boxes, box_indices, crop_size)
    raise ValueError(f"crop_size must be rank 2 or 3, got {crop_size}")


def _roi_align_2d(image, boxes, box_indices, crop_size):
    _, H, W, _ = image.shape
    ch, cw = crop_size

    y0, y1i, ly = _lerp_weights(_axis_coords(boxes[:, 0], boxes[:, 2], ch, H), H)
    x0, x1i, lx = _lerp_weights(_axis_coords(boxes[:, 1], boxes[:, 3], cw, W), W)

    # gather only the needed rows, batch index fused into the gather —
    # NEVER materialize image[box_indices] (that is a full per-roi copy of
    # the feature map: N x H x W x C)
    b_ix = box_indices[:, None]  # (N, 1)
    rows = image[b_ix, y0] * (1 - ly[..., None, None]) + image[b_ix, y1i] * ly[..., None, None]  # (N, ch, W, C)
    # then along x: (N, ch, cw, C)
    n_ix2 = jnp.arange(boxes.shape[0])[:, None, None]
    cols0 = rows[n_ix2, jnp.arange(ch)[None, :, None], x0[:, None, :]]
    cols1 = rows[n_ix2, jnp.arange(ch)[None, :, None], x1i[:, None, :]]
    lx_b = lx[:, None, :, None]
    return cols0 * (1 - lx_b) + cols1 * lx_b


def _roi_align_3d(image, boxes, box_indices, crop_size):
    _, H, W, Z, _ = image.shape
    ch, cw, cz = crop_size

    y0, y1i, ly = _lerp_weights(_axis_coords(boxes[:, 0], boxes[:, 2], ch, H), H)
    x0, x1i, lx = _lerp_weights(_axis_coords(boxes[:, 1], boxes[:, 3], cw, W), W)
    z0, z1i, lz = _lerp_weights(_axis_coords(boxes[:, 4], boxes[:, 5], cz, Z), Z)

    n = boxes.shape[0]
    # y: (N, ch, W, Z, C) — batch index fused into the row gather (see 2D)
    b_ix = box_indices[:, None]
    w_y = ly[..., None, None, None]
    rows = image[b_ix, y0] * (1 - w_y) + image[b_ix, y1i] * w_y
    # x: (N, ch, cw, Z, C)
    n_ix2 = jnp.arange(n)[:, None, None]
    h_ix = jnp.arange(ch)[None, :, None]
    cols0 = rows[n_ix2, h_ix, x0[:, None, :]]
    cols1 = rows[n_ix2, h_ix, x1i[:, None, :]]
    w_x = lx[:, None, :, None, None]
    cols = cols0 * (1 - w_x) + cols1 * w_x
    # z: (N, ch, cw, cz, C)
    n_ix3 = jnp.arange(n)[:, None, None, None]
    h_ix3 = jnp.arange(ch)[None, :, None, None]
    w_ix3 = jnp.arange(cw)[None, None, :, None]
    z_sel0 = z0[:, None, None, :]
    z_sel1 = z1i[:, None, None, :]
    front = cols[n_ix3, h_ix3, w_ix3, z_sel0]
    back = cols[n_ix3, h_ix3, w_ix3, z_sel1]
    w_z = lz[:, None, None, :, None]
    return front * (1 - w_z) + back * w_z


def roi_align_numpy_reference(image, boxes, box_indices, crop_size):
    """NumPy oracle implementing the CUDA kernel's per-element formula.

    Scalar loops, used only in tests to pin the device implementation to the
    reference semantics (half-pixel sampling, coordinate clamping, floor/ceil
    lerp corners).
    """
    import numpy as np

    dim = len(crop_size)
    sizes = image.shape[1 : 1 + dim]
    N = len(boxes)
    C = image.shape[-1]
    out = np.zeros((N, *crop_size, C), dtype=image.dtype)
    for nbox in range(N):
        b = box_indices[nbox]
        corners = [(boxes[nbox][0], boxes[nbox][2]), (boxes[nbox][1], boxes[nbox][3])]
        if dim == 3:
            corners.append((boxes[nbox][4], boxes[nbox][5]))
        for cell in np.ndindex(*crop_size):
            coords = []
            for ax in range(dim):
                lo, hi = corners[ax]
                S, crop = sizes[ax], crop_size[ax]
                if crop > 1:
                    scale = (hi - lo) * S / crop
                    c = lo * S + cell[ax] * scale + scale / 2 - 0.5
                else:
                    c = 0.5 * (lo + hi) * S
                coords.append(min(max(c, 0.0), S - 1))
            val = np.zeros(C, dtype=np.float64)
            for corner in np.ndindex(*([2] * dim)):
                w = 1.0
                idx = []
                for ax in range(dim):
                    i0 = int(np.floor(coords[ax]))
                    i1 = int(np.ceil(coords[ax]))
                    lerp = coords[ax] - i0
                    idx.append(i1 if corner[ax] else i0)
                    w *= lerp if corner[ax] else (1 - lerp)
                val += w * image[(b, *idx)]
            out[(nbox, *cell)] = val
    return out
