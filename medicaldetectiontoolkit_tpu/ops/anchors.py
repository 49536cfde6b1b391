"""Pyramid anchor generation (host-side NumPy, run once at model build).

Reproduces the anchor *ordering* contract of the reference
(``utils/model_utils.py:190-314``): per pyramid level, anchors are laid out
position-major in (y, x, (z)) row-major order with the per-position anchor
index minor, where the per-position order iterates ratios (outer) x scales
(inner). This ordering must agree with how the dense head outputs are
reshaped: a channel-last feature map (b, y, x, (z), A*C) flattened to
(b, y*x*(z)*A, C) lines up exactly with this anchor array.

3D anchors carry a z-scale per xy-scale (depths tiled over the ratio axis,
``utils/model_utils.py:249``) so anisotropic medical volumes get independent
in-plane/axial extents.
"""

from __future__ import annotations

import numpy as np


def generate_anchors_2d(scales, ratios, feature_shape, feature_stride, anchor_stride=1):
    """All anchors of one 2D pyramid level; (P*A, 4) float64, (y1,x1,y2,x2).

    ``scales`` in pixels, ``ratios`` = width/height, ``feature_shape`` (y, x)
    of the level's feature map, ``feature_stride`` pixels per feature cell.
    """
    scales = np.asarray(scales, dtype=np.float64)
    ratios = np.asarray(ratios, dtype=np.float64)
    # per-position anchor order: ratio-major, scale-minor
    scale_grid = np.tile(scales, len(ratios))
    ratio_grid = np.repeat(ratios, len(scales))
    heights = scale_grid / np.sqrt(ratio_grid)  # (A,)
    widths = scale_grid * np.sqrt(ratio_grid)

    ys = np.arange(0, feature_shape[0], anchor_stride, dtype=np.float64) * feature_stride
    xs = np.arange(0, feature_shape[1], anchor_stride, dtype=np.float64) * feature_stride
    # position-major (y outer, x inner), anchor minor
    cy = np.repeat(ys, len(xs))
    cx = np.tile(xs, len(ys))
    centers_y = np.repeat(cy, len(heights))
    centers_x = np.repeat(cx, len(widths))
    h = np.tile(heights, len(cy))
    w = np.tile(widths, len(cx))

    return np.stack(
        [centers_y - 0.5 * h, centers_x - 0.5 * w, centers_y + 0.5 * h, centers_x + 0.5 * w],
        axis=1,
    )


def generate_anchors_3d(
    scales_xy, scales_z, ratios, feature_shape, feature_stride_xy, feature_stride_z, anchor_stride=1
):
    """All anchors of one 3D pyramid level; (P*A, 6), (y1,x1,y2,x2,z1,z2).

    The z-extent of anchor i is scales_z[i % len(scales_z)] so each xy scale
    pairs with its z scale (reference's depth tiling,
    ``utils/model_utils.py:249``).
    """
    scales_xy = np.asarray(scales_xy, dtype=np.float64)
    scales_z = np.asarray(scales_z, dtype=np.float64)
    ratios = np.asarray(ratios, dtype=np.float64)

    scale_grid = np.tile(scales_xy, len(ratios))
    ratio_grid = np.repeat(ratios, len(scales_xy))
    heights = scale_grid / np.sqrt(ratio_grid)
    widths = scale_grid * np.sqrt(ratio_grid)
    depths = np.tile(scales_z, len(ratio_grid) // len(scales_z))

    ys = np.arange(0, feature_shape[0], anchor_stride, dtype=np.float64) * feature_stride_xy
    xs = np.arange(0, feature_shape[1], anchor_stride, dtype=np.float64) * feature_stride_xy
    zs = np.arange(0, feature_shape[2], anchor_stride, dtype=np.float64) * feature_stride_z

    # position-major in (y, x, z) row-major order
    n_pos = len(ys) * len(xs) * len(zs)
    cy = np.repeat(ys, len(xs) * len(zs))
    cx = np.tile(np.repeat(xs, len(zs)), len(ys))
    cz = np.tile(zs, len(ys) * len(xs))

    A = len(heights)
    centers_y = np.repeat(cy, A)
    centers_x = np.repeat(cx, A)
    centers_z = np.repeat(cz, A)
    h = np.tile(heights, n_pos)
    w = np.tile(widths, n_pos)
    d = np.tile(depths, n_pos)

    return np.stack(
        [
            centers_y - 0.5 * h,
            centers_x - 0.5 * w,
            centers_y + 0.5 * h,
            centers_x + 0.5 * w,
            centers_z - 0.5 * d,
            centers_z + 0.5 * d,
        ],
        axis=1,
    )


def generate_pyramid_anchors(cf, logger=None):
    """Concatenate anchors across the configured pyramid levels; (N, 2*dim).

    Reads the same config attributes as the reference
    (``utils/model_utils.py:275-314``): ``rpn_anchor_scales`` {'xy': ..,
    'z': ..}, ``rpn_anchor_ratios``, ``backbone_shapes``,
    ``backbone_strides``, ``rpn_anchor_stride``, ``pyramid_levels``.
    """
    anchors = []
    for level in cf.pyramid_levels:
        shape = cf.backbone_shapes[level]
        if len(shape) == 2:
            a = generate_anchors_2d(
                cf.rpn_anchor_scales["xy"][level],
                cf.rpn_anchor_ratios,
                shape,
                cf.backbone_strides["xy"][level],
                cf.rpn_anchor_stride,
            )
        else:
            a = generate_anchors_3d(
                cf.rpn_anchor_scales["xy"][level],
                cf.rpn_anchor_scales["z"][level],
                cf.rpn_anchor_ratios,
                shape,
                cf.backbone_strides["xy"][level],
                cf.backbone_strides["z"][level],
                cf.rpn_anchor_stride,
            )
        expected = int(np.prod(shape)) * len(cf.rpn_anchor_ratios) * len(cf.rpn_anchor_scales["xy"][level])
        assert a.shape[0] == expected, f"level {level}: built {a.shape[0]} anchors, expected {expected}"
        if logger is not None:
            logger.info(f"level {level}: built anchors {a.shape}")
        anchors.append(a)
    return np.concatenate(anchors, axis=0)
