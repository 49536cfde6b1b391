"""Anchor generation tests: counts, geometry, and ordering contract."""

import numpy as np

from medicaldetectiontoolkit_tpu.ops import anchors as A


class _Cf:
    pass


def test_2d_count_and_geometry():
    out = A.generate_anchors_2d([8], [0.5, 1, 2], (4, 5), feature_stride=16)
    assert out.shape == (4 * 5 * 3, 4)
    # first position is (0, 0); first anchor ratio 0.5: h = 8/sqrt(0.5), w = 8*sqrt(0.5)
    h = 8 / np.sqrt(0.5)
    w = 8 * np.sqrt(0.5)
    np.testing.assert_allclose(out[0], [-h / 2, -w / 2, h / 2, w / 2], atol=1e-9)
    # ratio 1 anchor is square
    np.testing.assert_allclose(out[1], [-4, -4, 4, 4], atol=1e-9)


def test_2d_position_major_ordering():
    out = A.generate_anchors_2d([8], [1.0], (2, 3), feature_stride=16)
    centers_y = (out[:, 0] + out[:, 2]) / 2
    centers_x = (out[:, 1] + out[:, 3]) / 2
    # y-major, x-minor: (0,0), (0,16), (0,32), (16,0), ...
    np.testing.assert_allclose(centers_y, [0, 0, 0, 16, 16, 16])
    np.testing.assert_allclose(centers_x, [0, 16, 32, 0, 16, 32])


def test_2d_anchor_minor_ordering():
    out = A.generate_anchors_2d([8, 16], [0.5, 1], (1, 1), feature_stride=4)
    # per-position order: ratio-major, scale-minor -> (r.5,s8),(r.5,s16),(r1,s8),(r1,s16)
    heights = out[:, 2] - out[:, 0]
    np.testing.assert_allclose(
        heights, [8 / np.sqrt(0.5), 16 / np.sqrt(0.5), 8.0, 16.0], atol=1e-9
    )


def test_3d_count_and_z_pairing():
    out = A.generate_anchors_3d([8, 16, 32], [2, 4, 8], [0.5, 1, 2], (2, 2, 3), 16, 4)
    assert out.shape == (2 * 2 * 3 * 9, 6)
    # depth of anchor i pairs scales_z[i % 3]
    depths = out[:9, 5] - out[:9, 4]
    np.testing.assert_allclose(depths, [2, 4, 8, 2, 4, 8, 2, 4, 8], atol=1e-9)


def test_3d_position_ordering():
    out = A.generate_anchors_3d([8], [2], [1.0], (2, 2, 2), 16, 4)
    cy = (out[:, 0] + out[:, 2]) / 2
    cx = (out[:, 1] + out[:, 3]) / 2
    cz = (out[:, 4] + out[:, 5]) / 2
    # y-major, then x, then z
    np.testing.assert_allclose(cy, [0, 0, 0, 0, 16, 16, 16, 16])
    np.testing.assert_allclose(cx, [0, 0, 16, 16, 0, 0, 16, 16])
    np.testing.assert_allclose(cz, [0, 4, 0, 4, 0, 4, 0, 4])


def test_pyramid_concat_counts():
    cf = _Cf()
    cf.pyramid_levels = [0, 1, 2, 3]
    cf.backbone_shapes = np.array([[80, 80], [40, 40], [20, 20], [10, 10]])
    cf.backbone_strides = {"xy": [4, 8, 16, 32], "z": [1, 2, 4, 8]}
    cf.rpn_anchor_scales = {"xy": [[8], [16], [32], [64]], "z": [[2], [4], [8], [16]]}
    cf.rpn_anchor_ratios = [0.5, 1, 2]
    cf.rpn_anchor_stride = 1
    out = A.generate_pyramid_anchors(cf)
    expected = sum(s * s * 3 for s in [80, 40, 20, 10])
    assert out.shape == (expected, 4)
