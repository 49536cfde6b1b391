"""Unit tests for box geometry ops against hand-computed and NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from medicaldetectiontoolkit_tpu.ops import boxes as B


def np_iou_matrix(b1, b2):
    """Independent NumPy IoU oracle (plain convention)."""
    out = np.zeros((len(b1), len(b2)))
    dim = 2 if b1.shape[1] == 4 else 3
    for i in range(len(b1)):
        for j in range(len(b2)):
            inter = 1.0
            a1, a2 = 1.0, 1.0
            for ax in range(dim):
                lo, hi = (0, 2) if ax == 0 else (1, 3) if ax == 1 else (4, 5)
                seg = min(b1[i, hi], b2[j, hi]) - max(b1[i, lo], b2[j, lo])
                inter *= max(seg, 0.0)
                a1 *= b1[i, hi] - b1[i, lo]
                a2 *= b2[j, hi] - b2[j, lo]
            union = a1 + a2 - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


class TestIoU:
    def test_identity_2d(self):
        b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        assert np.allclose(B.pairwise_iou(b, b), 1.0)

    def test_disjoint_2d(self):
        b1 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        b2 = jnp.array([[20.0, 20.0, 30.0, 30.0]])
        assert np.allclose(B.pairwise_iou(b1, b2), 0.0)

    def test_half_overlap_2d(self):
        b1 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        b2 = jnp.array([[0.0, 5.0, 10.0, 15.0]])
        # intersection 50, union 150
        assert np.allclose(B.pairwise_iou(b1, b2), 50.0 / 150.0)

    def test_random_matrix_2d(self, rng):
        b1 = np.sort(rng.rand(12, 2, 2) * 100, axis=1).transpose(0, 2, 1).reshape(12, 4)
        b1 = b1[:, [0, 2, 1, 3]]  # (y1, x1, y2, x2)
        b2 = np.sort(rng.rand(7, 2, 2) * 100, axis=1).transpose(0, 2, 1).reshape(7, 4)
        b2 = b2[:, [0, 2, 1, 3]]
        np.testing.assert_allclose(B.pairwise_iou(jnp.array(b1), jnp.array(b2)), np_iou_matrix(b1, b2), atol=1e-5)

    def test_random_matrix_3d(self, rng):
        def mk(n):
            lo = rng.rand(n, 3) * 50
            hi = lo + rng.rand(n, 3) * 50 + 1
            return np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1], lo[:, 2], hi[:, 2]], 1)

        b1, b2 = mk(9), mk(5)
        np.testing.assert_allclose(B.pairwise_iou(jnp.array(b1), jnp.array(b2)), np_iou_matrix(b1, b2), atol=1e-5)

    def test_plus_one_convention(self):
        # single-pixel boxes have area 1 under the +1 convention
        b = jnp.array([[3.0, 3.0, 3.0, 3.0]])
        assert np.allclose(B.pairwise_iou(b, b, pixel_offset=1.0), 1.0)
        assert np.allclose(B.box_area(b, pixel_offset=1.0), 1.0)


class TestDeltas:
    @pytest.mark.parametrize("dim", [2, 3])
    def test_roundtrip(self, rng, dim):
        n = 20
        lo = rng.rand(n, dim) * 50
        hi = lo + rng.rand(n, dim) * 50 + 1.0
        glo = rng.rand(n, dim) * 50
        ghi = glo + rng.rand(n, dim) * 50 + 1.0

        def corners(l, h):
            if dim == 2:
                return np.stack([l[:, 0], l[:, 1], h[:, 0], h[:, 1]], 1)
            return np.stack([l[:, 0], l[:, 1], h[:, 0], h[:, 1], l[:, 2], h[:, 2]], 1)

        boxes = jnp.array(corners(lo, hi))
        gt = jnp.array(corners(glo, ghi))
        deltas = B.box_refinement(boxes, gt)
        rec = B.apply_box_deltas(boxes, deltas)
        np.testing.assert_allclose(rec, gt, atol=1e-2)  # fp32 exp/log roundtrip

    def test_known_delta_2d(self):
        boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
        # shift center by (+1, +2), double h, halve w
        deltas = jnp.array([[0.1, 0.2, np.log(2.0), np.log(0.5)]])
        out = np.asarray(B.apply_box_deltas(boxes, deltas))[0]
        np.testing.assert_allclose(out, [6 - 10, 7 - 2.5, 6 + 10, 7 + 2.5], atol=1e-5)


class TestClip:
    def test_clip_2d(self):
        boxes = jnp.array([[-5.0, -5.0, 400.0, 50.0]])
        out = np.asarray(B.clip_boxes(boxes, (0, 0, 320, 320)))[0]
        np.testing.assert_allclose(out, [0, 0, 320, 50])

    def test_clip_3d(self):
        boxes = jnp.array([[-5.0, 3.0, 400.0, 50.0, -1.0, 99.0]])
        out = np.asarray(B.clip_boxes(boxes, (0, 0, 320, 320, 0, 64)))[0]
        np.testing.assert_allclose(out, [0, 3, 320, 50, 0, 64])


class TestNormalize:
    def test_roundtrip_3d(self, rng):
        boxes = jnp.array(rng.rand(5, 6) * 100)
        shape = (128, 256, 64)
        out = B.denormalize_boxes(B.normalize_boxes(boxes, shape), shape)
        np.testing.assert_allclose(out, boxes, rtol=1e-6)
