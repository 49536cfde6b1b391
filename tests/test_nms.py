"""NMS tests: fixed-shape device NMS vs. the greedy NumPy oracle."""

import numpy as np
import jax.numpy as jnp

from medicaldetectiontoolkit_tpu.ops import nms as N


def random_boxes_2d(rng, n, span=100.0, size=30.0):
    lo = rng.rand(n, 2) * span
    hi = lo + rng.rand(n, 2) * size + 1.0
    return np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], 1).astype(np.float32)


def random_boxes_3d(rng, n, span=60.0, size=20.0):
    lo = rng.rand(n, 3) * span
    hi = lo + rng.rand(n, 3) * size + 1.0
    return np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1], lo[:, 2], hi[:, 2]], 1).astype(np.float32)


def check_vs_oracle(boxes, scores, thresh, max_output):
    idx, mask = N.nms(jnp.array(boxes), jnp.array(scores), thresh, max_output)
    got = np.asarray(idx)[np.asarray(mask)]
    want = N.nms_numpy_reference(boxes, scores, thresh)[:max_output]
    np.testing.assert_array_equal(got, want)


def test_2d_matches_oracle(rng):
    for trial in range(5):
        boxes = random_boxes_2d(rng, 200)
        scores = rng.rand(200).astype(np.float32)
        check_vs_oracle(boxes, scores, 0.5, 64)


def test_3d_matches_oracle(rng):
    for trial in range(3):
        boxes = random_boxes_3d(rng, 120)
        scores = rng.rand(120).astype(np.float32)
        check_vs_oracle(boxes, scores, 0.3, 48)


def test_tiny_threshold_keeps_disjoint_only(rng):
    # detection_nms_threshold = 1e-5 in the reference: any overlap clusters
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    idx, mask = N.nms(jnp.array(boxes), jnp.array(scores), 1e-5, 3)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, [0, 2])


def test_identical_boxes_keep_first():
    boxes = np.tile(np.array([[5, 5, 20, 20]], dtype=np.float32), (4, 1))
    scores = np.array([0.5, 0.9, 0.7, 0.9], dtype=np.float32)
    idx, mask = N.nms(jnp.array(boxes), jnp.array(scores), 0.5, 4)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, [1])  # highest score, ties -> lowest index


def test_valid_mask_excludes(rng):
    boxes = random_boxes_2d(rng, 50)
    scores = rng.rand(50).astype(np.float32)
    valid = np.ones(50, bool)
    valid[scores.argmax()] = False
    idx, mask = N.nms(jnp.array(boxes), jnp.array(scores), 0.5, 16, valid=jnp.array(valid))
    got = np.asarray(idx)[np.asarray(mask)]
    assert scores.argmax() not in got


def test_padding_slots_are_invalid(rng):
    boxes = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    idx, mask = N.nms(jnp.array(boxes), jnp.array(scores), 0.5, 8)
    assert np.asarray(mask).sum() == 2
    assert (np.asarray(idx)[2:] == -1).all()


def test_batched(rng):
    B, n = 4, 60
    boxes = np.stack([random_boxes_2d(rng, n) for _ in range(B)])
    scores = rng.rand(B, n).astype(np.float32)
    idx, mask = N.batched_nms(jnp.array(boxes), jnp.array(scores), 0.4, 16)
    for b in range(B):
        got = np.asarray(idx[b])[np.asarray(mask[b])]
        want = N.nms_numpy_reference(boxes[b], scores[b], 0.4)[:16]
        np.testing.assert_array_equal(got, want)


def test_plus_one_convention_matters():
    # two 1x1-pixel boxes adjacent: +1 convention sees them as touching with
    # IoU > 0 only if they truly intersect under (hi-lo+1) arithmetic.
    boxes = np.array([[0, 0, 0, 0], [0, 1, 0, 1]], dtype=np.float32)
    scores = np.array([0.9, 0.8], dtype=np.float32)
    # plain IoU: both zero-area -> IoU 0 -> both kept
    idx0, mask0 = N.nms(jnp.array(boxes), jnp.array(scores), 0.1, 2, pixel_offset=0.0)
    assert np.asarray(mask0).sum() == 2
    # +1 convention: unit-area boxes, disjoint -> still both kept
    idx1, mask1 = N.nms(jnp.array(boxes), jnp.array(scores), 0.1, 2, pixel_offset=1.0)
    assert np.asarray(mask1).sum() == 2
    # identical single-pixel boxes under +1 have IoU 1 -> second suppressed
    boxes2 = np.array([[0, 0, 0, 0], [0, 0, 0, 0]], dtype=np.float32)
    _, mask2 = N.nms(jnp.array(boxes2), jnp.array(scores), 0.5, 2, pixel_offset=1.0)
    assert np.asarray(mask2).sum() == 1
