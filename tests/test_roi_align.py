"""RoIAlign tests: device implementation vs. the CUDA-semantics NumPy oracle,
plus gradient checks (scatter-add backward via autodiff)."""

import numpy as np
import jax
import jax.numpy as jnp

from medicaldetectiontoolkit_tpu.ops import roi_align as R


def test_2d_matches_oracle(rng):
    img = rng.rand(2, 16, 20, 3).astype(np.float32)
    boxes = np.array(
        [
            [0.1, 0.2, 0.6, 0.9],
            [0.0, 0.0, 1.0, 1.0],
            [0.25, 0.25, 0.5, 0.5],
            [0.4, 0.1, 0.45, 0.2],
        ],
        dtype=np.float32,
    )
    idx = np.array([0, 1, 0, 1], dtype=np.int32)
    got = np.asarray(R.roi_align(jnp.array(img), jnp.array(boxes), jnp.array(idx), (7, 7)))
    want = R.roi_align_numpy_reference(img, boxes, idx, (7, 7))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_3d_matches_oracle(rng):
    img = rng.rand(2, 10, 12, 6, 2).astype(np.float32)
    boxes = np.array(
        [
            [0.1, 0.2, 0.6, 0.9, 0.0, 0.5],
            [0.0, 0.0, 1.0, 1.0, 0.0, 1.0],
            [0.3, 0.3, 0.7, 0.7, 0.2, 0.8],
        ],
        dtype=np.float32,
    )
    idx = np.array([0, 1, 1], dtype=np.int32)
    got = np.asarray(R.roi_align(jnp.array(img), jnp.array(boxes), jnp.array(idx), (7, 7, 3)))
    want = R.roi_align_numpy_reference(img, boxes, idx, (7, 7, 3))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_identity_crop_center_sampling():
    # a full-image box over a constant image returns the constant
    img = np.full((1, 8, 8, 1), 3.25, dtype=np.float32)
    boxes = np.array([[0.0, 0.0, 1.0, 1.0]], dtype=np.float32)
    out = R.roi_align(jnp.array(img), jnp.array(boxes), jnp.zeros(1, jnp.int32), (4, 4))
    np.testing.assert_allclose(np.asarray(out), 3.25, atol=1e-6)


def test_crop_size_one_samples_box_center(rng):
    img = rng.rand(1, 8, 8, 1).astype(np.float32)
    boxes = np.array([[0.25, 0.25, 0.75, 0.75]], dtype=np.float32)
    got = np.asarray(R.roi_align(jnp.array(img), jnp.array(boxes), jnp.zeros(1, jnp.int32), (1, 1)))
    want = R.roi_align_numpy_reference(img, boxes, np.zeros(1, np.int32), (1, 1))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gradient_flows_to_image_only(rng):
    img = rng.rand(1, 8, 8, 2).astype(np.float32)
    boxes = jnp.array([[0.1, 0.1, 0.8, 0.8]], dtype=jnp.float32)
    idx = jnp.zeros(1, jnp.int32)

    def loss_img(im):
        return jnp.sum(R.roi_align(im, boxes, idx, (3, 3)) ** 2)

    g = jax.grad(loss_img)(jnp.array(img))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0

    # boxes are stop_gradient'ed: grad wrt boxes must be zero
    def loss_boxes(b):
        return jnp.sum(R.roi_align(jnp.array(img), b, idx, (3, 3)))

    gb = jax.grad(loss_boxes)(boxes)
    np.testing.assert_allclose(np.asarray(gb), 0.0)


def test_gradient_matches_finite_differences(rng):
    img = rng.rand(1, 6, 6, 1).astype(np.float64)
    boxes = jnp.array([[0.15, 0.2, 0.7, 0.9]])
    idx = jnp.zeros(1, jnp.int32)

    def loss(im):
        return jnp.sum(R.roi_align(im, boxes, idx, (3, 3)) * jnp.arange(9.0).reshape(1, 3, 3, 1))

    g = np.asarray(jax.grad(loss)(jnp.array(img)))
    # roi_align is exactly linear in the image, so a large FD step is exact
    # and dodges fp32 rounding noise.
    eps = 0.5
    for (b, y, x, c) in [(0, 2, 3, 0), (0, 0, 0, 0), (0, 5, 5, 0), (0, 3, 1, 0)]:
        pert = img.copy()
        pert[b, y, x, c] += eps
        lp = float(loss(jnp.array(pert)))
        pert[b, y, x, c] -= 2 * eps
        lm = float(loss(jnp.array(pert)))
        fd = (lp - lm) / (2 * eps)
        np.testing.assert_allclose(g[b, y, x, c], fd, atol=1e-4)
