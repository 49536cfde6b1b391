"""Pallas NMS kernel vs. the XLA/NumPy oracles (interpret mode off-TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medicaldetectiontoolkit_tpu.ops import nms as N
from medicaldetectiontoolkit_tpu.ops.nms_pallas import nms_pallas

INTERPRET = jax.default_backend() not in ("tpu", "axon")


def random_boxes(rng, L, n, dim):
    lo = rng.rand(L, n, dim) * 80
    hi = lo + rng.rand(L, n, dim) * 30 + 1.0
    if dim == 2:
        return np.stack([lo[..., 0], lo[..., 1], hi[..., 0], hi[..., 1]], -1).astype(np.float32)
    return np.stack(
        [lo[..., 0], lo[..., 1], hi[..., 0], hi[..., 1], lo[..., 2], hi[..., 2]], -1
    ).astype(np.float32)


@pytest.mark.parametrize("dim", [2, 3])
def test_matches_numpy_oracle(rng, dim):
    L, n = 3, 100
    boxes = random_boxes(rng, L, n, dim)
    scores = rng.rand(L, n).astype(np.float32)
    idx, mask = nms_pallas(jnp.array(boxes), jnp.array(scores), 0.4, 16, interpret=INTERPRET)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for l in range(L):
        want = N.nms_numpy_reference(boxes[l], scores[l], 0.4)[:16]
        got = idx[l][mask[l]]
        np.testing.assert_array_equal(got, want)


def test_matches_xla_nms_with_valid_mask(rng):
    L, n = 2, 64
    boxes = random_boxes(rng, L, n, 2)
    scores = rng.rand(L, n).astype(np.float32)
    valid = rng.rand(L, n) > 0.3
    idx_p, mask_p = nms_pallas(
        jnp.array(boxes), jnp.array(scores), 0.5, 8, valid=jnp.array(valid), interpret=INTERPRET
    )
    idx_x, mask_x = N.batched_nms(jnp.array(boxes), jnp.array(scores), 0.5, 8, valid=jnp.array(valid))
    np.testing.assert_array_equal(np.asarray(mask_p), np.asarray(mask_x))
    np.testing.assert_array_equal(
        np.asarray(idx_p)[np.asarray(mask_p)], np.asarray(idx_x)[np.asarray(mask_x)]
    )


def test_padding_to_lane_multiple(rng):
    # n not a multiple of 128 exercises the pad path
    boxes = random_boxes(rng, 1, 37, 2)
    scores = rng.rand(1, 37).astype(np.float32)
    idx, mask = nms_pallas(jnp.array(boxes), jnp.array(scores), 1e-5, 8, interpret=INTERPRET)
    got = np.asarray(idx)[0][np.asarray(mask)[0]]
    want = N.nms_numpy_reference(boxes[0], scores[0], 1e-5)[:8]
    np.testing.assert_array_equal(got, want)
