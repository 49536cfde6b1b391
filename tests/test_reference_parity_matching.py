"""Exact parity: on-device gt_anchor_matching vs the reference's NumPy one.

Subsampling is randomized in both implementations, so it is disabled (large
rpn_train_anchors_per_image) and the deterministic parts are compared: match
labels and normalized delta targets. Skipped without the mounted reference.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_DIR), reason="reference not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medicaldetectiontoolkit_tpu.ops import matching as our_matching  # noqa: E402


@pytest.fixture(scope="module")
def ref_mutils():
    if REF_DIR not in sys.path:
        # APPEND, not insert(0): the reference root also contains an
        # `experiments` package — putting it first shadows the repo's own
        # `experiments.*` imports for every later test in the process
        sys.path.append(REF_DIR)
    spec = importlib.util.spec_from_file_location("ref_mutils", os.path.join(REF_DIR, "utils/model_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _Cf:
    def __init__(self, dim):
        self.dim = dim
        self.anchor_matching_iou = 0.7 if dim == 2 else 0.3
        self.rpn_train_anchors_per_image = 100000  # disable subsampling
        self.rpn_bbox_std_dev = np.array([0.1, 0.1, 0.2, 0.2]) if dim == 2 else np.array(
            [0.1, 0.1, 0.1, 0.2, 0.2, 0.2]
        )


def _random_case(rng, dim, n_anchors=400, n_gt=3):
    lo = rng.rand(n_anchors, dim) * 100
    hi = lo + rng.rand(n_anchors, dim) * 30 + 2
    glo = rng.rand(n_gt, dim) * 100
    ghi = glo + rng.rand(n_gt, dim) * 30 + 2

    def corners(l, h):
        if dim == 2:
            return np.stack([l[:, 0], l[:, 1], h[:, 0], h[:, 1]], 1)
        return np.stack([l[:, 0], l[:, 1], h[:, 0], h[:, 1], l[:, 2], h[:, 2]], 1)

    anchors = corners(lo, hi).astype(np.float64)
    gt = corners(glo, ghi).astype(np.float64)
    # plant some guaranteed matches
    for g in range(min(n_gt, 3)):
        anchors[g * 7] = gt[g] + rng.rand(2 * dim) * 0.5
    return anchors, gt


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("trial", range(4))
def test_matching_parity_no_subsampling(ref_mutils, dim, trial):
    rng = np.random.RandomState(100 * dim + trial)
    cf = _Cf(dim)
    anchors, gt = _random_case(rng, dim)
    gt_ids = rng.randint(1, 3, len(gt))

    ref_matches, ref_deltas = ref_mutils.gt_anchor_matching(cf, anchors, gt, gt_ids.copy())

    G = 8
    gt_pad = np.zeros((G, 2 * dim), np.float32)
    ids_pad = np.zeros((G,), np.int32)
    valid = np.zeros((G,), bool)
    gt_pad[: len(gt)] = gt
    ids_pad[: len(gt)] = gt_ids
    valid[: len(gt)] = True
    our_matches, our_deltas = our_matching.gt_anchor_matching(
        jax.random.PRNGKey(0),
        jnp.asarray(anchors, jnp.float32),
        jnp.asarray(gt_pad),
        jnp.asarray(ids_pad),
        jnp.asarray(valid),
        cf.anchor_matching_iou,
        0.1 if dim == 2 else 0.01,
        cf.rpn_train_anchors_per_image,
        jnp.asarray(cf.rpn_bbox_std_dev, jnp.float32),
    )
    our_matches = np.asarray(our_matches)
    our_deltas = np.asarray(our_deltas)

    np.testing.assert_array_equal(our_matches, ref_matches)

    pos_ix = np.where(ref_matches > 0)[0]
    for row, aix in enumerate(pos_ix):
        np.testing.assert_allclose(our_deltas[aix], ref_deltas[row], rtol=2e-4, atol=2e-4)


def test_matching_parity_empty_gt(ref_mutils):
    cf = _Cf(2)
    rng = np.random.RandomState(0)
    anchors, _ = _random_case(rng, 2)
    ref_matches, _ = ref_mutils.gt_anchor_matching(cf, anchors, None)
    our_matches, _ = our_matching.gt_anchor_matching(
        jax.random.PRNGKey(0),
        jnp.asarray(anchors, jnp.float32),
        jnp.zeros((4, 4), jnp.float32),
        jnp.zeros((4,), jnp.int32),
        jnp.zeros((4,), bool),
        0.7,
        0.1,
        64,
        jnp.asarray(cf.rpn_bbox_std_dev, jnp.float32),
    )
    np.testing.assert_array_equal(np.asarray(our_matches), ref_matches)
