"""Exact parity: box ops vs the reference's torch/NumPy implementations."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_DIR), reason="reference not mounted")

import jax.numpy as jnp  # noqa: E402

from medicaldetectiontoolkit_tpu.ops import boxes as B  # noqa: E402


@pytest.fixture(scope="module")
def ref_mutils():
    if REF_DIR not in sys.path:
        # APPEND, not insert(0): the reference root also contains an
        # `experiments` package — putting it first shadows the repo's own
        # `experiments.*` imports for every later test in the process
        sys.path.append(REF_DIR)
    spec = importlib.util.spec_from_file_location("ref_mutils2", os.path.join(REF_DIR, "utils/model_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _boxes(rng, n, dim):
    lo = rng.rand(n, dim) * 50
    hi = lo + rng.rand(n, dim) * 50 + 1
    if dim == 2:
        return np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], 1)
    return np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1], lo[:, 2], hi[:, 2]], 1)


@pytest.mark.parametrize("dim", [2, 3])
def test_compute_overlaps_parity(ref_mutils, dim, rng):
    b1 = _boxes(rng, 30, dim)
    b2 = _boxes(rng, 7, dim)
    theirs = ref_mutils.compute_overlaps(b1, b2)
    ours = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("dim", [2, 3])
def test_apply_box_deltas_parity(ref_mutils, dim, rng):
    import torch

    boxes = _boxes(rng, 25, dim)
    deltas = rng.randn(25, 2 * dim) * 0.2
    tb = torch.from_numpy(boxes).float()
    td = torch.from_numpy(deltas).float()
    theirs = (ref_mutils.apply_box_deltas_2D(tb, td) if dim == 2 else ref_mutils.apply_box_deltas_3D(tb, td)).numpy()
    ours = np.asarray(B.apply_box_deltas(jnp.asarray(boxes, jnp.float32), jnp.asarray(deltas, jnp.float32)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dim", [2, 3])
def test_box_refinement_parity(ref_mutils, dim, rng):
    import torch

    boxes = _boxes(rng, 25, dim)
    gt = _boxes(rng, 25, dim)
    theirs = ref_mutils.box_refinement(torch.from_numpy(boxes).float(), torch.from_numpy(gt).float()).numpy()
    ours = np.asarray(B.box_refinement(jnp.asarray(boxes, jnp.float32), jnp.asarray(gt, jnp.float32)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dim", [2, 3])
def test_clip_boxes_parity(ref_mutils, dim, rng):
    import torch

    boxes = _boxes(rng, 25, dim) * 3 - 30  # spill outside the window
    window = [0, 0, 100, 100] if dim == 2 else [0, 0, 100, 100, 0, 40]
    tb = torch.from_numpy(boxes).float()
    theirs = (ref_mutils.clip_boxes_2D(tb, window) if dim == 2 else ref_mutils.clip_boxes_3D(tb, window)).numpy()
    ours = np.asarray(B.clip_boxes(jnp.asarray(boxes, jnp.float32), window))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_anchor_generation_parity(ref_mutils):
    from medicaldetectiontoolkit_tpu.ops import anchors as A

    theirs = ref_mutils.generate_anchors([8, 16], [0.5, 1, 2], (10, 12), feature_stride=16, anchor_stride=1)
    ours = A.generate_anchors_2d([8, 16], [0.5, 1, 2], (10, 12), feature_stride=16, anchor_stride=1)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_anchor_generation_3d_parity(ref_mutils):
    from medicaldetectiontoolkit_tpu.ops import anchors as A

    theirs = ref_mutils.generate_anchors_3D(
        [8, 16, 32], [2, 4, 8], [0.5, 1, 2], (4, 5, 3), 16, 4, 1
    )
    ours = A.generate_anchors_3d([8, 16, 32], [2, 4, 8], [0.5, 1, 2], (4, 5, 3), 16, 4, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)
