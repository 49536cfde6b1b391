"""Mask R-CNN / U-Faster R-CNN+ / Detection U-Net smoke + behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medicaldetectiontoolkit_tpu.models import build_model
from medicaldetectiontoolkit_tpu.models.mrcnn import (
    detection_target_layer,
    proposal_layer,
    pyramid_roi_align,
    refine_detections,
)
from medicaldetectiontoolkit_tpu.testing import make_batch, make_config


class _Log:
    def info(self, *a, **k):
        pass


class TestProposalLayer:
    def test_shapes_and_padding(self):
        cf = make_config("mrcnn", dim=2, retina_scales=False)
        anchors = jnp.array([[0, 0, 10, 10], [5, 5, 20, 20], [50, 50, 60, 60], [0, 0, 64, 64]], jnp.float32)
        probs_fg = jnp.array([[0.9, 0.1, 0.8, 0.2], [0.1, 0.9, 0.2, 0.3]], jnp.float32)
        deltas = jnp.zeros((2, 4, 4))
        cf.pre_nms_limit = 4
        rois_norm, out_props, valid = proposal_layer(probs_fg, deltas, anchors, cf, proposal_count=3)
        assert rois_norm.shape == (2, 3, 4)
        assert out_props.shape == (2, 3, 5)
        assert valid.shape == (2, 3)
        # top box of element 0 is anchor 0
        np.testing.assert_allclose(np.asarray(out_props)[0, 0, :4], [0, 0, 10, 10], atol=1e-4)
        # normalized coords in [0,1]
        assert np.asarray(rois_norm).max() <= 1.0 + 1e-6


class TestPyramidRoiAlign:
    def test_level_assignment_selects_correct_map(self, rng):
        # two rois: tiny -> P2(level0), huge -> P5(level3)
        maps = [jnp.full((1, 2 ** (5 - i), 2 ** (5 - i), 1), float(i)) for i in range(4)]
        boxes = jnp.array([[0.0, 0.0, 0.05, 0.05], [0.0, 0.0, 1.0, 1.0]], jnp.float32)
        bix = jnp.zeros(2, jnp.int32)
        out = pyramid_roi_align(maps, boxes, bix, (3, 3), (0, 1, 2, 3))
        # small roi from level 0 (value 0), big roi from level 3 (value 3)
        np.testing.assert_allclose(np.asarray(out)[0], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out)[1], 3.0, atol=1e-6)


class TestDetectionTargetLayer:
    def _run(self, proposals, gt, gt_ids, seed=0, dim=2, G=4, n_mask_slots=None, train_rois=4):
        cf = make_config("mrcnn", dim=dim, retina_scales=False)
        cf.train_rois_per_image = train_rois
        P = proposals.shape[0]
        gt_boxes = np.zeros((G, 2 * dim), np.float32)
        ids = np.zeros((G,), np.int32)
        valid = np.zeros((G,), bool)
        gt_boxes[: len(gt)] = gt
        ids[: len(gt)] = gt_ids
        valid[: len(gt)] = True
        spatial = (32, 32) if dim == 2 else (32, 32, 8)
        n_mask_slots = G if n_mask_slots is None else n_mask_slots
        gt_masks = np.zeros((n_mask_slots, *spatial), np.float32)
        for i, g in enumerate(gt[:n_mask_slots]):
            sl = tuple(slice(int(g[k] * spatial[k // 2]), int(g[k + 2] * spatial[k // 2])) for k in (0, 1))
            gt_masks[(i, *sl)] = 1.0
        scores = np.random.RandomState(seed).rand(P, cf.head_classes).astype(np.float32)
        out = detection_target_layer(
            jax.random.PRNGKey(seed),
            jnp.array(proposals),
            jnp.ones((P,), bool),
            jnp.array(scores),
            jnp.array(gt_boxes),
            jnp.array(ids),
            jnp.array(valid),
            jnp.array(gt_masks),
            cf,
        )
        return [np.asarray(o) for o in out], cf

    def test_positive_and_negative_sampling(self):
        proposals = np.array(
            [[0.1, 0.1, 0.3, 0.3], [0.11, 0.11, 0.3, 0.3], [0.7, 0.7, 0.9, 0.9], [0.5, 0.1, 0.6, 0.2]], np.float32
        )
        gt = np.array([[0.1, 0.1, 0.3, 0.3]], np.float32)
        (rois, valid, tclass, tdeltas, tmasks, pos, mask_pos), cf = self._run(proposals, gt, [2])
        assert pos.sum() >= 1
        assert (tclass[pos] == 2).all()
        # positive deltas near zero for the perfectly matching proposal
        assert np.isfinite(tdeltas).all()
        assert tmasks.shape[1:] == tuple(cf.mask_shape)

    def test_no_gt_all_negative(self):
        proposals = np.array([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.8, 0.8]], np.float32)
        (rois, valid, tclass, tdeltas, tmasks, pos, mask_pos), cf = self._run(
            proposals, np.zeros((0, 4), np.float32), []
        )
        assert pos.sum() == 0
        assert (tclass == 0).all()
        assert valid.sum() >= 1  # at least one negative sampled

    def test_twelve_gt_instances_mask_targets_per_instance(self):
        """Regression: with more GTs than mask slots, every supervised mask
        target must belong to the RoI's own assigned instance; positives
        assigned past the mask-slot cap get mask_pos=False (no corruption)."""
        # 12 disjoint GT boxes on a 4x3 grid of the unit square
        gt = np.array(
            [
                [r * 0.25 + 0.02, c * 0.33 + 0.02, r * 0.25 + 0.20, c * 0.33 + 0.28]
                for r in range(4)
                for c in range(3)
            ],
            np.float32,
        )
        proposals = gt.copy()  # exact matches -> 12 positives, assignment i -> GT i
        out, cf = self._run(
            proposals, gt, [1] * 12, G=12, n_mask_slots=8, train_rois=24
        )
        rois, valid, tclass, tdeltas, tmasks, pos, mask_pos = out
        n_pos = int(pos.sum())
        assert n_pos == 12  # all 12 exact-match proposals sampled as positives
        # recover each positive's assigned instance from its roi coords
        for s in np.flatnonzero(pos):
            a = int(np.argmin(np.abs(gt - rois[s]).sum(axis=1)))
            if a < 8:
                assert mask_pos[s], f"slot {s} (gt {a}) should keep mask supervision"
                # the instance's own mask fills its box -> aligned target ~all ones
                assert tmasks[s].mean() > 0.6, f"slot {s} target does not match gt {a}'s mask"
            else:
                assert not mask_pos[s], f"slot {s} (gt {a} past cap) must be excluded"
                assert tmasks[s].sum() == 0.0
        # pos/class/bbox supervision is NOT affected by the mask cap
        assert (tclass[pos.astype(bool)] == 1).all()


class TestRefineDetections:
    def test_basic(self):
        cf = make_config("mrcnn", dim=2, retina_scales=False)
        R, C = 6, 3
        rois = jnp.array(np.random.RandomState(0).rand(R, 4).astype(np.float32))
        rois = jnp.concatenate([rois[:, :2] * 0.5, rois[:, :2] * 0.5 + 0.4], axis=1)
        probs = np.full((R, C), 0.05, np.float32)
        probs[0, 1] = 0.9
        probs[3, 2] = 0.8
        deltas = jnp.zeros((R, C, 4))
        batch_ix = jnp.array([0, 0, 0, 1, 1, 1], jnp.int32)
        det, mask = refine_detections(rois, jnp.array(probs), deltas, batch_ix, cf, batch_size=2)
        det, mask = np.asarray(det), np.asarray(mask)
        assert det.shape == (2, cf.model_max_instances_per_batch_element, 6)
        # element 0 top det is class 1 score 0.9; element 1 top det class 2
        assert det[0, 0, 4] == 1 and abs(det[0, 0, 5] - 0.9) < 1e-5
        assert det[1, 0, 4] == 2 and abs(det[1, 0, 5] - 0.8) < 1e-5
        # low-confidence candidates are dropped entirely
        assert mask.sum() >= 2


@pytest.mark.slow
@pytest.mark.parametrize("model", ["mrcnn", "ufrcnn"])
def test_two_stage_train_and_test(model):
    cf = make_config(model, dim=2, retina_scales=False)
    net = build_model(cf, _Log())
    net.initialize()
    batch = make_batch(cf)
    res = net.train_forward(batch)
    assert np.isfinite(res["loss"])
    types = {b["box_type"] for bl in res["boxes"] for b in bl}
    assert "gt" in types and "prop" in types
    assert res["seg_preds"].shape[0] == cf.batch_size

    res_t = net.test_forward({"data": batch["data"]}, return_masks=(model == "mrcnn"))
    assert len(res_t["boxes"]) == cf.batch_size
    assert res_t["seg_preds"].shape == (cf.batch_size, 1, *cf.patch_size)


@pytest.mark.slow
def test_second_stage_chunking_matches_unchunked():
    """roi_chunk_size-bounded lax.map pass must equal the one-shot pass up to
    matmul-tiling accumulation order, ~1e-7 (chunk 32 does not divide R=100,
    exercising the pad path)."""
    cf = make_config("mrcnn", dim=2, retina_scales=False)
    net = build_model(cf, _Log())
    net.initialize()
    img = jnp.asarray(np.random.RandomState(0).rand(cf.batch_size, *cf.patch_size, cf.n_channels), jnp.float32)
    maps, *_rest, rois_norm, _props, _valid = net._first_stage(net.params, img, training=True)

    cf.roi_chunk_size = None
    logits_ref, bbox_ref, rois_ref, bix_ref = net._second_stage_all(net.params, maps, rois_norm)
    cf.roi_chunk_size = 32
    logits_c, bbox_c, rois_c, bix_c = net._second_stage_all(net.params, maps, rois_norm)

    np.testing.assert_allclose(np.asarray(logits_ref), np.asarray(logits_c), atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(bbox_ref), np.asarray(bbox_c), atol=1e-5, rtol=0)
    np.testing.assert_array_equal(np.asarray(rois_ref), np.asarray(rois_c))
    np.testing.assert_array_equal(np.asarray(bix_ref), np.asarray(bix_c))


@pytest.mark.slow
def test_mrcnn_3d_train_step():
    cf = make_config("mrcnn", dim=3, retina_scales=False)
    net = build_model(cf, _Log())
    net.initialize()
    batch = make_batch(cf)
    res = net.train_forward(batch)
    assert np.isfinite(res["loss"])


@pytest.mark.slow
def test_mrcnn_loss_decreases():
    # two-stage losses are noisy on a tiny random model (roi sampling);
    # the RPN class loss is the reliably-decreasing signal.
    cf = make_config("mrcnn", dim=2, retina_scales=False)
    net = build_model(cf, _Log())
    net.initialize()
    net.current_lr = 3e-4
    batch = make_batch(cf)
    rpn_losses = []
    for _ in range(16):
        res = net.train_forward(batch)
        assert np.isfinite(res["loss"])
        rpn_losses.append(float(res["logger_string"].split("rpn_class: ")[1].split(",")[0]))
    assert np.median(rpn_losses[-4:]) < np.median(rpn_losses[:4])


def test_get_coords_halo_ranking_and_clipping():
    from medicaldetectiontoolkit_tpu.models.detection_unet import get_coords

    # element 0: two components, the larger one touching the border
    m = np.zeros((1, 16, 16), np.uint8)
    m[0, 0:5, 0:5] = 1  # 25 voxels, at the corner
    m[0, 10:12, 10:12] = 1  # 4 voxels
    coords, comps = get_coords(m, n_components=5, dim=2)
    assert len(comps[0]) == 2
    # cropped boolean masks with their bbox slices, voxel counts preserved
    sl0, m0 = comps[0][0]
    assert m0.dtype == bool and m0.sum() == 25 and m0.shape == (5, 5)
    assert (sl0[0].start, sl0[1].start) == (0, 0)
    # largest first; -1/+1 halo clipped to [0, extent]
    np.testing.assert_array_equal(coords[0][0], [0, 0, 5, 5])
    np.testing.assert_array_equal(coords[0][1], [9, 9, 12, 12])
    # n_components caps the list
    coords_capped, comps_capped = get_coords(m, n_components=1, dim=2)
    assert len(coords_capped[0]) == 1 and len(comps_capped[0]) == 1

    # empty mask -> empty outputs
    coords_e, comps_e = get_coords(np.zeros((1, 8, 8), np.uint8), 3, 2)
    assert len(coords_e[0]) == 0 and len(comps_e[0]) == 0

    # 3D: z coords are [min, max+1] without halo, clipped to z extent
    m3 = np.zeros((1, 16, 16, 6), np.uint8)
    m3[0, 4:8, 4:8, 2:6] = 1
    coords3, _ = get_coords(m3, 3, dim=3)
    np.testing.assert_array_equal(coords3[0][0], [3, 3, 8, 8, 2, 6])


@pytest.mark.slow
def test_detection_unet_train_and_test():
    cf = make_config("detection_unet", dim=2)
    net = build_model(cf, _Log())
    net.initialize()
    batch = make_batch(cf)
    # make the seg multi-class so box extraction has work
    batch["seg"][0, 0, 5:15, 5:15] = 1
    res = net.train_forward(batch)
    assert np.isfinite(res["loss"])
    assert res["seg_preds"].shape == batch["seg"].shape
    res_t = net.test_forward({"data": batch["data"]})
    assert len(res_t["boxes"]) == cf.batch_size
    for bl in res_t["boxes"]:
        for b in bl:
            assert b["box_type"] == "det"
            assert b["box_score"] > cf.detection_min_confidence
