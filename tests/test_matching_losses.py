"""Tests for gt_anchor_matching, SHEM and the masked losses."""

import numpy as np
import jax
import jax.numpy as jnp

from medicaldetectiontoolkit_tpu.ops import matching as M
from medicaldetectiontoolkit_tpu.ops import losses as L


def pad_gt(gt_boxes, gt_ids, max_gt, dim):
    G = len(gt_boxes)
    boxes = np.zeros((max_gt, 2 * dim), np.float32)
    ids = np.zeros((max_gt,), np.int32)
    valid = np.zeros((max_gt,), bool)
    if G:
        boxes[:G] = gt_boxes
        ids[:G] = gt_ids
        valid[:G] = True
    return jnp.array(boxes), jnp.array(ids), jnp.array(valid)


STD = np.array([0.1, 0.1, 0.2, 0.2], np.float32)


def run_match(anchors, gt, ids, max_pos=64, pos_iou=0.7, neg_iou=0.1, seed=0):
    b, i, v = pad_gt(gt, ids, 8, anchors.shape[1] // 2)
    return M.gt_anchor_matching(
        jax.random.PRNGKey(seed), jnp.array(anchors), b, i, v, pos_iou, neg_iou, max_pos, jnp.array(STD)
    )


def test_perfect_match_is_positive():
    anchors = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    gt = np.array([[0, 0, 10, 10]], np.float32)
    matches, deltas = run_match(anchors, gt, [2])
    matches = np.asarray(matches)
    assert matches[0] == 2
    assert matches[1] == -1  # IoU 0 < 0.1 -> negative
    np.testing.assert_allclose(np.asarray(deltas)[0], 0.0, atol=1e-6)


def test_every_gt_gets_an_anchor_even_below_iou():
    # gt barely overlaps any anchor; its best anchor must still be positive
    anchors = np.array([[0, 0, 10, 10], [100, 100, 110, 110]], np.float32)
    gt = np.array([[8, 8, 30, 30]], np.float32)
    matches, _ = run_match(anchors, gt, [1])
    assert np.asarray(matches)[0] == 1


def test_neutral_band():
    # anchor with IoU between neg and pos thresholds that is NOT a gt argmax -> neutral
    anchors = np.array([[0, 0, 10, 10], [0, 0, 9, 10]], np.float32)
    gt = np.array([[0, 0, 10, 10]], np.float32)  # anchor0 IoU 1.0, anchor1 IoU 0.9
    matches, _ = run_match(anchors, gt, [1], pos_iou=0.95)
    m = np.asarray(matches)
    assert m[0] == 1
    assert m[1] == 0  # 0.9 in (0.1, 0.95): neutral


def test_empty_gt_all_negative():
    anchors = np.array([[0, 0, 10, 10], [5, 5, 20, 20]], np.float32)
    matches, deltas = run_match(anchors, np.zeros((0, 4), np.float32), [])
    assert (np.asarray(matches) == -1).all()
    np.testing.assert_allclose(np.asarray(deltas), 0.0)


def test_positive_subsampling_cap():
    # 100 anchors all perfectly on a gt -> positives capped at max_pos // 2
    anchors = np.tile(np.array([[0, 0, 10, 10]], np.float32), (100, 1))
    gt = np.array([[0, 0, 10, 10]], np.float32)
    matches, _ = run_match(anchors, gt, [1], max_pos=10)
    assert (np.asarray(matches) > 0).sum() == 5


def test_delta_normalization():
    anchors = np.array([[0, 0, 10, 10]], np.float32)
    gt = np.array([[1, 2, 11, 14]], np.float32)  # dy=0.1, dx=0.3, dh=0, dw=log(1.2)
    _, deltas = run_match(anchors, gt, [1])
    want = np.array([0.1, 0.3, 0.0, np.log(1.2)]) / STD
    np.testing.assert_allclose(np.asarray(deltas)[0], want, atol=1e-3)  # fp32 log


def test_match_3d():
    anchors = np.array([[0, 0, 10, 10, 0, 4], [40, 40, 50, 50, 8, 12]], np.float32)
    gt = np.array([[0, 0, 10, 10, 0, 4]], np.float32)
    b, i, v = pad_gt(gt, [1], 4, 3)
    matches, deltas = M.gt_anchor_matching(
        jax.random.PRNGKey(0), jnp.array(anchors), b, i, v, 0.3, 0.01, 64,
        jnp.array([0.1, 0.1, 0.1, 0.2, 0.2, 0.2]),
    )
    m = np.asarray(matches)
    assert m[0] == 1 and m[1] == -1


class TestShem:
    def test_pool_and_count(self):
        rng = jax.random.PRNGKey(1)
        scores = jnp.array(np.linspace(1, 0, 100, dtype=np.float32))
        neg = jnp.ones(100, bool)
        sel = L.shem_select(rng, scores, neg, n_pos=jnp.int32(4), max_count=32, poolsize=5)
        sel = np.asarray(sel)
        assert sel.sum() == 4
        # all selections come from the top 20 scores (pool = 5 * 4)
        assert sel[:20].sum() == 4

    def test_at_least_one_negative(self):
        rng = jax.random.PRNGKey(2)
        scores = jnp.array(np.random.rand(50).astype(np.float32))
        neg = jnp.ones(50, bool)
        sel = L.shem_select(rng, scores, neg, n_pos=jnp.int32(0), max_count=32, poolsize=10)
        assert np.asarray(sel).sum() == 1

    def test_no_negatives_available(self):
        rng = jax.random.PRNGKey(3)
        scores = jnp.zeros(10)
        neg = jnp.zeros(10, bool)
        sel = L.shem_select(rng, scores, neg, n_pos=jnp.int32(3), max_count=32, poolsize=10)
        assert np.asarray(sel).sum() == 0


class TestLosses:
    def test_smooth_l1(self):
        x = jnp.array([0.0, 0.5, 1.0, 2.0, -3.0])
        out = np.asarray(L.smooth_l1(x, jnp.zeros(5)))
        np.testing.assert_allclose(out, [0.0, 0.125, 0.5, 1.5, 2.5])

    def test_masked_mean_empty(self):
        assert float(L.masked_mean(jnp.ones(4), jnp.zeros(4, bool))) == 0.0

    def test_anchor_class_loss_balanced(self):
        rng = jax.random.PRNGKey(0)
        matches = jnp.array([1, 2, -1, -1, 0], dtype=jnp.int32)
        logits = jnp.array(
            [[0.0, 5.0, 0.0], [0.0, 0.0, 5.0], [5.0, 0.0, 0.0], [0.0, 3.0, 0.0], [9.0, 9.0, 9.0]]
        )
        loss, neg_sel = L.anchor_class_loss(rng, matches, logits, shem_poolsize=2, max_neg=8)
        assert float(loss) >= 0
        assert np.asarray(neg_sel).sum() == 2  # negative_count = n_pos = 2

    def test_anchor_bbox_loss_masks_nonpositive(self):
        matches = jnp.array([1, -1, 0], dtype=jnp.int32)
        target = jnp.array([[0.5, 0, 0, 0], [9, 9, 9, 9], [9, 9, 9, 9]])
        pred = jnp.zeros((3, 4))
        loss = L.anchor_bbox_loss(target, pred, matches)
        np.testing.assert_allclose(float(loss), 0.125 / 4, atol=1e-6)

    def test_batch_dice_perfect(self):
        y = jnp.array(np.eye(3)[np.random.randint(0, 3, (2, 8, 8))].transpose(0, 3, 1, 2))
        assert float(L.batch_dice(y, y)) > 0.999

    def test_weighted_ce_uniform_matches_plain(self):
        logits = jnp.array(np.random.randn(2, 3, 4, 4).astype(np.float32))
        labels = jnp.array(np.random.randint(0, 3, (2, 1, 4, 4)))
        a = float(L.weighted_ce(logits, labels))
        b = float(L.weighted_ce(logits, labels, [1.0, 1.0, 1.0]))
        np.testing.assert_allclose(a, b, rtol=1e-5)


class TestFusedSegLoss:
    """fused_seg_loss == batch_dice/weighted_ce on the channel-first transpose."""

    def _reference(self, logits_last, seg, n_classes, fpw=1.0, weights=None):
        import jax.numpy as jnp
        logits_cf = jnp.moveaxis(jnp.asarray(logits_last), -1, 1)
        probs = jax.nn.softmax(logits_cf, axis=1)
        onehot = L.one_hot_channels(jnp.asarray(seg), n_classes)
        dice = 1.0 - L.batch_dice(probs, onehot, false_positive_weight=fpw)
        ce = L.weighted_ce(logits_cf, jnp.asarray(seg), weights)
        return float(dice), float(ce)

    def test_matches_composition_2d(self, rng):
        logits = rng.randn(2, 16, 16, 3).astype(np.float32)
        seg = rng.randint(0, 3, (2, 1, 16, 16)).astype(np.int32)
        dice, ce = L.fused_seg_loss(jnp.asarray(logits), jnp.asarray(seg), 3)
        want_dice, want_ce = self._reference(logits, seg, 3)
        np.testing.assert_allclose(float(dice), want_dice, rtol=1e-5)
        np.testing.assert_allclose(float(ce), want_ce, rtol=1e-5)

    def test_matches_composition_3d_weighted(self, rng):
        logits = rng.randn(2, 8, 8, 4, 2).astype(np.float32)
        seg = rng.randint(0, 2, (2, 1, 8, 8, 4)).astype(np.int32)
        dice, ce = L.fused_seg_loss(jnp.asarray(logits), jnp.asarray(seg), 2,
                                    false_positive_weight=10.0, class_weights=[0.3, 1.7])
        want_dice, want_ce = self._reference(logits, seg, 2, fpw=10.0, weights=[0.3, 1.7])
        np.testing.assert_allclose(float(dice), want_dice, rtol=1e-5)
        np.testing.assert_allclose(float(ce), want_ce, rtol=1e-5)

    def test_bf16_logits_accepted(self, rng):
        logits = rng.randn(1, 8, 8, 3).astype(np.float32)
        seg = rng.randint(0, 3, (1, 1, 8, 8)).astype(np.int32)
        d32, c32 = L.fused_seg_loss(jnp.asarray(logits), jnp.asarray(seg), 3)
        dbf, cbf = L.fused_seg_loss(jnp.asarray(logits, jnp.bfloat16), jnp.asarray(seg), 3)
        np.testing.assert_allclose(float(dbf), float(d32), rtol=2e-2, atol=1e-2)
        np.testing.assert_allclose(float(cbf), float(c32), rtol=2e-2, atol=1e-2)
