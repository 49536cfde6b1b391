"""Loss functions + SHEM negative mining, fixed-shape and masked.

Device-side equivalents of the reference's loss path:
  * ``shem`` (stochastic hard example mining, ``utils/model_utils.py:674-691``)
    as a fixed-size masked selection;
  * anchor classification loss with SHEM negatives
    (``models/retina_net.py:126-164``) — note the reference uses CE + SHEM,
    *not* focal loss, and we preserve that;
  * smooth-L1 bbox loss over positive anchors
    (``models/retina_net.py:167-187``);
  * soft batch dice over the batch pseudo-volume, foreground classes only
    (``utils/model_utils.py:833-858``), and weighted CE for segmentation.

All means over dynamic subsets (positives / sampled negatives) are computed
as masked sums divided by masked counts, which is exactly the reference's
``F.cross_entropy(...)``/``F.smooth_l1_loss(...)`` element means.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from medicaldetectiontoolkit_tpu.ops import topk as topk_ops


def masked_mean(values, mask, default=0.0):
    """Mean of values where mask, or ``default`` if the mask is empty."""
    mask = mask.astype(values.dtype)
    count = jnp.sum(mask)
    return jnp.where(count > 0, jnp.sum(values * mask) / jnp.maximum(count, 1.0), default)


def softmax_ce(logits, labels):
    """Per-element softmax cross entropy with integer labels; (...,) out.

    The label pick is a one-hot multiply-sum, not take_along_axis: a gather
    indexed by a ~674k-element label vector costs tens of ms on TPU while the
    masked sum over the (small) class dim is a fused VPU pass.

    Labels outside [0, n_classes) contribute ZERO loss (no class matches the
    one-hot sum) — unlike a clamped take_along_axis. Callers that want clamp
    semantics must clamp first (all current callers do, via jnp.maximum).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    lab = labels.astype(jnp.int32)
    picked = 0.0
    for c in range(logits.shape[-1]):
        picked = picked + jnp.where(lab == c, logp[..., c], 0.0)
    return -picked


def smooth_l1(pred, target):
    """Elementwise smooth-L1 (huber, beta=1), matching F.smooth_l1_loss."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)


def shem_select(rng, fg_scores, neg_mask, n_pos, max_count: int, poolsize: int):
    """Stochastic hard example mining over a fixed-size candidate set.

    Reference semantics (``utils/model_utils.py:674-691``): sort negatives by
    highest foreground score, draw ``negative_count = max(1, n_pos)`` samples
    uniformly from the top ``poolsize * negative_count`` pool.

    Args:
      rng: PRNG key.
      fg_scores: (N,) max foreground probability per candidate.
      neg_mask: (N,) bool — candidates eligible as negatives.
      n_pos: traced int — number of positives (sets the negative count).
      max_count: static upper bound on sampled negatives
        (e.g. rpn_train_anchors_per_image // 2).
      poolsize: cf.shem_poolsize.

    Returns:
      sel_mask: (N,) bool — the sampled hard negatives.
    """
    N = fg_scores.shape[0]
    negative_count = jnp.clip(n_pos, 1, max_count)
    n_neg_avail = jnp.sum(neg_mask)
    negative_count = jnp.minimum(negative_count, n_neg_avail)

    # static pool bound: only the top poolsize*max_count negatives can ever be
    # in the pool, so a top-k replaces a full argsort. Exact top-k, not
    # approx_max_k: hard negatives cluster spatially around objects, and
    # approx_max_k keeps one max per positional bin — clustered hard negatives
    # would be systematically dropped from the pool, breaking the reference's
    # exact top-(poolsize*count) SHEM contract.
    k_pool = min(poolsize * max_count, N)
    score_key = jnp.where(neg_mask, fg_scores, -jnp.inf)
    pool_vals, pool_idx = jax.lax.top_k(score_key, k_pool)  # descending
    in_pool = (jnp.arange(k_pool) < poolsize * negative_count) & (pool_vals > -jnp.inf)

    # uniform draw of negative_count from the pool (again via top-k)
    rand = jax.random.uniform(rng, (k_pool,))
    draw_key = jnp.where(in_pool, rand, jnp.inf)
    neg_draw_vals, draw_pos = jax.lax.top_k(-draw_key, min(max_count, k_pool))
    take = (jnp.arange(draw_pos.shape[0]) < negative_count) & jnp.isfinite(neg_draw_vals)

    sel = jnp.zeros((N,), bool)
    scatter_ix = jnp.where(take, pool_idx[draw_pos], N)  # N -> dropped
    return sel.at[scatter_ix].set(True, mode="drop")


def anchor_class_loss(rng, matches, class_logits, shem_poolsize: int, max_neg: int):
    """(pos CE + SHEM-neg CE) / 2, the one-stage anchor loss.

    matches: (A,) int32 from gt_anchor_matching. class_logits: (A, n_classes).
    Returns (loss, neg_sel_mask) — the mask marks SHEM-sampled negatives (for
    monitoring, like the reference's np_neg_ix).
    """
    pos_mask = matches > 0
    neg_mask = matches == -1

    ce = softmax_ce(class_logits, jnp.maximum(matches, 0))
    pos_loss = masked_mean(ce, pos_mask)

    probs = jax.nn.softmax(class_logits, axis=-1)
    fg_scores = jnp.max(probs[:, 1:], axis=-1)
    n_pos = jnp.sum(pos_mask).astype(jnp.int32)
    neg_sel = shem_select(rng, fg_scores, neg_mask, n_pos, max_neg, shem_poolsize)
    ce_bg = softmax_ce(class_logits, jnp.zeros_like(matches))
    neg_loss = masked_mean(ce_bg, neg_sel)

    return (pos_loss + neg_loss) / 2.0, neg_sel


def anchor_bbox_loss(target_deltas, pred_deltas, matches):
    """Smooth-L1 over positive anchors' deltas (mean over elements)."""
    pos = (matches > 0)[:, None]
    per_elem = smooth_l1(pred_deltas, target_deltas)
    return masked_mean(per_elem, jnp.broadcast_to(pos, per_elem.shape))


def one_hot_channels(labels, n_classes: int):
    """(b, 1, *spatial) int -> (b, n_classes, *spatial) one-hot (channel-first,
    mirroring the reference's host-side helper layout)."""
    oh = jax.nn.one_hot(labels[:, 0], n_classes, axis=-1)  # (b, *spatial, C)
    return jnp.moveaxis(oh, -1, 1)


def batch_dice(pred, y, false_positive_weight: float = 1.0, smooth: float = 1e-6):
    """Soft dice over the whole batch pseudo-volume, fg classes only.

    pred: (b, C, *spatial) softmax probs; y: (b, C, *spatial) one-hot.
    Matches ``utils/model_utils.py:833-858`` (returns mean over classes 1..C).
    """
    axes = (0,) + tuple(range(2, pred.ndim))
    intersect = jnp.sum(pred * y, axis=axes)
    denom = jnp.sum(false_positive_weight * pred + y, axis=axes)
    dice_per_class = (2.0 * intersect + smooth) / (denom + smooth)
    return jnp.mean(dice_per_class[1:])


def fused_seg_loss(seg_logits, seg, n_classes: int, false_positive_weight: float = 1.0,
                   class_weights=None):
    """Soft batch dice + weighted CE, fused over channel-LAST logits.

    Numerically equivalent to ``batch_dice``/``weighted_ce`` on the
    channel-first transpose, but computed directly on the seg head's natural
    (b, *spatial, C) layout with no moveaxis, no one-hot materialization and
    no label gather — just fused elementwise work + per-class reductions.
    This matters on TPU: at LIDC 3D full resolution the transposed
    (b, C=3, ...) f32 intermediates lane-pad 3 -> 128 and turned a <10 ms
    loss into 66 ms/step (round-2 ablation).

    Args:
      seg_logits: (b, *spatial, C) raw logits.
      seg: (b, 1, *spatial) integer labels (reference batch layout).
      n_classes: C (static).
      false_positive_weight: dice denominator weight on predictions
        (``utils/model_utils.py:833-858``).
      class_weights: optional (C,) CE weights (torch F.cross_entropy
        ``weight=`` semantics: weighted mean normalized by applied weights).

    Returns:
      (dice_loss, ce): dice_loss = 1 - mean fg-class dice; ce scalar.
    """
    lab = seg[:, 0].astype(jnp.int32)  # (b, *spatial)
    # unstack the class dim into per-class SPATIAL arrays immediately: a
    # trailing size-2/3 dim forces XLA into lane-padded/transposed layouts at
    # 3D full resolution (measured ~50 ms/step of kLoop relayout fusions in
    # jvp(log_softmax)); per-class rank-(1+dim) arrays keep every op in the
    # conv output's natural spatial layout.
    chans = [seg_logits[..., c].astype(jnp.float32) for c in range(n_classes)]
    mx = chans[0]
    for c in range(1, n_classes):
        mx = jnp.maximum(mx, chans[c])
    sumexp = sum(jnp.exp(ch - mx) for ch in chans)
    lse = mx + jnp.log(sumexp)

    intersect, psum, count, lp_y = [], [], [], 0.0
    for c in range(n_classes):
        m = (lab == c).astype(jnp.float32)
        logp_c = chans[c] - lse
        probs_c = jnp.exp(logp_c)
        intersect.append(jnp.sum(probs_c * m))
        psum.append(jnp.sum(probs_c))
        count.append(jnp.sum(m))
        lp_y = lp_y + logp_c * m
    intersect = jnp.stack(intersect)
    denom = false_positive_weight * jnp.stack(psum) + jnp.stack(count)
    dice_per_class = (2.0 * intersect + 1e-6) / (denom + 1e-6)
    dice_loss = 1.0 - jnp.mean(dice_per_class[1:])

    if class_weights is None:
        ce = -jnp.mean(lp_y)
    else:
        w = jnp.asarray(class_weights, jnp.float32)
        w_vox = w[lab]
        ce = -jnp.sum(lp_y * w_vox) / jnp.maximum(jnp.sum(w_vox), 1e-8)
    return dice_loss, ce


def weighted_ce(logits, labels, class_weights=None):
    """Pixelwise CE with optional per-class weights.

    logits: (b, C, *spatial); labels: (b, 1, *spatial) int.
    Matches torch F.cross_entropy(weight=...) semantics: weighted mean with
    normalization by the sum of applied weights.
    """
    labels = labels[:, 0].astype(jnp.int32)  # (b, *spatial)
    logits_last = jnp.moveaxis(logits, 1, -1)
    ce = softmax_ce(logits_last, labels)
    if class_weights is None:
        return jnp.mean(ce)
    w = jnp.asarray(class_weights, dtype=ce.dtype)[labels]
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1e-8)
