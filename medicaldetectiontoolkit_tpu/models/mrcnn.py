"""Mask R-CNN (2-stage detector), 2D + 3D; base for U-Faster R-CNN+.

Capability-parity rebuild of the reference's ``models/mrcnn.py``:
  * RPN over pyramid levels (shared 3x3 conv + 1x1 class/bbox heads);
  * proposal layer: per-element top-``pre_nms_limit`` by fg score, delta
    decode (rpn_bbox_std_dev), window clip, NMS at rpn_nms_threshold, padded
    to ``post_nms_rois_*`` (``models/mrcnn.py:297-369`` — the reference
    already pads to fixed proposal_count, so fixed shapes are
    behavior-compatible);
  * pyramid RoIAlign with FPN level assignment round(4 + log2(sqrt(h*w)))
    clamped to available levels, P6 override for h*w > 0.65
    (``models/mrcnn.py:373-457``);
  * TWO second-stage passes: a stop-gradient pass over ALL proposals (for
    detection output + loss sampling by predicted scores) and a gradient pass
    over the sampled RoIs only (``models/mrcnn.py:1022-1083``);
  * detection-target layer with per-element sampling: positives IoU >= 0.5
    (2D) / 0.3 (3D), negatives via SHEM on predicted fg scores, mask targets
    cut from GT masks with RoIAlign (``models/mrcnn.py:461-613``);
  * refine_detections: per-class expansion of all proposals, min-confidence
    filter, per-(element, class) NMS, per-element top-k
    (``models/mrcnn.py:620-714``);
  * losses: RPN class (CE + SHEM) / bbox (smooth L1), mrcnn class
    (CE over sampled RoIs), bbox (smooth L1, positives, class-specific
    deltas), mask (BCE, positives, class-specific channel); ``frcnn_mode``
    drops the mask head (``models/mrcnn.py:940-943``).

TPU re-design: every dynamic structure is fixed-size + masked; the entire
train step (both stages, both passes, target sampling, losses, grads, adam)
is ONE jitted program. RoIAlign and NMS are the XLA ops from ops/.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from medicaldetectiontoolkit_tpu.models import register
from medicaldetectiontoolkit_tpu.models import base
from medicaldetectiontoolkit_tpu.models.backbone import FPN, ConvND
from medicaldetectiontoolkit_tpu.ops import anchors as anchor_ops
from medicaldetectiontoolkit_tpu.ops import boxes as box_ops
from medicaldetectiontoolkit_tpu.ops import losses as loss_ops
from medicaldetectiontoolkit_tpu.ops import matching as match_ops
from medicaldetectiontoolkit_tpu.ops import nms as nms_ops
from medicaldetectiontoolkit_tpu.ops import roi_align as roi_ops
from medicaldetectiontoolkit_tpu.ops import roi_align_pallas as roi_pallas_ops


# ---------------------------------------------------------------------- #
#  flax heads                                                              #
# ---------------------------------------------------------------------- #


class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 class (2A) / bbox (2*dim*A) heads per level."""

    dim: int
    n_features: int
    n_anchors_per_pos: int
    anchor_stride: int = 1
    relu: str = "relu"
    weight_init: Optional[str] = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        kw = dict(dim=self.dim, weight_init=self.weight_init, dtype=self.dtype)
        x = ConvND(features=self.n_features, ks=3, stride=self.anchor_stride, pad=1, relu=self.relu, **kw)(x)
        logits = ConvND(features=2 * self.n_anchors_per_pos, ks=1, relu=None, **kw)(x)
        deltas = ConvND(features=2 * self.dim * self.n_anchors_per_pos, ks=1, relu=None, **kw)(x)
        b = x.shape[0]
        return logits.reshape(b, -1, 2).astype(jnp.float32), deltas.reshape(b, -1, 2 * self.dim).astype(jnp.float32)


class ClassifierHead(nn.Module):
    """pool_size conv -> 1x1 conv -> class + per-class box deltas, on pooled rois."""

    dim: int
    end_filts: int
    pool_size: Sequence[int]
    head_classes: int
    norm: Optional[str]
    relu: str
    weight_init: Optional[str] = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        # pooled: (R, *pool_size, C)
        norm = self.norm if self.norm != "instance_norm" else None  # 1x1 spatial: no instance norm
        x = nn.Conv(
            self.end_filts * 4, kernel_size=tuple(self.pool_size), padding="VALID", dtype=self.dtype
        )(pooled.astype(self.dtype))
        if norm == "batch_norm":
            x = nn.GroupNorm(num_groups=1, dtype=self.dtype)(x)
        x = nn.relu(x) if self.relu == "relu" else nn.leaky_relu(x, 0.01)
        x = ConvND(dim=self.dim, features=self.end_filts * 4, ks=1, relu=self.relu, norm=norm,
                   weight_init=self.weight_init, dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        logits = nn.Dense(self.head_classes, dtype=jnp.float32)(x)
        bbox = nn.Dense(self.head_classes * 2 * self.dim, dtype=jnp.float32)(x)
        return logits.astype(jnp.float32), bbox.reshape(-1, self.head_classes, 2 * self.dim).astype(jnp.float32)


class MaskHead(nn.Module):
    """4x conv3x3 -> deconv x2 -> 1x1 conv -> sigmoid per-class masks."""

    dim: int
    end_filts: int
    head_classes: int
    norm: Optional[str]
    relu: str
    weight_init: Optional[str] = None
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        kw = dict(dim=self.dim, norm=self.norm, relu=self.relu, weight_init=self.weight_init, dtype=self.dtype)
        x = pooled.astype(self.dtype)
        for _ in range(4):
            x = ConvND(features=self.end_filts, ks=3, pad=1, **kw)(x)
        x = nn.ConvTranspose(self.end_filts, kernel_size=(2,) * self.dim, strides=(2,) * self.dim, dtype=self.dtype)(x)
        x = nn.relu(x) if self.relu == "relu" else nn.leaky_relu(x, 0.01)
        x = ConvND(dim=self.dim, features=self.head_classes, ks=1, relu=None,
                   weight_init=self.weight_init, dtype=jnp.float32)(x)
        return jax.nn.sigmoid(x.astype(jnp.float32))  # (R, *mask_shape, n_classes)


class MRCNNModule(nn.Module):
    """FPN + RPN + classifier/mask heads, exposed as separate apply methods so
    the jitted step can interleave host-free control flow between them."""

    dim: int
    n_channels: int
    start_filts: int
    end_filts: int
    res_architecture: str
    norm: Optional[str]
    relu: str
    sixth_pooling: bool
    operate_stride1: bool
    weight_init: Optional[str]
    head_classes: int
    n_rpn_features: int
    n_anchors_per_pos: int
    anchor_stride: int
    pyramid_levels: Sequence[int]
    pool_size: Sequence[int]
    mask_pool_size: Sequence[int]
    with_mask_head: bool = True
    num_seg_classes: int = 0  # > 0 adds the ufrcnn P0 seg head
    remat: bool = False
    dtype: object = jnp.float32

    def setup(self):
        self.fpn = FPN(
            dim=self.dim,
            n_channels=self.n_channels,
            start_filts=self.start_filts,
            end_filts=self.end_filts,
            res_architecture=self.res_architecture,
            norm=self.norm,
            relu=self.relu,
            sixth_pooling=self.sixth_pooling,
            operate_stride1=self.operate_stride1,
            weight_init=self.weight_init,
            dtype=self.dtype,
            remat=self.remat,
        )
        self.rpn = RPNHead(
            dim=self.dim, n_features=self.n_rpn_features, n_anchors_per_pos=self.n_anchors_per_pos,
            anchor_stride=self.anchor_stride, relu=self.relu, weight_init=self.weight_init, dtype=self.dtype,
        )
        self.classifier = ClassifierHead(
            dim=self.dim, end_filts=self.end_filts, pool_size=self.pool_size, head_classes=self.head_classes,
            norm=self.norm, relu=self.relu, weight_init=self.weight_init, dtype=self.dtype,
        )
        if self.with_mask_head:
            self.mask = MaskHead(
                dim=self.dim, end_filts=self.end_filts, head_classes=self.head_classes,
                norm=self.norm, relu=self.relu, weight_init=self.weight_init, dtype=self.dtype,
            )
        if self.num_seg_classes:
            self.final_conv = ConvND(
                dim=self.dim, features=self.num_seg_classes, ks=1, relu=None,
                weight_init=self.weight_init, dtype=jnp.float32,
            )

    def extract(self, img):
        """img -> (rpn feature maps, rpn_logits (b,A,2), rpn_deltas (b,A,2d), seg_logits)."""
        fpn_outs = self.fpn(img.astype(self.dtype))
        seg_logits = None
        offset = 1 if self.operate_stride1 else 0
        if self.num_seg_classes:
            seg_logits = self.final_conv(fpn_outs[0])
        maps = [fpn_outs[i + offset] for i in self.pyramid_levels]
        outs = [self.rpn(p) for p in maps]
        rpn_logits = jnp.concatenate([o[0] for o in outs], axis=1)
        rpn_deltas = jnp.concatenate([o[1] for o in outs], axis=1)
        return maps, rpn_logits, rpn_deltas, seg_logits

    def classify_rois(self, feature_maps, boxes_norm, batch_ix):
        pooled = pyramid_roi_align(feature_maps, boxes_norm, batch_ix, tuple(self.pool_size), self.pyramid_levels)
        return self.classifier(pooled)

    def mask_rois(self, feature_maps, boxes_norm, batch_ix):
        pooled = pyramid_roi_align(feature_maps, boxes_norm, batch_ix, tuple(self.mask_pool_size), self.pyramid_levels)
        return self.mask(pooled)


# ---------------------------------------------------------------------- #
#  pure device helpers                                                     #
# ---------------------------------------------------------------------- #


def pyramid_roi_align(feature_maps, boxes_norm, batch_ix, pool_size, pyramid_levels):
    """FPN-level-assigned RoIAlign (``models/mrcnn.py:373-457``).

    boxes_norm: (R, 2*dim) normalized; batch_ix: (R,) int32.
    Level = clamp(round(4 + log2(sqrt(h*w))), first, last); with a 5th level,
    rois with h*w > 0.65 go to P6.

    Dispatch: on TPU backends the level-routed Pallas kernel streams only the
    assigned level's rows (``ops/roi_align_pallas.py``); elsewhere the XLA
    formulation aligns every roi against every level and selects by mask.
    Both are fixed-shape; gradients flow to the feature maps only.
    """
    h = boxes_norm[:, 2] - boxes_norm[:, 0]
    w = boxes_norm[:, 3] - boxes_norm[:, 1]
    hw = jnp.maximum(h * w, 1e-12)
    roi_level = jnp.round(4.0 + jnp.log(jnp.sqrt(hw)) / jnp.log(2.0)).astype(jnp.int32)
    roi_level = jnp.clip(roi_level, pyramid_levels[0], pyramid_levels[-1])
    if len(pyramid_levels) == 5:
        roi_level = jnp.where(hw > 0.65, 5, roi_level)
    levels_idx = roi_level - pyramid_levels[0]
    return roi_pallas_ops.pyramid_roi_align(
        list(feature_maps), boxes_norm, batch_ix, levels_idx, tuple(pool_size)
    )


def proposal_layer(rpn_probs_fg, rpn_deltas, anchors, cf, proposal_count: int):
    """RPN proposals: top-k -> decode -> clip -> NMS -> pad to fixed count.

    Returns (normalized boxes (b, P, 2d), out_proposals (b, P, 2d+1) with fg
    scores for monitoring, valid (b, P)). Padded slots are zero boxes, like
    the reference's zero padding (``models/mrcnn.py:352-358``).

    Proposals are non-differentiable by construction (the reference detaches
    them before RoIAlign, ``models/mrcnn.py:424``); stop_gradient here also
    keeps autodiff away from the Pallas NMS kernel, which has no JVP rule.
    """
    rpn_probs_fg = jax.lax.stop_gradient(rpn_probs_fg)
    rpn_deltas = jax.lax.stop_gradient(rpn_deltas)
    dim = cf.dim
    std = jnp.asarray(cf.rpn_bbox_std_dev, jnp.float32)
    window = jnp.asarray(cf.window, jnp.float32)
    norm = jnp.asarray(cf.scale, jnp.float32)
    k = min(cf.pre_nms_limit, anchors.shape[0])

    def prep(scores, deltas):
        top_scores, order = jax.lax.top_k(scores, k)
        boxes = box_ops.apply_box_deltas(anchors[order], deltas[order] * std)
        return box_ops.clip_boxes(boxes, window), top_scores

    boxes_b, scores_b = jax.vmap(prep)(rpn_probs_fg, rpn_deltas)  # (b, k, 2d), (b, k)
    keep_idx, keep_mask = nms_ops.batched_nms_auto(boxes_b, scores_b, cf.rpn_nms_threshold, proposal_count)

    def gather(boxes, top_scores, kidx, kmask):
        safe = jnp.clip(kidx, 0, k - 1)
        out_boxes = jnp.where(kmask[:, None], boxes[safe], 0.0)
        out_scores = jnp.where(kmask, top_scores[safe], 0.0)
        return out_boxes / norm, jnp.concatenate([out_boxes, out_scores[:, None]], axis=1), kmask

    return jax.vmap(gather)(boxes_b, scores_b, keep_idx, keep_mask)


def refine_detections(rois_norm, probs, deltas, batch_ix, cf, batch_size: int):
    """Second-stage detection refinement (``models/mrcnn.py:620-714``).

    rois_norm: (R, 2d) normalized proposals (R = b * P); probs: (R, C);
    deltas: (R, C, 2d). Expands every roi for every fg class, decodes the
    class-specific deltas (un-normalized by rpn_bbox_std_dev, per reference),
    clips + rounds, drops scores < model_min_confidence, per-(element, class)
    NMS at detection_nms_threshold, keeps top
    model_max_instances_per_batch_element per element.

    Returns (detections (b, max_inst, 2d+2) [coords, class, score], mask).
    """
    dim = cf.dim
    R, C = probs.shape
    n_fg = C - 1
    max_inst = cf.model_max_instances_per_batch_element
    std = jnp.asarray(cf.rpn_bbox_std_dev, jnp.float32)
    scale = jnp.asarray(cf.scale, jnp.float32)
    window = jnp.asarray(cf.window, jnp.float32)

    # (R, n_fg) candidates: class-specific score + decoded box
    cls_range = jnp.arange(1, C)
    cand_scores = probs[:, 1:].reshape(-1)  # (R*n_fg,) class-major per roi
    cand_class = jnp.tile(cls_range, R)
    cand_batch = jnp.repeat(batch_ix, n_fg)

    deltas_specific = deltas[:, 1:, :].reshape(-1, 2 * dim)  # (R*n_fg, 2d)
    rois_rep = jnp.repeat(rois_norm, n_fg, axis=0)
    boxes = box_ops.apply_box_deltas(rois_rep, deltas_specific * std) * scale
    boxes = jnp.round(box_ops.clip_boxes(boxes, window))

    conf_ok = cand_scores >= cf.model_min_confidence

    be_arr = jnp.repeat(jnp.arange(batch_size), n_fg)
    cl_arr = jnp.tile(cls_range, batch_size)

    # one NMS lane per (element, class); Pallas kernel on TPU backends
    lane_valid = (
        conf_ok[None, :]
        & (cand_batch[None, :] == be_arr[:, None])
        & (cand_class[None, :] == cl_arr[:, None])
    )
    lane_boxes = jnp.broadcast_to(boxes, (be_arr.shape[0],) + boxes.shape)
    lane_scores = jnp.broadcast_to(cand_scores, (be_arr.shape[0],) + cand_scores.shape)
    lane_idx, lane_mask = nms_ops.batched_nms_auto(
        lane_boxes, lane_scores, cf.detection_nms_threshold, max_inst, valid=lane_valid
    )
    lane_idx = lane_idx.reshape(batch_size, n_fg * max_inst)
    lane_mask = lane_mask.reshape(batch_size, n_fg * max_inst)

    merged_scores = jnp.where(lane_mask, cand_scores[jnp.clip(lane_idx, 0, R * n_fg - 1)], -jnp.inf)
    top_scores, top_pos = jax.lax.top_k(merged_scores, max_inst)
    final_idx = jnp.clip(jnp.take_along_axis(lane_idx, top_pos, axis=1), 0, R * n_fg - 1)
    final_mask = jnp.take_along_axis(lane_mask, top_pos, axis=1)

    det = jnp.concatenate(
        [boxes[final_idx], cand_class[final_idx][..., None].astype(jnp.float32), cand_scores[final_idx][..., None]],
        axis=-1,
    )
    return det, final_mask


def masked_topk_indices(key, k: int):
    """Indices of the k smallest keys; slots with key == +inf are invalid."""
    neg_vals, idx = jax.lax.top_k(-key, k)
    return idx, jnp.isfinite(neg_vals)


def detection_target_layer(rng, proposals_norm, prop_valid, class_scores, gt_boxes_norm, gt_ids, gt_valid,
                           gt_masks, cf):
    """Sample rois + build targets for the second-stage losses, per element.

    All inputs per batch element (vmap outside):
      proposals_norm (P, 2d), prop_valid (P,), class_scores (P, C),
      gt_boxes_norm (G, 2d), gt_ids (G,), gt_valid (G,),
      gt_masks (G, *spatial) float.

    Returns fixed-size slots: rois (S, 2d), slot_valid (S,), target_class
    (S,), target_deltas (S, 2d), target_masks (S, *mask_shape), pos_mask (S,),
    mask_pos (S,) where S = n_pos_slots + n_neg_slots. mask_pos is pos_mask
    restricted to rois whose assigned GT has a mask slot (gt_masks may hold
    fewer slots than gt_boxes when cf.max_gt_masks caps them for HBM).
    """
    dim = cf.dim
    P = proposals_norm.shape[0]
    n_pos_slots = max(1, int(cf.train_rois_per_image * cf.roi_positive_ratio))
    r = 1.0 / cf.roi_positive_ratio
    n_neg_slots = max(1, int(n_pos_slots * (r - 1.0)))
    pos_iou = 0.5 if dim == 2 else 0.3
    neg_iou = 0.1 if dim == 2 else 0.01

    rng_pos, rng_neg = jax.random.split(rng)
    any_gt = jnp.any(gt_valid)

    overlaps = box_ops.pairwise_iou(proposals_norm, gt_boxes_norm)  # (P, G)
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    roi_iou_max = jnp.max(overlaps, axis=1)
    pos_bool = (roi_iou_max >= pos_iou) & any_gt
    neg_bool = jnp.where(any_gt, roi_iou_max < neg_iou, jnp.ones((P,), bool))

    # --- positive sampling (uniform random among positives) ---
    rand = jax.random.uniform(rng_pos, (P,))
    pos_key = jnp.where(pos_bool, rand, jnp.inf)
    pos_idx, pos_valid = masked_topk_indices(pos_key, n_pos_slots)
    n_pos = jnp.sum(pos_valid).astype(jnp.int32)

    assignment = jnp.argmax(overlaps[pos_idx], axis=1)  # (S_pos,)
    pos_rois = proposals_norm[pos_idx]
    roi_gt_boxes = gt_boxes_norm[assignment]
    safe_gt = jnp.where(pos_valid[:, None], roi_gt_boxes, pos_rois + 1e-3)
    safe_rois = jnp.where((box_ops.box_area(pos_rois) > 0)[:, None], pos_rois, pos_rois + jnp.asarray(
        [0.0, 0.0, 1e-3, 1e-3] + ([0.0, 1e-3] if dim == 3 else []), jnp.float32))
    deltas = box_ops.box_refinement(safe_rois, safe_gt) / jnp.asarray(cf.bbox_std_dev, jnp.float32)
    deltas = jnp.where(pos_valid[:, None], deltas, 0.0)
    target_class_pos = jnp.where(pos_valid, gt_ids[assignment].astype(jnp.int32), 0)

    # mask targets: gather the assigned GT masks FIRST (S_pos small), then
    # RoIAlign to mask_shape — avoids materializing all padded GT masks in
    # float32 (gt_masks arrive uint8, possibly capped to fewer slots than
    # gt_boxes via cf.max_gt_masks). Positives matched to a GT beyond the
    # mask-slot cap get NO mask supervision (mask_pos False) rather than
    # silently training against another instance's mask.
    n_masks = gt_masks.shape[0]
    mask_in_range = assignment < n_masks
    mask_pos_valid = pos_valid & mask_in_range
    mask_assignment = jnp.clip(assignment, 0, n_masks - 1).astype(jnp.int32)
    sel_masks = gt_masks[mask_assignment].astype(jnp.float32)[..., None]  # (S_pos, *sp, 1)
    target_masks = roi_ops.roi_align(
        sel_masks, pos_rois, jnp.arange(pos_rois.shape[0], dtype=jnp.int32), tuple(cf.mask_shape)
    )[..., 0]
    target_masks = jnp.round(jnp.where(mask_pos_valid.reshape((-1,) + (1,) * dim), target_masks, 0.0))

    # --- negative sampling via SHEM on predicted fg scores ---
    fg_scores = jnp.max(class_scores[:, 1:], axis=-1)
    neg_count = jnp.maximum(jnp.round(n_pos * (r - 1.0)).astype(jnp.int32), 1)
    sel = loss_ops.shem_select(rng_neg, fg_scores, neg_bool & prop_valid, neg_count, n_neg_slots, cf.shem_poolsize)
    sel_key = jnp.where(sel, jax.random.uniform(rng_neg, (P,)), jnp.inf)
    neg_idx, neg_valid = masked_topk_indices(sel_key, n_neg_slots)

    rois = jnp.concatenate([pos_rois, proposals_norm[neg_idx]], axis=0)
    slot_valid = jnp.concatenate([pos_valid, neg_valid])
    target_class = jnp.concatenate([target_class_pos, jnp.zeros((n_neg_slots,), jnp.int32)])
    target_deltas = jnp.concatenate([deltas, jnp.zeros((n_neg_slots, 2 * dim), jnp.float32)])
    pad_masks = jnp.zeros((n_neg_slots,) + tuple(cf.mask_shape), jnp.float32)
    target_masks = jnp.concatenate([target_masks, pad_masks], axis=0)
    pos_mask = jnp.concatenate([pos_valid, jnp.zeros((n_neg_slots,), bool)])
    mask_pos = jnp.concatenate([mask_pos_valid, jnp.zeros((n_neg_slots,), bool)])
    return rois, slot_valid, target_class, target_deltas, target_masks, pos_mask, mask_pos


def mrcnn_class_loss(target_class, logits, slot_valid):
    ce = loss_ops.softmax_ce(logits, jnp.maximum(target_class, 0))
    return loss_ops.masked_mean(ce, slot_valid)


def mrcnn_bbox_loss(target_deltas, pred_deltas, target_class, pos_mask):
    cls = jnp.clip(target_class, 0, pred_deltas.shape[1] - 1)
    pred = jnp.take_along_axis(pred_deltas, cls[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    per = loss_ops.smooth_l1(pred, target_deltas)
    return loss_ops.masked_mean(per, jnp.broadcast_to(pos_mask[:, None], per.shape))


def mrcnn_mask_loss(target_masks, pred_masks, target_class, pos_mask):
    # pred_masks: (S, *mask_shape, C); select the target class channel
    cls = jnp.clip(target_class, 0, pred_masks.shape[-1] - 1)
    sel = jnp.take_along_axis(
        pred_masks, cls.reshape((-1,) + (1,) * (pred_masks.ndim - 1)).astype(jnp.int32), axis=-1
    )[..., 0]
    eps = 1e-7
    bce = -(target_masks * jnp.log(jnp.clip(sel, eps, 1.0)) + (1 - target_masks) * jnp.log(jnp.clip(1 - sel, eps, 1.0)))
    mask = jnp.broadcast_to(pos_mask.reshape((-1,) + (1,) * (bce.ndim - 1)), bce.shape)
    return loss_ops.masked_mean(bce, mask)


# ---------------------------------------------------------------------- #
#  detector                                                                #
# ---------------------------------------------------------------------- #


@register("mrcnn")
class MaskRCNNDetector(base.Detector):
    """Host-facing Mask R-CNN with the reference's train/test_forward API."""

    with_mask_head = True
    train_step_n_outputs = 4
    predict_n_outputs = 4  # (det, det_mask, det_masks_raw, seg_preds)
    with_seg_head = False  # ufrcnn overrides

    def build(self):
        cf = self.cf
        h, w = cf.patch_size[:2]
        if h % 2**5 or w % 2**5:
            raise ValueError("patch size must be divisible by 2**5")
        if len(cf.patch_size) == 3 and cf.patch_size[2] % 2**3:
            raise ValueError("patch z dimension must be divisible by 2**3")
        self.np_anchors = anchor_ops.generate_pyramid_anchors(cf, self.logger).astype(np.float32)
        self.anchors = jnp.asarray(self.np_anchors)
        self.module = MRCNNModule(
            dim=cf.dim,
            n_channels=cf.n_channels,
            start_filts=cf.start_filts,
            end_filts=cf.end_filts,
            res_architecture=cf.res_architecture,
            norm=cf.norm,
            relu=cf.relu,
            sixth_pooling=cf.sixth_pooling,
            operate_stride1=cf.operate_stride1,
            weight_init=cf.weight_init,
            head_classes=cf.head_classes,
            n_rpn_features=cf.n_rpn_features,
            n_anchors_per_pos=len(cf.rpn_anchor_ratios),
            anchor_stride=cf.rpn_anchor_stride,
            pyramid_levels=tuple(cf.pyramid_levels),
            pool_size=tuple(cf.pool_size),
            mask_pool_size=tuple(cf.mask_pool_size),
            with_mask_head=self.with_mask_head and not cf.frcnn_mode,
            num_seg_classes=cf.num_seg_classes if self.with_seg_head else 0,
            remat=base.resolve_remat(cf),
            dtype=jnp.bfloat16 if cf.compute_dtype == "bfloat16" else jnp.float32,
        )
        self._rng = jax.random.PRNGKey(cf.seed)
        self._train_step_fn = jax.jit(self._train_step, donate_argnums=(0, 1))
        self._loss_eval_fn = jax.jit(self._loss_eval, static_argnames=("with_masks",))
        self._predict_fn = jax.jit(self._predict, static_argnames=("with_masks",))
        self.current_lr = 1e-4

    def init_params(self, seed: int = 0):
        cf = self.cf
        img = jnp.zeros((1, *cf.patch_size, cf.n_channels), jnp.float32)

        def init_all(module):
            maps, rpn_logits, rpn_deltas, seg_logits = module.extract(img)
            rois = jnp.asarray([[0.1, 0.1, 0.6, 0.6] if cf.dim == 2 else [0.1, 0.1, 0.6, 0.6, 0.1, 0.6]], jnp.float32)
            bix = jnp.zeros((1,), jnp.int32)
            module.classify_rois(maps, rois, bix)
            if self.module.with_mask_head:
                module.mask_rois(maps, rois, bix)
            return rpn_logits

        # jit the init: eager init compiles every op separately (prohibitive
        # through a remote TPU compile service).
        return jax.jit(nn.init(init_all, self.module))(jax.random.PRNGKey(seed))["params"]

    # ---- core forward (shared by train/eval/predict) -------------------- #

    def _first_stage(self, params, img, training: bool):
        cf = self.cf
        maps, rpn_logits, rpn_deltas, seg_logits = self.module.apply(
            {"params": params}, img, method=self.module.extract
        )
        rpn_probs_fg = jax.nn.softmax(rpn_logits, axis=-1)[..., 1]
        proposal_count = cf.post_nms_rois_training if training else cf.post_nms_rois_inference
        rois_norm, out_proposals, prop_valid = proposal_layer(rpn_probs_fg, rpn_deltas, self.anchors, cf, proposal_count)
        return maps, rpn_logits, rpn_deltas, seg_logits, rois_norm, out_proposals, prop_valid

    def _second_stage_all(self, params, maps, rois_norm):
        """Stop-gradient pass over ALL proposals (monitoring + sampling).

        The reference bounds this pass's memory with ``cf.roi_chunk_size``
        (``models/mrcnn.py:1026-1035``: chunks of 600 rois in 3D) because
        b*post_nms_rois pooled features through two FC heads is the HBM peak.
        Here the same plan is a ``lax.map`` over fixed-size roi chunks: the
        classifier body compiles once and XLA reuses one chunk's activations
        per iteration. No gradient flows here, so the loop adds no remat cost.
        """
        bsz, P = rois_norm.shape[:2]
        flat_rois = rois_norm.reshape(-1, rois_norm.shape[-1])
        batch_ix = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), P)

        def classify(rois, bix):
            return self.module.apply(
                {"params": params}, maps, rois, bix, method=self.module.classify_rois
            )

        chunk = getattr(self.cf, "roi_chunk_size", None)
        R = flat_rois.shape[0]
        if chunk and R > chunk:
            pad = (-R) % chunk
            rois_c = jnp.pad(flat_rois, ((0, pad), (0, 0))).reshape(-1, chunk, flat_rois.shape[-1])
            bix_c = jnp.pad(batch_ix, (0, pad)).reshape(-1, chunk)
            logits, bbox = jax.lax.map(lambda ab: classify(*ab), (rois_c, bix_c))
            logits, bbox = jax.tree.map(
                lambda a: a.reshape((-1,) + a.shape[2:])[:R], (logits, bbox)
            )
        else:
            logits, bbox = classify(flat_rois, batch_ix)
        return jax.lax.stop_gradient(logits), jax.lax.stop_gradient(bbox), flat_rois, batch_ix

    def _detections_and_masks(self, params, maps, flat_rois, batch_ix, logits, bbox, bsz, with_masks: bool):
        cf = self.cf
        probs = jax.nn.softmax(logits, axis=-1)
        det, det_mask = refine_detections(flat_rois, probs, bbox, batch_ix, cf, bsz)
        det_masks_raw = None
        if with_masks and self.module.with_mask_head:
            scale = jnp.asarray(cf.scale, jnp.float32)
            det_boxes_norm = det[..., : 2 * cf.dim].reshape(-1, 2 * cf.dim) / scale
            det_bix = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), cf.model_max_instances_per_batch_element)
            m = self.module.apply(
                {"params": params}, maps, det_boxes_norm, det_bix, method=self.module.mask_rois
            )
            det_masks_raw = jax.lax.stop_gradient(
                m.reshape((bsz, cf.model_max_instances_per_batch_element) + m.shape[1:])
            )
        return det, det_mask, det_masks_raw

    def _losses(self, params, rng, img, gt_boxes, gt_ids, gt_valid, gt_masks, seg, with_masks: bool):
        cf = self.cf
        bsz = img.shape[0]
        neg_iou = 0.1 if cf.dim == 2 else 0.01
        scale = jnp.asarray(cf.scale, jnp.float32)

        maps, rpn_logits, rpn_deltas, seg_logits, rois_norm, out_proposals, prop_valid = self._first_stage(
            params, img, training=True
        )
        cls_logits_all, bbox_all, flat_rois, batch_ix = self._second_stage_all(params, maps, rois_norm)
        probs_all = jax.nn.softmax(cls_logits_all, axis=-1)

        # --- RPN losses (on-device matching; binary fg labels) ---
        rngs = jax.random.split(rng, bsz * 3).reshape(3, bsz, -1)
        rpn_match, rpn_tdeltas = jax.vmap(
            lambda r, gb, gv: match_ops.gt_anchor_matching(
                r, self.anchors, gb, jnp.ones_like(gv, jnp.int32), gv,
                cf.anchor_matching_iou, neg_iou, cf.rpn_train_anchors_per_image,
                jnp.asarray(cf.rpn_bbox_std_dev, jnp.float32),
            )
        )(rngs[0], gt_boxes, gt_valid)
        rpn_class_losses, neg_sel = jax.vmap(
            lambda r, m, cl: loss_ops.anchor_class_loss(r, m, cl, cf.shem_poolsize, cf.rpn_train_anchors_per_image // 2)
        )(rngs[1], rpn_match, rpn_logits)
        rpn_bbox_losses = jax.vmap(loss_ops.anchor_bbox_loss)(rpn_tdeltas, rpn_deltas, rpn_match)
        rpn_class_loss = jnp.mean(rpn_class_losses)
        rpn_bbox_loss = jnp.mean(rpn_bbox_losses)

        # --- detection target sampling + gradient pass ---
        gt_boxes_norm = gt_boxes / scale
        probs_pe = probs_all.reshape(bsz, -1, probs_all.shape[-1])
        sample = jax.vmap(
            lambda r, p, pv, sc, gb, gi, gv, gm: detection_target_layer(r, p, pv, sc, gb, gi, gv, gm, cf)
        )(rngs[2], rois_norm, prop_valid, probs_pe, gt_boxes_norm, gt_ids, gt_valid, gt_masks)
        s_rois, s_valid, s_class, s_deltas, s_masks, s_pos, s_mask_pos = sample

        S = s_rois.shape[1]
        flat_s_rois = s_rois.reshape(-1, s_rois.shape[-1])
        s_bix = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), S)
        s_logits, s_bbox = self.module.apply(
            {"params": params}, maps, flat_s_rois, s_bix, method=self.module.classify_rois
        )
        flat_class = s_class.reshape(-1)
        flat_valid = s_valid.reshape(-1)
        flat_pos = s_pos.reshape(-1)
        cls_loss = mrcnn_class_loss(flat_class, s_logits, flat_valid)
        bbox_loss = mrcnn_bbox_loss(s_deltas.reshape(-1, 2 * cf.dim), s_bbox, flat_class, flat_pos)

        mask_loss = jnp.float32(0.0)
        if self.module.with_mask_head:
            s_pred_masks = self.module.apply(
                {"params": params}, maps, flat_s_rois, s_bix, method=self.module.mask_rois
            )
            mask_loss = mrcnn_mask_loss(
                s_masks.reshape((-1,) + tuple(cf.mask_shape)), s_pred_masks, flat_class,
                s_mask_pos.reshape(-1)
            )

        loss = rpn_class_loss + rpn_bbox_loss + cls_loss + bbox_loss + mask_loss
        monitor = {
            "loss": loss,
            "class_loss": cls_loss,
            "rpn_class_loss": rpn_class_loss,
            "rpn_bbox_loss": rpn_bbox_loss,
            "mrcnn_bbox_loss": bbox_loss,
            "mrcnn_mask_loss": mask_loss,
        }
        if seg_logits is not None:
            seg_dice, seg_ce = loss_ops.fused_seg_loss(seg_logits, seg, cf.num_seg_classes)
            loss = loss + (seg_dice + seg_ce) / 2.0
            monitor["seg_dice_loss"] = seg_dice
            monitor["loss"] = loss

        max_half = max(cf.rpn_train_anchors_per_image // 2, 1)
        anchor_info = base.compact_anchor_indices(rpn_match, neg_sel, max_half, max_half)
        aux = {
            "maps": maps,
            "flat_rois": flat_rois,
            "batch_ix": batch_ix,
            "cls_logits_all": cls_logits_all,
            "bbox_all": bbox_all,
            "out_proposals": out_proposals,
            "anchor_info": anchor_info,
            "sampled_rois": s_rois,
            "sampled_valid": flat_valid.reshape(bsz, S),
            "sampled_class": s_class,
            "sampled_pos": s_pos,
            "seg_logits": seg_logits,
            "monitor": monitor,
        }
        return loss, aux

    def _finalize(self, params, aux, bsz, with_masks: bool):
        det, det_mask, det_masks_raw = self._detections_and_masks(
            params, aux["maps"], aux["flat_rois"], aux["batch_ix"],
            aux["cls_logits_all"], aux["bbox_all"], bsz, with_masks,
        )
        seg_preds = None
        if aux["seg_logits"] is not None:
            seg_preds = jnp.argmax(aux["seg_logits"], axis=-1).astype(jnp.uint8)[:, None]
        return det, det_mask, det_masks_raw, seg_preds

    # ---- jitted step functions ----------------------------------------- #

    def _train_step(self, params, opt_state, rng, lr, img, gt_boxes, gt_ids, gt_valid, gt_masks, seg):
        n_micro = base.resolve_grad_accum(self.cf, img.shape[0])
        if n_micro > 1:
            return self._train_step_accum(
                params, opt_state, rng, lr, img, gt_boxes, gt_ids, gt_valid, gt_masks, seg, n_micro
            )
        (loss, aux), grads = jax.value_and_grad(
            lambda p: self._losses(p, rng, img, gt_boxes, gt_ids, gt_valid, gt_masks, seg, with_masks=False),
            has_aux=True,
        )(params)
        updates, opt_state = self._optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        det, det_mask, det_masks_raw, seg_preds = self._finalize(params, aux, img.shape[0], with_masks=False)
        outs = {
            "det": det,
            "det_mask": det_mask,
            "det_masks_raw": det_masks_raw,
            "seg_preds": seg_preds,
            "anchor_info": aux["anchor_info"],
            "out_proposals": aux["out_proposals"],
            "sampled_rois": aux["sampled_rois"],
            "sampled_valid": aux["sampled_valid"],
            "sampled_class": aux["sampled_class"],
        }
        return params, opt_state, aux["monitor"], outs

    def _train_step_accum(self, params, opt_state, rng, lr, img, gt_boxes, gt_ids,
                          gt_valid, gt_masks, seg, n_micro: int):
        """Grad-accumulated step: scan microbatches, one optimizer update.

        mrcnn's aux carries flattened (m*P,) roi leaves and microbatch-LOCAL
        batch_ix values, so base.merge_microbatch_aux does not apply —
        detection refinement instead runs per microbatch (lax.map over the
        stacked aux, on the updated params like the monolithic path) and
        only the batch-leading outputs are merged.
        """
        (_, auxs), grads = base.accum_value_and_grad(
            lambda p, r, *b: self._losses(p, r, *b, with_masks=False),
            params, rng, (img, gt_boxes, gt_ids, gt_valid, gt_masks, seg), n_micro,
        )
        updates, opt_state = self._optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        m = img.shape[0] // n_micro
        fin = jax.lax.map(lambda a: self._finalize(params, a, m, with_masks=False), auxs)

        def merge(leaf):
            return leaf.reshape((leaf.shape[0] * leaf.shape[1],) + leaf.shape[2:])

        det, det_mask, det_masks_raw, seg_preds = jax.tree_util.tree_map(merge, fin)
        monitor = jax.tree_util.tree_map(jnp.mean, auxs["monitor"])
        outs = {
            "det": det,
            "det_mask": det_mask,
            "det_masks_raw": det_masks_raw,
            "seg_preds": seg_preds,
            "anchor_info": jax.tree_util.tree_map(merge, auxs["anchor_info"]),
            "out_proposals": merge(auxs["out_proposals"]),
            "sampled_rois": merge(auxs["sampled_rois"]),
            "sampled_valid": merge(auxs["sampled_valid"]),
            "sampled_class": merge(auxs["sampled_class"]),
        }
        return params, opt_state, monitor, outs

    def _loss_eval(self, params, rng, img, gt_boxes, gt_ids, gt_valid, gt_masks, seg, with_masks: bool = False):
        loss, aux = self._losses(params, rng, img, gt_boxes, gt_ids, gt_valid, gt_masks, seg, with_masks=with_masks)
        det, det_mask, det_masks_raw, seg_preds = self._finalize(params, aux, img.shape[0], with_masks=with_masks)
        outs = {
            "det": det,
            "det_mask": det_mask,
            "det_masks_raw": det_masks_raw,
            "seg_preds": seg_preds,
            "anchor_info": aux["anchor_info"],
            "out_proposals": aux["out_proposals"],
            "sampled_rois": aux["sampled_rois"],
            "sampled_valid": aux["sampled_valid"],
            "sampled_class": aux["sampled_class"],
        }
        return aux["monitor"], outs

    def _predict(self, params, img, with_masks: bool = True):
        bsz = img.shape[0]
        maps, rpn_logits, rpn_deltas, seg_logits, rois_norm, _, prop_valid = self._first_stage(
            params, img, training=False
        )
        logits, bbox, flat_rois, batch_ix = self._second_stage_all(params, maps, rois_norm)
        det, det_mask, det_masks_raw = self._detections_and_masks(
            params, maps, flat_rois, batch_ix, logits, bbox, bsz, with_masks
        )
        seg_preds = jnp.argmax(seg_logits, axis=-1).astype(jnp.uint8)[:, None] if seg_logits is not None else None
        return det, det_mask, det_masks_raw, seg_preds

    # ---- host API -------------------------------------------------------- #

    def _next_rng(self):
        self._rng, out = jax.random.split(self._rng)
        return out

    def _prep(self, batch):
        cf = self.cf
        img = base.image_to_device(batch["data"])
        bsz = img.shape[0]
        gt_boxes, gt_ids, gt_valid = base.pad_gt_boxes(
            batch["bb_target"], batch["roi_labels"], bsz, cf.dim, cf.max_gt_boxes
        )
        spatial = tuple(img.shape[1:-1])
        # masks stay uint8; cf.max_gt_masks (default: every GT box gets a
        # slot) can cap them below max_gt_boxes for HBM in full-res 3D —
        # positives assigned past the cap are then excluded from the mask
        # loss (see detection_target_layer) instead of corrupting targets
        max_gt_masks = min(cf.max_gt_boxes, getattr(cf, "max_gt_masks", None) or cf.max_gt_boxes)
        gt_masks = np.zeros((bsz, max_gt_masks) + spatial, dtype=np.uint8)
        if "roi_masks" in batch:
            for b in range(bsz):
                rm = np.asarray(batch["roi_masks"][b])
                # (n_rois, 1, *spatial) or (n_rois, *spatial)
                if rm.ndim == len(spatial) + 2:
                    rm = rm[:, 0]
                n = min(rm.shape[0], max_gt_masks)
                if n and rm.shape[1:] == spatial:
                    gt_masks[b, :n] = rm[:n]
        gt_masks = jnp.asarray(gt_masks)
        seg = (
            base.seg_to_device(batch["seg"])
            if (self.with_seg_head and "seg" in batch)
            else jnp.zeros((bsz, 1) + spatial, jnp.int32)
        )
        return img, gt_boxes, gt_ids, gt_valid, gt_masks, seg

    def _assemble_results(self, batch, monitor, outs, with_masks, box_results_list=None,
                          train_info=True, need_seg_preds=True):
        cf = self.cf
        img_shape = batch["data"].shape
        bsz = img_shape[0]
        if box_results_list is None:
            box_results_list = [[] for _ in range(bsz)]

        if train_info:
            base.add_gt_boxes_to_results(batch, box_results_list)
            base.add_anchor_boxes_to_results(
                cf, self.np_anchors, outs["anchor_info"], img_shape[2:], box_results_list
            )
            # top proposals for monitoring
            props = np.asarray(outs["out_proposals"])
            for b in range(bsz):
                order = np.argsort(-props[b, :, -1])
                for r in props[b][order][: getattr(cf, "n_plot_rpn_props", 5), :-1]:
                    box_results_list[b].append({"box_coords": r, "box_type": "prop"})
            # sampled rois (pos_class / neg_class)
            srois = np.asarray(outs["sampled_rois"])
            svalid = np.asarray(outs["sampled_valid"])
            sclass = np.asarray(outs["sampled_class"])
            for b in range(bsz):
                for s in np.flatnonzero(svalid[b]):
                    coords = srois[b, s] * np.asarray(cf.scale)
                    box_results_list[b].append(
                        {"box_coords": coords, "box_type": "pos_class" if sclass[b, s] > 0 else "neg_class"}
                    )

        base.detections_to_box_results(cf, outs["det"], outs["det_mask"], box_results_list)
        if need_seg_preds:
            seg_preds = self._make_seg_preds(outs, img_shape, with_masks)
        else:
            # skip the full-volume device->host pull; keep the (b,1,*sp)
            # shape contract with a cheap host-side zero volume
            seg_preds = np.zeros((bsz, 1) + tuple(img_shape[2:]), dtype=np.float32)
        return box_results_list, seg_preds

    def _make_seg_preds(self, outs, img_shape, with_masks):
        """mrcnn seg output: union of unmolded instance masks (fg binary)."""
        cf = self.cf
        if outs.get("seg_preds") is not None:  # ufrcnn semantic head
            return np.asarray(outs["seg_preds"])
        spatial = tuple(img_shape[2:])
        seg = np.zeros((img_shape[0], 1) + spatial, dtype=np.uint8)
        if not with_masks or outs.get("det_masks_raw") is None:
            return seg.astype(np.float32) if outs.get("det_masks_raw") is None and not with_masks else seg
        det = np.asarray(outs["det"])
        det_mask = np.asarray(outs["det_mask"])
        det_masks_raw = np.asarray(outs["det_masks_raw"])  # (b, maxI, *mask_shape, C)
        ncoords = 2 * cf.dim
        for b in range(det.shape[0]):
            full = np.zeros(spatial, dtype=np.float32)
            for i in np.flatnonzero(det_mask[b]):
                coords = det[b, i, :ncoords].astype(np.int32)
                cls = int(det[b, i, ncoords])
                if cls <= 0:
                    continue
                m = det_masks_raw[b, i, ..., cls]
                sizes = [max(int(coords[2] - coords[0]), 0), max(int(coords[3] - coords[1]), 0)]
                if cf.dim == 3:
                    sizes.append(max(int(coords[5] - coords[4]), 0))
                if any(s <= 0 for s in sizes):
                    continue
                full = np.maximum(full, base.unmold_mask(m, coords, spatial))
            seg[b, 0] = np.round(full).astype(np.uint8)
        return seg

    def train_forward_dispatch(self, batch, is_validation: bool = False, do_update: bool = True):
        """Enqueue one step and return un-forced handles (see the retina_net
        docstring — params/opt_state swap to async handles immediately so
        back-to-back dispatches chain on the device queue)."""
        cf = self.cf
        img, gt_boxes, gt_ids, gt_valid, gt_masks, seg = self._prep(batch)
        rng = self._next_rng()
        with_masks = bool(cf.return_masks_in_val) if is_validation else False
        if is_validation or not do_update:
            monitor, outs = self._loss_eval_fn(
                self.params, rng, img, gt_boxes, gt_ids, gt_valid, gt_masks, seg, with_masks=with_masks
            )
        else:
            lr = jnp.float32(self.current_lr)
            self.params, self.opt_state, monitor, outs = self._train_step_fn(
                self.params, self.opt_state, rng, lr, img, gt_boxes, gt_ids, gt_valid, gt_masks, seg
            )
        return monitor, outs, with_masks

    def train_forward_convert(self, handles, batch, need_seg_preds: bool = True):
        monitor, outs, with_masks = handles
        monitor = {k: float(v) for k, v in monitor.items()}
        boxes, seg_preds = self._assemble_results(
            batch, monitor, outs, with_masks, need_seg_preds=need_seg_preds
        )
        results = {
            "boxes": boxes,
            "seg_preds": seg_preds,
            "loss": monitor["loss"],
            "torch_loss": monitor["loss"],
            "monitor_values": {"loss": monitor["loss"], "class_loss": monitor["class_loss"]},
            "logger_string": (
                "loss: {0:.2f}, rpn_class: {1:.2f}, rpn_bbox: {2:.2f}, mrcnn_class: {3:.2f}, "
                "mrcnn_bbox: {4:.2f}, mrcnn_mask: {5:.2f}".format(
                    monitor["loss"], monitor["rpn_class_loss"], monitor["rpn_bbox_loss"],
                    monitor["class_loss"], monitor["mrcnn_bbox_loss"], monitor.get("mrcnn_mask_loss", 0.0),
                )
            ),
        }
        return results

    def test_forward_dispatch(self, batch, return_masks=True, **kwargs):
        img = base.image_to_device(batch["data"])
        return bool(return_masks), self._predict_fn(self.params, img, with_masks=bool(return_masks))

    def test_forward_convert(self, handles, batch, **kwargs):
        with_masks, (det, det_mask, det_masks_raw, seg_preds) = handles
        outs = {"det": det, "det_mask": det_mask, "det_masks_raw": det_masks_raw, "seg_preds": seg_preds}
        boxes = base.detections_to_box_results(self.cf, det, det_mask)
        seg_out = self._make_seg_preds(outs, batch["data"].shape, with_masks)
        return {"boxes": boxes, "seg_preds": seg_out}
