"""Shared tiny/synthetic config + batch builders for tests, dry runs, benches."""

from __future__ import annotations

import numpy as np

from medicaldetectiontoolkit_tpu.config import DefaultConfigs


def make_config(model="retina_net", dim=2, patch_size=None, start_filts=4, end_filts=8,
                batch_size=2, retina_scales=True):
    """Small but complete detector config (toy-experiment geometry scaled down)."""
    cf = DefaultConfigs(model, dim=dim)
    if patch_size is None:
        patch_size = [64, 64] if dim == 2 else [64, 64, 8]
    cf.patch_size = list(patch_size)
    cf.batch_size = batch_size
    cf.n_channels = 1
    cf.start_filts = start_filts
    cf.end_filts = end_filts
    cf.res_architecture = "resnet50"
    cf.head_classes = 3
    cf.num_seg_classes = 2
    cf.n_rpn_features = 8
    cf.rpn_anchor_ratios = [0.5, 1, 2]
    cf.rpn_anchor_stride = 1
    cf.backbone_strides = {"xy": [4, 8, 16, 32], "z": [1, 2, 4, 8]}
    cf.rpn_anchor_scales = {"xy": [[8], [16], [32], [64]], "z": [[2], [4], [8], [16]]}
    if retina_scales:
        cf.rpn_anchor_scales["xy"] = [[s[0], s[0] * 2 ** (1 / 3), s[0] * 2 ** (2 / 3)] for s in cf.rpn_anchor_scales["xy"]]
        cf.rpn_anchor_scales["z"] = [[s[0], s[0] * 2 ** (1 / 3), s[0] * 2 ** (2 / 3)] for s in cf.rpn_anchor_scales["z"]]
        cf.n_anchors_per_pos = 9
    else:
        cf.n_anchors_per_pos = 3
    cf.pyramid_levels = [0, 1, 2, 3]
    cf.anchor_matching_iou = 0.5
    cf.rpn_train_anchors_per_image = 32
    cf.shem_poolsize = 10
    cf.pre_nms_limit = 500
    cf.model_max_instances_per_batch_element = 10
    cf.detection_nms_threshold = 1e-5
    cf.model_min_confidence = 0.1
    cf.max_gt_boxes = 8
    ps = cf.patch_size
    if dim == 2:
        cf.rpn_bbox_std_dev = np.array([0.1, 0.1, 0.2, 0.2])
        cf.bbox_std_dev = np.array([0.1, 0.1, 0.2, 0.2])
        cf.window = np.array([0, 0, ps[0], ps[1]])
        cf.scale = np.array([ps[0], ps[1], ps[0], ps[1]])
        cf.backbone_shapes = np.array(
            [[int(np.ceil(ps[0] / s)), int(np.ceil(ps[1] / s))] for s in cf.backbone_strides["xy"]]
        )
    else:
        cf.rpn_bbox_std_dev = np.array([0.1, 0.1, 0.1, 0.2, 0.2, 0.2])
        cf.bbox_std_dev = np.array([0.1, 0.1, 0.1, 0.2, 0.2, 0.2])
        cf.window = np.array([0, 0, ps[0], ps[1], 0, ps[2]])
        cf.scale = np.array([ps[0], ps[1], ps[0], ps[1], ps[2], ps[2]])
        cf.backbone_shapes = np.array(
            [
                [int(np.ceil(ps[0] / s)), int(np.ceil(ps[1] / s)), int(np.ceil(ps[2] / sz))]
                for s, sz in zip(cf.backbone_strides["xy"], cf.backbone_strides["z"])
            ]
        )
    cf.operate_stride1 = model in ("retina_unet", "ufrcnn", "detection_unet")
    # mrcnn-family extras
    cf.rpn_nms_threshold = 0.7
    cf.train_rois_per_image = 8
    cf.roi_positive_ratio = 0.5
    cf.pool_size = (7, 7) if dim == 2 else (7, 7, 3)
    cf.mask_pool_size = (14, 14) if dim == 2 else (14, 14, 5)
    cf.mask_shape = (28, 28) if dim == 2 else (28, 28, 10)
    cf.roi_chunk_size = 100
    cf.post_nms_rois_training = 50
    cf.post_nms_rois_inference = 50
    cf.n_plot_rpn_props = 3
    cf.return_masks_in_val = True
    cf.return_masks_in_test = False
    # detection_unet specifics
    cf.class_dict = {1: "benign", 2: "malignant"}
    cf.n_roi_candidates = 3
    cf.seg_loss_mode = "dice_wce"
    cf.fp_dice_weight = 1
    cf.wce_weights = [1] * cf.num_seg_classes
    cf.aggregation_operation = "max"
    cf.detection_min_confidence = 0.1
    cf.min_det_thresh = 0.1
    if model == "ufrcnn":
        cf.frcnn_mode = True
        cf.num_seg_classes = 3
        cf.wce_weights = [1] * cf.num_seg_classes
    if model == "detection_unet":
        cf.num_seg_classes = 3
        cf.head_classes = cf.num_seg_classes
        cf.wce_weights = [1] * cf.num_seg_classes
    return cf


def make_batch(cf, seed=42):
    """Synthetic batch dict in the framework's data contract."""
    rng = np.random.RandomState(seed)
    dim = cf.dim
    bsz = cf.batch_size
    shape = (bsz, cf.n_channels, *cf.patch_size)
    data = rng.rand(*shape).astype(np.float32)
    seg = np.zeros((bsz, 1) + tuple(cf.patch_size), dtype=np.uint8)
    boxes, labels, roi_masks = [], [], []
    ps = cf.patch_size
    for b in range(bsz):
        y1, x1 = rng.randint(2, ps[0] // 2, 2)
        y2 = y1 + rng.randint(8, ps[0] // 2)
        x2 = x1 + rng.randint(8, ps[1] // 2)
        if dim == 2:
            boxes.append(np.array([[y1, x1, y2, x2]], np.float32))
            seg[b, 0, y1:y2, x1:x2] = 1
        else:
            z1 = rng.randint(0, max(1, ps[2] // 2))
            z2 = min(z1 + rng.randint(2, max(3, ps[2] // 2 + 1)), ps[2])
            boxes.append(np.array([[y1, x1, y2, x2, z1, z2]], np.float32))
            seg[b, 0, y1:y2, x1:x2, z1:z2] = 1
        labels.append(np.array([rng.randint(1, cf.head_classes)]))
        # per-roi full-res binary masks (mrcnn's data contract; others ignore)
        roi_masks.append(seg[b][None].copy())
    return {
        "data": data,
        "seg": seg,
        "bb_target": boxes,
        "roi_labels": labels,
        "roi_masks": roi_masks,
        "pid": [str(i) for i in range(bsz)],
        "class_target": np.array([[l[0] - 1] for l in labels]),
    }
