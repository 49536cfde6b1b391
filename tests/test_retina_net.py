"""RetinaNet / Retina U-Net smoke + behavior tests on tiny shapes."""

import numpy as np
import pytest

from medicaldetectiontoolkit_tpu.config import DefaultConfigs
from medicaldetectiontoolkit_tpu.models import build_model


def tiny_cf(model="retina_net", dim=2):
    cf = DefaultConfigs(model, dim=dim)
    cf.patch_size = [64, 64] if dim == 2 else [64, 64, 8]
    cf.n_channels = 1
    cf.start_filts = 4
    cf.end_filts = 8
    cf.res_architecture = "resnet50"
    cf.head_classes = 3
    cf.num_seg_classes = 2
    cf.n_rpn_features = 8
    cf.rpn_anchor_ratios = [0.5, 1, 2]
    cf.rpn_anchor_stride = 1
    cf.backbone_strides = {"xy": [4, 8, 16, 32], "z": [1, 2, 4, 8]}
    cf.rpn_anchor_scales = {"xy": [[8], [16], [32], [64]], "z": [[2], [4], [8], [16]]}
    # retina-style triple scales
    cf.rpn_anchor_scales["xy"] = [[s[0], s[0] * 2 ** (1 / 3), s[0] * 2 ** (2 / 3)] for s in cf.rpn_anchor_scales["xy"]]
    cf.rpn_anchor_scales["z"] = [[s[0], s[0] * 2 ** (1 / 3), s[0] * 2 ** (2 / 3)] for s in cf.rpn_anchor_scales["z"]]
    cf.n_anchors_per_pos = 9
    cf.pyramid_levels = [0, 1, 2, 3]
    cf.anchor_matching_iou = 0.5
    cf.rpn_train_anchors_per_image = 32
    cf.shem_poolsize = 10
    cf.pre_nms_limit = 500
    cf.model_max_instances_per_batch_element = 10
    cf.detection_nms_threshold = 1e-5
    cf.model_min_confidence = 0.1
    cf.max_gt_boxes = 8
    if dim == 2:
        cf.rpn_bbox_std_dev = np.array([0.1, 0.1, 0.2, 0.2])
        cf.window = np.array([0, 0, 64, 64])
        cf.scale = np.array([64, 64, 64, 64])
        cf.backbone_shapes = np.array([[int(np.ceil(64 / s))] * 2 for s in cf.backbone_strides["xy"]])
    else:
        cf.rpn_bbox_std_dev = np.array([0.1, 0.1, 0.1, 0.2, 0.2, 0.2])
        cf.window = np.array([0, 0, 64, 64, 0, 8])
        cf.scale = np.array([64, 64, 64, 64, 8, 8])
        cf.backbone_shapes = np.array(
            [[int(np.ceil(64 / s)), int(np.ceil(64 / s)), int(np.ceil(8 / sz))]
             for s, sz in zip(cf.backbone_strides["xy"], cf.backbone_strides["z"])]
        )
    cf.operate_stride1 = model == "retina_unet"
    return cf


def tiny_batch(dim=2, bsz=2):
    rng = np.random.RandomState(42)
    shape = (bsz, 1, 64, 64) if dim == 2 else (bsz, 1, 64, 64, 8)
    data = rng.rand(*shape).astype(np.float32)
    seg = np.zeros((bsz, 1) + shape[2:], dtype=np.uint8)
    if dim == 2:
        boxes = [np.array([[10, 10, 30, 30]], np.float32), np.array([[5, 20, 25, 40], [40, 40, 60, 60]], np.float32)]
        seg[0, 0, 10:30, 10:30] = 1
    else:
        boxes = [np.array([[10, 10, 30, 30, 2, 6]], np.float32), np.array([[5, 20, 25, 40, 0, 4]], np.float32)]
        seg[0, 0, 10:30, 10:30, 2:6] = 1
    labels = [np.array([1]), np.array([2, 1])[: len(boxes[1])]]
    return {"data": data, "seg": seg, "bb_target": boxes, "roi_labels": labels, "pid": ["a", "b"]}


class _Log:
    def info(self, *a, **k):
        pass


@pytest.mark.parametrize("dim", [2, 3])
def test_retina_net_train_step_runs_and_learns_shape(dim):
    cf = tiny_cf("retina_net", dim)
    net = build_model(cf, _Log())
    net.initialize()
    batch = tiny_batch(dim)
    res = net.train_forward(batch)
    assert np.isfinite(res["loss"])
    assert len(res["boxes"]) == 2
    types = {b["box_type"] for bl in res["boxes"] for b in bl}
    assert "gt" in types and "pos_anchor" in types
    assert res["seg_preds"].shape == batch["seg"].shape


def test_retina_net_loss_decreases_on_repeated_batch():
    cf = tiny_cf("retina_net", 2)
    net = build_model(cf, _Log())
    net.initialize()
    net.current_lr = 3e-4
    batch = tiny_batch(2)
    losses = [net.train_forward(batch)["loss"] for _ in range(14)]
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_pipelined_dispatch_matches_serial_train_forward():
    """The trainer's one-step-deep pipeline (dispatch i+1 before converting i)
    must produce the same params and per-step results as the serial loop —
    params/opt_state chain through async device handles, not host values."""
    import jax

    batches = [tiny_batch(2), tiny_batch(2), tiny_batch(2)]
    for b in batches[1:]:
        b["data"] = b["data"] + np.random.RandomState(0).rand(*b["data"].shape).astype(np.float32) * 0.1

    def run(pipelined):
        cf = tiny_cf("retina_net", 2)
        net = build_model(cf, _Log())
        net.initialize(seed=11)
        outs = []
        if pipelined:
            pending = None
            for b in batches:
                h = net.train_forward_dispatch(b)
                if pending is not None:
                    outs.append(net.train_forward_convert(*pending))
                pending = (h, b)
            outs.append(net.train_forward_convert(*pending))
        else:
            outs = [net.train_forward(b) for b in batches]
        return outs, jax.device_get(net.params)

    serial_outs, serial_params = run(False)
    pipe_outs, pipe_params = run(True)
    for a, b in zip(serial_outs, pipe_outs):
        assert a["loss"] == b["loss"]
        assert a["logger_string"] == b["logger_string"]
        assert len(a["boxes"]) == len(b["boxes"])
    for pa, pb in zip(jax.tree_util.tree_leaves(serial_params), jax.tree_util.tree_leaves(pipe_params)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_retina_net_test_forward():
    cf = tiny_cf("retina_net", 2)
    net = build_model(cf, _Log())
    net.initialize()
    res = net.test_forward({"data": tiny_batch(2)["data"]})
    assert len(res["boxes"]) == 2
    for bl in res["boxes"]:
        for b in bl:
            assert b["box_type"] == "det"
            assert b["box_score"] >= cf.model_min_confidence
            assert len(b["box_coords"]) == 4


def test_retina_unet_seg_outputs():
    cf = tiny_cf("retina_unet", 2)
    net = build_model(cf, _Log())
    net.initialize()
    batch = tiny_batch(2)
    res = net.train_forward(batch)
    assert res["seg_preds"].shape == batch["seg"].shape
    assert res["seg_preds"].dtype == np.uint8
    assert np.isfinite(res["loss"])


def test_validation_does_not_update_params():
    import jax

    cf = tiny_cf("retina_net", 2)
    net = build_model(cf, _Log())
    net.initialize()
    before = jax.device_get(net.params)
    net.train_forward(tiny_batch(2), is_validation=True)
    after = jax.device_get(net.params)
    leaves_b = jax.tree_util.tree_leaves(before)
    leaves_a = jax.tree_util.tree_leaves(after)
    assert all(np.array_equal(a, b) for a, b in zip(leaves_a, leaves_b))
