"""Analysis-mode tests: reload raw prediction pickles + consolidate."""

import os
import pickle

import numpy as np

from medicaldetectiontoolkit_tpu.predictor import Predictor


class _Log:
    def info(self, *a, **k):
        pass


class _Cf:
    def __init__(self, tmp):
        self.exp_dir = str(tmp)
        self.fold_dir = os.path.join(str(tmp), "fold_0")
        os.makedirs(self.fold_dir, exist_ok=True)
        self.fold = 0
        self.hold_out_test_set = False
        self.test_aug = True
        self.test_n_epochs = 2
        self.wcs_iou = 1e-5
        self.merge_2D_to_3D_preds = False
        self.merge_3D_iou = 0.1
        self.class_dict = {1: "benign", 2: "malignant"}


def _raw_boxes(score=0.9):
    return [
        [
            [
                {
                    "box_coords": np.array([10.0, 10.0, 30.0, 30.0]),
                    "box_score": score,
                    "box_type": "det",
                    "box_pred_class_id": 1,
                    "patch_id": "0_0",
                    "box_patch_center_factor": 1.0,
                    "box_n_overlaps": 1.0,
                },
                {"box_coords": np.array([8.0, 8.0, 32.0, 32.0]), "box_label": 1, "box_type": "gt"},
            ]
        ],
        "patient_0",
    ]


def test_load_saved_predictions_with_wbc(tmp_path):
    cf = _Cf(tmp_path)
    with open(os.path.join(cf.fold_dir, "raw_pred_boxes_list.pickle"), "wb") as h:
        pickle.dump([_raw_boxes()], h)

    predictor = Predictor(cf, net=None, logger=_Log(), mode="analysis")
    out = predictor.load_saved_predictions(apply_wbc=True)
    assert len(out) == 1
    boxes, pid = out[0]
    assert pid == "patient_0"
    dets = [b for b in boxes[0] if b["box_type"] == "det"]
    gts = [b for b in boxes[0] if b["box_type"] == "gt"]
    assert len(gts) == 1
    assert len(dets) == 1
    # n_ens = test_n_epochs * 4 (TTA) = 8 expected preds; 1 present
    np.testing.assert_allclose(dets[0]["box_score"], 0.9 / 8, atol=1e-6)


def test_hold_out_aggregation_across_folds(tmp_path):
    cf = _Cf(tmp_path)
    cf.hold_out_test_set = True
    cf.folds = [0, 1]
    for fold in (0, 1):
        fold_dir = os.path.join(cf.exp_dir, f"fold_{fold}")
        os.makedirs(fold_dir, exist_ok=True)
        with open(os.path.join(fold_dir, "raw_pred_boxes_hold_out_list.pickle"), "wb") as h:
            pickle.dump([_raw_boxes(0.8 + 0.1 * fold)], h)

    predictor = Predictor(cf, net=None, logger=_Log(), mode="analysis")
    out = predictor.load_saved_predictions(apply_wbc=True)
    assert len(out) == 1
    dets = [b for b in out[0][0][0] if b["box_type"] == "det"]
    assert len(dets) == 1  # two fold predictions clustered into one
