"""Evaluator tests: matching rules, COCO AP, patient aggregation."""

import numpy as np
import pandas as pd
import pytest

from medicaldetectiontoolkit_tpu.evaluator import Evaluator, compute_roi_ap, get_roi_ap_from_df


class _Log:
    def info(self, *a, **k):
        pass

    def warning(self, *a, **k):
        pass


class _Cf:
    def __init__(self, tmp_path):
        self.class_dict = {1: "benign", 2: "malignant"}
        self.ap_match_ious = [0.1]
        self.report_score_level = ["patient", "rois"]
        self.patient_class_of_interest = 2
        self.min_det_thresh = 0.1
        self.per_patient_ap = False
        self.plot_prediction_histograms = False
        self.plot_stat_curves = False
        self.scan_det_thresh = False
        self.model_selection_criteria = ["benign_ap", "malignant_ap"]
        self.fold = 0
        self.n_cv_splits = 5
        self.exp_dir = str(tmp_path)
        self.plot_dir = str(tmp_path)


def det(coords, score, cl):
    return {"box_coords": np.array(coords), "box_score": score, "box_type": "det", "box_pred_class_id": cl}


def gt(coords, cl):
    return {"box_coords": np.array(coords), "box_label": cl, "box_type": "gt"}


def run_eval(cf, results_list, mode="test"):
    ev = Evaluator(cf, _Log(), mode=mode)
    ev.evaluate_predictions(results_list)
    return ev


class TestMatching:
    def test_perfect_detection_is_tp(self, tmp_path):
        cf = _Cf(tmp_path)
        boxes = [[det([0, 0, 10, 10], 0.9, 1), gt([0, 0, 10, 10], 1)]]
        ev = run_eval(cf, [[boxes, "p0"]])
        df = ev.test_df
        assert (df[df.pred_class == 1].det_type == "det_tp").any()
        assert not (df[df.pred_class == 1].det_type == "det_fn").any()

    def test_miss_is_fn_and_spurious_is_fp(self, tmp_path):
        cf = _Cf(tmp_path)
        boxes = [[det([50, 50, 60, 60], 0.7, 1), gt([0, 0, 10, 10], 1)]]
        ev = run_eval(cf, [[boxes, "p0"]])
        df = ev.test_df[ev.test_df.pred_class == 1]
        assert (df.det_type == "det_fp").sum() == 1
        assert (df.det_type == "det_fn").sum() == 1

    def test_double_assignment_keeps_max_score(self, tmp_path):
        cf = _Cf(tmp_path)
        boxes = [[det([0, 0, 10, 10], 0.9, 1), det([1, 1, 10, 10], 0.95, 1), gt([0, 0, 10, 10], 1)]]
        ev = run_eval(cf, [[boxes, "p0"]])
        df = ev.test_df[ev.test_df.pred_class == 1]
        tp = df[df.det_type == "det_tp"]
        fp = df[df.det_type == "det_fp"]
        assert len(tp) == 1 and abs(tp.pred_score.iloc[0] - 0.95) < 1e-6
        assert len(fp) == 1 and abs(fp.pred_score.iloc[0] - 0.9) < 1e-6

    def test_empty_patient_gets_tn_dummy(self, tmp_path):
        cf = _Cf(tmp_path)
        ev = run_eval(cf, [[[[]], "p0"]])
        assert (ev.test_df.det_type == "patient_tn").sum() == 2  # one per class

    def test_class_separation(self, tmp_path):
        cf = _Cf(tmp_path)
        # detection of class 2 does not match gt of class 1
        boxes = [[det([0, 0, 10, 10], 0.9, 2), gt([0, 0, 10, 10], 1)]]
        ev = run_eval(cf, [[boxes, "p0"]])
        df1 = ev.test_df[ev.test_df.pred_class == 1]
        df2 = ev.test_df[ev.test_df.pred_class == 2]
        assert (df1.det_type == "det_fn").sum() == 1
        assert (df2.det_type == "det_fp").sum() == 1


class TestAP:
    def test_perfect_ap(self):
        df = pd.DataFrame({"class_label": [1, 1], "pred_score": [0.9, 0.8], "det_type": ["det_tp", "det_tp"],
                           "match_iou": [0.1, 0.1], "pid": ["a", "b"]})
        assert compute_roi_ap(df, all_p=2) > 0.99

    def test_all_fp_ap_zero(self):
        df = pd.DataFrame({"class_label": [0, 0], "pred_score": [0.9, 0.8], "det_type": ["det_fp", "det_fp"],
                           "match_iou": [0.1, 0.1], "pid": ["a", "b"]})
        out = get_roi_ap_from_df([df, 0.1, False])
        assert out == 0.0 or np.isnan(out)

    def test_half_precision(self):
        # 1 tp at high score, 1 fn -> recall caps at 0.5
        df = pd.DataFrame({"class_label": [1, 1], "pred_score": [0.9, 0.0], "det_type": ["det_tp", "det_fn"],
                           "match_iou": [0.1, 0.1], "pid": ["a", "a"]})
        ap = get_roi_ap_from_df([df, 0.1, False])
        assert 0.4 < ap < 0.6

    def test_min_det_thresh_filters(self):
        df = pd.DataFrame({"class_label": [1], "pred_score": [0.05], "det_type": ["det_tp"],
                           "match_iou": [0.1], "pid": ["a"]})
        ap = get_roi_ap_from_df([df, 0.1, False])
        assert ap == 0.0  # the only tp is below threshold


class TestMetricsAndScoring:
    def test_return_metrics_and_monitoring(self, tmp_path):
        cf = _Cf(tmp_path)
        results = []
        for i in range(4):
            label = 1 if i % 2 else 2
            boxes = [[det([0, 0, 10, 10], 0.9 - 0.05 * i, label), gt([0, 0, 10, 10], label)]]
            results.append([boxes, f"p{i}"])
        ev = run_eval(cf, results)
        monitor = {"benign_ap": [None], "malignant_ap": [None], "patient_ap": [None], "patient_auc": [None]}
        stats, monitor = ev.return_metrics(monitor)
        names = [s["name"] for s in stats]
        assert any("rois" in n for n in names)
        assert any("patient" in n for n in names)
        assert stats[-1]["name"] == "average_foreground_roi"
        assert monitor["benign_ap"][-1] is not None

    def test_score_test_df_writes_results(self, tmp_path):
        import os

        cf = _Cf(tmp_path)
        boxes = [[det([0, 0, 10, 10], 0.9, 1), gt([0, 0, 10, 10], 1)]]
        ev = run_eval(cf, [[boxes, "p0"]])
        ev.score_test_df()
        assert os.path.exists(os.path.join(cf.exp_dir, "results.txt"))
        assert os.path.exists(os.path.join(cf.exp_dir, "0_test_df.pickle"))
