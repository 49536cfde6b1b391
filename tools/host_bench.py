#!/usr/bin/env python
"""Host-path microbenchmarks (no device needed): WBC consolidation,
2D->3D merge, evaluation, spatial augmentation.

The device step is pipelined against these host stages (Predictor /
trainer dispatch-convert split), so host throughput bounds end-to-end
patients/s once the chip is fast enough. Reference counterparts:
``/root/reference/predictor.py:597-773`` (WBC, nms_2to3D),
``/root/reference/evaluator.py``, batchgenerators' spatial transforms.

Prints one JSON line per metric:
  {"metric": "...", "value": N, "unit": "..."}
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _boxes(rng, n, dim, img=320):
    lo = rng.uniform(0, img - 40, (n, dim))
    ext = rng.uniform(8, 40, (n, dim))
    hi = np.minimum(lo + ext, img)
    if dim == 2:
        coords = np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1]], 1)
    else:
        coords = np.stack([lo[:, 0], lo[:, 1], hi[:, 0], hi[:, 1], lo[:, 2], hi[:, 2]], 1)
    return coords


def bench_wbc(n_boxes=4000, dim=3, reps=3):
    from medicaldetectiontoolkit_tpu.predictor import weighted_box_clustering

    rng = np.random.RandomState(0)
    coords = _boxes(rng, n_boxes, dim)
    dets = np.concatenate(
        [coords, rng.uniform(0.1, 1, (n_boxes, 1)),
         rng.uniform(0.5, 1, (n_boxes, 1)), rng.uniform(1, 4, (n_boxes, 1))], axis=1
    )
    pids = rng.randint(0, 20, n_boxes).astype(str)
    weighted_box_clustering(dets, pids, 0.5, 5)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        keep_scores, _ = weighted_box_clustering(dets, pids, 0.5, 5)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": f"wbc_{dim}d_{n_boxes}boxes", "value": round(dt * 1e3, 1),
            "unit": "ms", "clusters": len(keep_scores)}


def bench_nms_2to3d(n_boxes=3000, reps=3):
    from medicaldetectiontoolkit_tpu.predictor import nms_2to3D

    rng = np.random.RandomState(1)
    coords = _boxes(rng, n_boxes, 2)
    dets = np.concatenate(
        [coords, rng.uniform(0.1, 1, (n_boxes, 1)),
         rng.randint(0, 64, (n_boxes, 1)).astype(float)], axis=1
    )
    nms_2to3D(dets, 0.1)
    t0 = time.perf_counter()
    for _ in range(reps):
        keep_ix, _ = nms_2to3D(dets, 0.1)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": f"nms_2to3d_{n_boxes}boxes", "value": round(dt * 1e3, 1),
            "unit": "ms", "kept": len(keep_ix)}


def bench_evaluator(n_patients=100, boxes_per=30, reps=3):
    from medicaldetectiontoolkit_tpu.evaluator import Evaluator

    class _Log:
        def info(self, *a, **k):
            pass

        def __getattr__(self, name):
            return self.info

    class _Cf:
        dim = 3
        class_dict = {1: "benign", 2: "malignant"}
        ap_match_ious = [0.1]
        report_score_level = ["patient", "rois"]
        patient_class_of_interest = 2
        min_det_thresh = 0.1
        scan_det_thresh = False
        per_patient_ap = False
        model_selection_criteria = ["benign_ap", "malignant_ap"]
        plot_prediction_histograms = False
        plot_dir = "/tmp/host_bench_plots"
        exp_dir = "/tmp/host_bench_plots"
        fold = 0
        plot_stat_curves = False
        n_cv_splits = 99  # never aggregates cross-fold in this bench
        test_aug = False
        test_n_epochs = 1

    rng = np.random.RandomState(2)
    results = []
    for pix in range(n_patients):
        blist = []
        for _ in range(boxes_per):
            c = _boxes(rng, 1, 3)[0]
            blist.append({"box_type": "det", "box_coords": c,
                          "box_score": float(rng.uniform(0.1, 1)),
                          "box_pred_class_id": int(rng.randint(1, 3))})
            if rng.rand() < 0.3:
                blist.append({"box_type": "gt", "box_coords": c + rng.uniform(-3, 3, c.shape),
                              "box_label": int(rng.randint(1, 3))})
        results.append([[blist], f"p{pix}"])

    t0 = time.perf_counter()
    for _ in range(reps):
        ev = Evaluator(_Cf(), _Log(), mode="test")
        ev.evaluate_predictions(results)
        ev.score_test_df()
    dt = (time.perf_counter() - t0) / reps
    return {"metric": f"evaluator_{n_patients}pat_{boxes_per}box", "value": round(dt, 2),
            "unit": "s"}


def bench_augmentation(reps=3):
    from medicaldetectiontoolkit_tpu.data.augmentation import spatial_augment_batch

    rng = np.random.RandomState(3)
    data = rng.rand(1, 1, 156, 156, 96).astype(np.float32)
    seg = (rng.rand(1, 1, 156, 156, 96) > 0.95).astype(np.uint8)
    da_kwargs = {
        "do_elastic_deform": True, "alpha": (0.0, 1500.0), "sigma": (30.0, 50.0),
        "do_rotation": True, "angle_x": (0, 0.3), "angle_y": (0, 0), "angle_z": (0, 0),
        "do_scale": True, "scale": (0.8, 1.1), "random_crop": False,
        "order_data": 1, "border_cval_data": 0,
    }
    spatial_augment_batch(data, seg, (128, 128, 64), da_kwargs, rng)
    t0 = time.perf_counter()
    for _ in range(reps):
        spatial_augment_batch(data, seg, (128, 128, 64), da_kwargs, rng)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": "augment_3d_patch", "value": round(dt * 1e3, 0), "unit": "ms"}


if __name__ == "__main__":
    os.makedirs("/tmp/host_bench_plots", exist_ok=True)
    for fn in (bench_wbc, bench_nms_2to3d, bench_evaluator, bench_augmentation):
        print(json.dumps(fn()), flush=True)
