"""Object- and patient-level evaluation (COCO-style AP, ROC-AUC).

Behavior-equivalent rebuild of the reference's ``evaluator.py``:
  * det<->gt matching per (match_iou x class x patient x batch element) into a
    long-format dataframe with det_type in {det_tp, det_fp, det_fn,
    patient_tn}; double assignments keep the max-score candidate, the rest
    become fp (COCO rule, ``evaluator.py:110-132``);
  * roi-level AP via the COCO 101-point interpolation
    (``evaluator.py:402-437``), patient-level ROC-AUC/AP on per-pid max
    aggregation (``evaluator.py:237-249``);
  * cross-fold aggregation writing results.txt / results_table.txt
    (``evaluator.py:316-357``), det-threshold scanning, and the tiny random
    perturbation that keeps model selection rankable on small datasets
    (``evaluator.py:309-311``).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd
from sklearn.metrics import average_precision_score, precision_recall_curve, roc_auc_score, roc_curve


def _iou_matrix(boxes1, boxes2):
    """Plain-IoU matrix (NumPy, matches ops.boxes.pairwise_iou offset 0)."""
    dim = 2 if boxes1.shape[1] == 4 else 3
    inter = np.ones((len(boxes1), len(boxes2)))
    a1 = np.ones(len(boxes1))
    a2 = np.ones(len(boxes2))
    for ax in range(dim):
        lo, hi = (0, 2) if ax == 0 else (1, 3) if ax == 1 else (4, 5)
        seg = np.minimum(boxes1[:, hi][:, None], boxes2[:, hi][None]) - np.maximum(
            boxes1[:, lo][:, None], boxes2[:, lo][None]
        )
        inter *= np.maximum(seg, 0.0)
        a1 *= boxes1[:, hi] - boxes1[:, lo]
        a2 *= boxes2[:, hi] - boxes2[:, lo]
    union = a1[:, None] + a2[None] - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1), 0.0)


class Evaluator:
    def __init__(self, cf, logger, mode="test"):
        """mode: 'train', 'val_sampling', 'val_patient' or 'test'."""
        self.cf = cf
        self.logger = logger
        self.mode = mode
        self.test_df = None

    def evaluate_predictions(self, results_list, monitor_metrics=None):
        """Match detections to GT and build the long-format results dataframe.

        results_list: train/val_sampling form
        [[[box_lists...], [pids...]], ...] (one entry per batch) or patient
        form [[results, pid], ...].
        """
        rows = {k: [] for k in ("pred_score", "class_label", "pred_class", "pid", "det_type")}
        self.logger.info(f"evaluating in mode {self.mode}")

        if self.mode == "train" or self.mode == "val_sampling":
            batch_elements_list = [[b_box_list] for item in results_list for b_box_list in item[0]]
            pid_list = [pid for item in results_list for pid in item[1]]
        else:
            batch_elements_list = [item[0] for item in results_list]
            pid_list = [item[1] for item in results_list]

        match_iou_col = []
        for match_iou in self.cf.ap_match_ious:
            self.logger.info(f"evaluating with match_iou: {match_iou}")
            for cl in list(self.cf.class_dict.keys()):
                for pix, pid in enumerate(pid_list):
                    len_before_patient = len(rows["pid"])
                    for b_boxes_list in batch_elements_list[pix]:
                        self._match_element(rows, b_boxes_list, cl, pid, match_iou)
                    # true-negative dummy so empty patients stay in patient stats
                    if len(rows["pid"]) == len_before_patient:
                        rows["pred_score"].append(0)
                        rows["class_label"].append(0)
                        rows["pred_class"].append(cl)
                        rows["pid"].append(pid)
                        rows["det_type"].append("patient_tn")
            match_iou_col += [match_iou] * (len(rows["pid"]) - len(match_iou_col))

        self.test_df = pd.DataFrame(
            {
                "pred_score": rows["pred_score"],
                "class_label": rows["class_label"],
                "pred_class": rows["pred_class"],
                "pid": rows["pid"],
                "det_type": rows["det_type"],
                "fold": getattr(self.cf, "fold", 0),
                "match_iou": match_iou_col,
            }
        )
        if monitor_metrics is not None:
            return self.return_metrics(monitor_metrics)

    def _match_element(self, rows, b_boxes_list, cl, pid, match_iou):
        """One batch element x one class: emit tp/fp/fn rows.

        Matching contract (reference ``evaluator.py:100-160``, vectorized
        here over a det x gt assignment matrix): a detection matches the GT
        with its highest IoU if that IoU exceeds match_iou; when several
        detections claim the same GT, only the highest-scoring one is a TP
        (earliest index wins score ties), the rest become FPs; unmatched
        detections are FPs; GTs claimed by no detection are FNs (score 0,
        label 1). Emission order per element: demoted FPs, TPs, unmatched
        FPs, FNs.
        """
        gt_coords, det_coords, det_scores = [], [], []
        for box in b_boxes_list:
            if box["box_type"] == "gt" and box["box_label"] == cl:
                gt_coords.append(box["box_coords"])
            elif box["box_type"] == "det" and box["box_pred_class_id"] == cl:
                det_coords.append(box["box_coords"])
                det_scores.append(box["box_score"])
        n_det, n_gt = len(det_coords), len(gt_coords)
        scores = np.asarray(det_scores)

        def emit(score_values, label, det_type):
            rows["pred_score"] += list(score_values)
            rows["class_label"] += [label] * len(score_values)
            rows["pred_class"] += [cl] * len(score_values)
            rows["pid"] += [pid] * len(score_values)
            rows["det_type"] += [det_type] * len(score_values)

        if n_det == 0:
            if n_gt:
                emit([0] * n_gt, 1, "det_fn")
            return
        if n_gt == 0:
            emit(scores, 0, "det_fp")
            return

        overlaps = _iou_matrix(np.asarray(det_coords), np.asarray(gt_coords))  # (D, G)
        matched = overlaps.max(axis=1) > match_iou
        claimed_gt = overlaps.argmax(axis=1)
        # assignment matrix: det d claims gt g
        assign = matched[:, None] & (claimed_gt[:, None] == np.arange(n_gt)[None, :])
        # per claimed gt, the highest-scoring claimant wins (argmax -> first
        # max on ties, i.e. lowest det index)
        claimant_scores = np.where(assign, scores[:, None], -np.inf)
        winner_per_gt = claimant_scores.argmax(axis=0)
        is_tp = np.zeros(n_det, bool)
        claimed = assign.any(axis=0)
        is_tp[winner_per_gt[claimed]] = True
        demoted = matched & ~is_tp

        if demoted.any():
            emit(scores[demoted], 0, "det_fp")
        if is_tp.any():
            emit(scores[is_tp], 1, "det_tp")
        if (~matched).any():
            emit(scores[~matched], 0, "det_fp")
        n_fn = int((~claimed).sum())
        if n_fn:
            emit([0] * n_fn, 1, "det_fn")

    # ---- score-level dispatch (one (subframe, scores, fold-means) recipe
    #      per level; return_metrics just walks the class x level product) ---

    def _roi_subframe(self, cl_df):
        return cl_df[cl_df.det_type != "patient_tn"]

    def _patient_subframe(self, cl_df):
        return cl_df.groupby(["pid"], as_index=False).agg(
            {"class_label": "max", "pred_score": "max", "fold": "first"}
        )

    def _roi_scores(self, spec_df):
        return {
            "ap": get_roi_ap_from_df([spec_df, self.cf.min_det_thresh, self.cf.per_patient_ap]),
            "auc": 0, "roc": None, "prc": None,
        }

    def _patient_scores(self, spec_df):
        """Binary patient-level metrics; a metric is NaN when its input is
        degenerate (single class for AUC/ROC, no positives for AP/PRC)."""
        labels = spec_df.class_label.tolist()
        scores = spec_df.pred_score.tolist()
        out = {"auc": np.nan, "roc": np.nan, "ap": np.nan, "prc": np.nan}
        if len(set(labels)) > 1:
            out["auc"] = roc_auc_score(labels, scores)
            out["roc"] = roc_curve(labels, scores)
        if 1 in labels:
            out["ap"] = average_precision_score(labels, scores)
            out["prc"] = precision_recall_curve(labels, scores)
        return out

    def _roi_fold_means(self, spec_df, folds):
        per_fold = [
            get_roi_ap_from_df([spec_df[spec_df.fold == f], self.cf.min_det_thresh, self.cf.per_patient_ap])
            for f in folds
        ]
        return {"mean_ap": np.mean(per_fold), "mean_auc": 0}

    def _patient_fold_means(self, spec_df, folds):
        fold_scores = [self._patient_scores(spec_df[spec_df.fold == f]) for f in folds]
        valid_aucs = [s["auc"] for s in fold_scores if not np.isnan(s["auc"])]
        valid_aps = [s["ap"] for s in fold_scores if not np.isnan(s["ap"])]
        return {
            "mean_auc": np.mean(valid_aucs) if valid_aucs else np.nan,
            "mean_ap": np.mean(valid_aps) if valid_aps else np.nan,
        }

    _LEVELS = {
        "rois": (_roi_subframe, _roi_scores, _roi_fold_means),
        "patient": (_patient_subframe, _patient_scores, _patient_fold_means),
    }

    def _update_monitor(self, monitor_metrics, level, cl, stats):
        """Append this (level, class) AP — and AUC on patient level — to the
        epoch-series dict. Non-positive / NaN values record as None (the model
        selector skips them). Patient-level series only track
        cf.patient_class_of_interest."""
        if level == "patient" and cl != self.cf.patient_class_of_interest:
            return
        series = "patient" if level == "patient" else self.cf.class_dict[cl]
        monitor_metrics[series + "_ap"].append(stats["ap"] if stats["ap"] > 0 else None)
        if level == "patient":
            monitor_metrics[series + "_auc"].append(stats["auc"] if stats["auc"] > 0 else None)

    def _plot_hist(self, spec_df, level, cl):
        from medicaldetectiontoolkit_tpu import plotting

        fname = "pred_hist_{}_{}_{}_cl{}".format(
            getattr(self.cf, "fold", 0), "val" if "val" in self.mode else self.mode, level, cl
        )
        plotting.plot_prediction_hist(
            spec_df.class_label.tolist(),
            spec_df.pred_score.tolist(),
            spec_df.det_type.tolist() if level == "rois" else None,
            os.path.join(self.cf.plot_dir, fname),
        )

    def _scan_det_threshs(self, spec_df):
        threshs = list(np.arange(0.9, 1, 0.01))
        with ThreadPoolExecutor(max_workers=10) as pool:
            aps = list(pool.map(get_roi_ap_from_df, [[spec_df, t, self.cf.per_patient_ap] for t in threshs]))
        self.logger.info(f"results from scanning over det_threshs: {[list(p) for p in zip(threshs, aps)]}")

    def _perturb_selection_ties(self, monitor_metrics):
        """Small-dataset val APs tie exactly across epochs; a <=1e-6 jitter on
        a repeated latest value keeps epoch ranking well-defined."""
        for sc in self.cf.model_selection_criteria:
            series = monitor_metrics[sc]
            if "val" in self.mode and series[-1] is not None and series.count(series[-1]) > 1:
                series[-1] += 1e-6 * np.random.rand()

    def return_metrics(self, monitor_metrics=None):
        """AP/AUC per (class x score level); appends to monitor_metrics."""
        from medicaldetectiontoolkit_tpu import plotting

        df = self.test_df
        folds = df.fold.unique()
        all_stats = []
        for cl in list(self.cf.class_dict.keys()):
            cl_df = df[df.pred_class == cl]
            for level in self.cf.report_score_level:
                subframe, scores, fold_means = self._LEVELS[level]
                spec_df = subframe(self, cl_df)
                stats = {"name": f"fold_{getattr(self.cf, 'fold', 0)} {level} cl_{cl}"}
                stats.update(scores(self, spec_df))
                if len(folds) > 1:
                    stats.update(fold_means(self, spec_df, folds))
                all_stats.append(stats)

                if monitor_metrics is not None:
                    self._update_monitor(monitor_metrics, level, cl, stats)
                if self.cf.plot_prediction_histograms:
                    self._plot_hist(spec_df, level, cl)
                if self.cf.scan_det_thresh:
                    self._scan_det_threshs(spec_df)

        if self.cf.plot_stat_curves:
            out_filename = os.path.join(self.cf.plot_dir, f"{getattr(self.cf, 'fold', 0)}_{self.mode}_stat_curves")
            plotting.plot_stat_curves(all_stats, out_filename)

        # foreground-average summary row over roi-level entries
        roi_rows = [d for d in all_stats if "rois" in d["name"]]
        summary = {"name": "average_foreground_roi", "auc": 0, "ap": np.mean([d["ap"] for d in roi_rows])}
        if len(folds) > 1:
            summary["mean_ap"] = np.mean([d["mean_ap"] for d in roi_rows])
            summary["mean_auc"] = 0
        all_stats.append(summary)

        if monitor_metrics is not None:
            self._perturb_selection_ties(monitor_metrics)

        return all_stats, monitor_metrics

    @staticmethod
    def _stat_line(s, with_means=False, suffix=""):
        if with_means:
            line = "AUC {:0.4f} (mu {:0.4f})  AP {:0.4f} (mu {:0.4f})  {}".format(
                s["auc"], s.get("mean_auc", 0), s["ap"], s.get("mean_ap", 0), s["name"]
            )
            return line + (f" {suffix}" if suffix else "")
        return "AUC {:0.4f}  AP {:0.4f} {}".format(s["auc"], s["ap"], s["name"])

    def _banner(self, handle, title, df_label):
        handle.write("\n****************************\n")
        handle.write(f"\n{title} \n")
        handle.write("\n****************************\n")
        handle.write(f"\n{df_label} {self.test_df.shape}\n  \n")

    def score_test_df(self, internal_df=True):
        """Write fold results to results.txt; aggregate across folds if done."""
        results_path = os.path.join(self.cf.exp_dir, "results.txt")
        if internal_df:
            fold = getattr(self.cf, "fold", 0)
            self.test_df.to_pickle(os.path.join(self.cf.exp_dir, f"{fold}_test_df.pickle"))
            stats, _ = self.return_metrics()
            with open(results_path, "a") as handle:
                self._banner(handle, f"results for fold {fold}", "fold df shape")
                for s in stats:
                    handle.write(self._stat_line(s) + " \n")

        fold_dfs = sorted(f for f in os.listdir(self.cf.exp_dir) if "test_df.pickle" in f)
        if len(fold_dfs) != self.cf.n_cv_splits:
            return  # not every fold has finished yet

        # all folds done: rebuild the cross-fold df and emit the overall block
        self.cf.fold = "overall"
        frames = []
        for ix, fname in enumerate(fold_dfs):
            frame = pd.read_pickle(os.path.join(self.cf.exp_dir, fname))
            frame["fold"] = ix
            frames.append(frame)
        self.test_df = pd.concat(frames)
        stats, _ = self.return_metrics()

        with open(results_path, "a") as handle:
            self._banner(handle, "OVERALL RESULTS", "df shape")
            for s in stats:
                handle.write("\n" + self._stat_line(s, with_means=True) + "\n ")

        exp_name = os.path.basename(self.cf.exp_dir.rstrip("/"))
        table_path = os.path.join(os.path.dirname(self.cf.exp_dir.rstrip("/")), "results_table.txt")
        with open(table_path, "a") as handle:
            for s in stats:
                handle.write("\n" + self._stat_line(s, with_means=True, suffix=exp_name))
            handle.write("\n")


def get_roi_ap_from_df(inputs):
    """AP over the roi-level df (optionally per patient then averaged)."""
    df, det_thresh, per_patient_ap = inputs

    if per_patient_ap:
        pids_list = df.pid.unique()
        aps = []
        for match_iou in df.match_iou.unique():
            iou_df = df[df.match_iou == match_iou]
            for pid in pids_list:
                pid_df = iou_df[iou_df.pid == pid]
                all_p = len(pid_df[pid_df.class_label == 1])
                pid_df = pid_df[(pid_df.det_type == "det_fp") | (pid_df.det_type == "det_tp")].sort_values(
                    "pred_score", ascending=False
                )
                pid_df = pid_df[pid_df.pred_score > det_thresh]
                if len(pid_df) == 0 and all_p == 0:
                    pass
                elif len(pid_df) > 0 and all_p == 0:
                    aps.append(0)
                else:
                    aps.append(compute_roi_ap(pid_df, all_p))
        return np.mean(aps)

    aps = []
    for match_iou in df.match_iou.unique():
        iou_df = df[df.match_iou == match_iou]
        all_p = len(iou_df[iou_df.class_label == 1])
        iou_df = iou_df[(iou_df.det_type == "det_fp") | (iou_df.det_type == "det_tp")].sort_values(
            "pred_score", ascending=False
        )
        iou_df = iou_df[iou_df.pred_score > det_thresh]
        if all_p > 0:
            aps.append(compute_roi_ap(iou_df, all_p))
    return np.mean(aps) if aps else 0.0


def compute_roi_ap(df, all_p):
    """COCO 101-point interpolated AP over score-sorted tp/fp rows."""
    tp = df.class_label.values
    fp = (tp == 0) * 1
    recall_thresholds = np.linspace(0.0, 1, 101, endpoint=True)
    tp_sum = np.cumsum(tp)
    fp_sum = np.cumsum(fp)
    rc = tp_sum / all_p
    pr = tp_sum / (fp_sum + tp_sum)

    # precision envelope (monotone non-increasing from the right)
    pr = pr.tolist()
    for i in range(len(pr) - 1, 0, -1):
        if pr[i] > pr[i - 1]:
            pr[i - 1] = pr[i]

    q = np.zeros(len(recall_thresholds))
    inds = np.searchsorted(rc, recall_thresholds, side="left")
    for ri, pi in enumerate(inds):
        if pi < len(pr):
            q[ri] = pr[pi]
    return np.mean(q)
