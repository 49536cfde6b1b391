"""Inference pipeline: tiling, mirror TTA, temporal ensembling, consolidation.

Behavior-equivalent rebuild of the reference's ``predictor.py``:

  4-level nested pipeline
    predict_test_set (temporal ensembling over top-k epoch checkpoints)
      -> predict_patient
        -> data_aug_forward (identity + 3 xy-mirror TTA, coords un-mirrored)
          -> spatial_tiling_forward (patch -> whole-image coords; per-box
             patch_id, Gaussian box_patch_center_factor, box_n_overlaps;
             seg averaged over the patch-overlap map)
            -> batch_tiling_forward (chunk n_patches into batch_size chunks)

  plus the consolidation functions: weighted box clustering (WBC,
  ``predictor.py:597-706``) and 2D->3D cube merging via hole-bounded slice
  clustering (``nms_2to3D``, ``predictor.py:710-773``), raw-prediction
  pickles, and analysis-mode loading.

TPU-specific changes: chunks are PADDED to ``cf.batch_size`` so the jitted
predict function compiles exactly once per patient shape; consolidation runs
in a thread pool (NumPy releases the GIL) instead of a fork-based Pool.
"""

from __future__ import annotations

import os
import pickle
from collections import OrderedDict
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from scipy.stats import norm

from medicaldetectiontoolkit_tpu.utils.exp_utils import load_checkpoint_state


class Predictor:
    def __init__(self, cf, net, logger, mode):
        self.cf = cf
        self.logger = logger
        self.mode = mode  # 'val' | 'test' | 'analysis'
        self.net = net
        self.rank_ix = "0"
        self.n_ens = 1
        self.patched_patient = False

        if self.mode == "test":
            try:
                self.epoch_ranking = np.load(os.path.join(self.cf.fold_dir, "epoch_ranking.npy"))[: cf.test_n_epochs]
            except FileNotFoundError:
                raise RuntimeError(
                    "no epoch ranking file in fold directory. "
                    "seems like you are trying to run testing without prior training..."
                )
            self.n_ens = cf.test_n_epochs
            if self.cf.test_aug:
                self.n_ens *= 4

    # ------------------------------------------------------------------ #

    def predict_patient(self, batch):
        """Predict one patient; in val mode also adds 3D GT + consolidates."""
        self.logger.info(f"evaluating patient {batch['pid']} for fold {getattr(self.cf, 'fold', 0)}")
        self.patched_patient = "patch_crop_coords" in list(batch.keys())
        results_dict = self.data_aug_forward(batch)

        if self.mode == "val":
            for b in range(len(batch["patient_bb_target"])):
                for t in range(len(batch["patient_bb_target"][b])):
                    results_dict["boxes"][b].append(
                        {
                            "box_coords": batch["patient_bb_target"][b][t],
                            "box_label": batch["patient_roi_labels"][b][t],
                            "box_type": "gt",
                        }
                    )
            if self.patched_patient:
                wcs_input = [results_dict["boxes"], "dummy_pid", self.cf.class_dict, self.cf.wcs_iou, self.n_ens]
                results_dict["boxes"] = apply_wbc_to_patient(wcs_input)[0]
            if self.cf.merge_2D_to_3D_preds:
                merge_dims_inputs = [results_dict["boxes"], "dummy_pid", self.cf.class_dict, self.cf.merge_3D_iou]
                results_dict["boxes"] = merge_2D_to_3D_preds_per_patient(merge_dims_inputs)[0]

        return results_dict

    def predict_test_set(self, batch_gen, return_results=True):
        """Temporal ensembling over top-k checkpoints + full test set sweep."""
        dict_of_patient_results = OrderedDict()
        weight_paths = [os.path.join(self.cf.fold_dir, f"{epoch}_best_checkpoint") for epoch in self.epoch_ranking]

        for rank_ix, weight_path in enumerate(weight_paths):
            self.logger.info(f"tmp ensembling over rank_ix:{rank_ix} epoch:{weight_path}")
            self.net.load_params(load_checkpoint_state(weight_path)["params"])
            self.rank_ix = str(rank_ix)

            # restart patient iteration per rank: with max_test_patients <
            # dataset size, each rank must see the SAME patient subset (the
            # reference's iterator keeps cycling and crashes in that case)
            if hasattr(batch_gen["test"], "patient_ix"):
                batch_gen["test"].patient_ix = 0

            for _ in range(batch_gen["n_test"]):
                batch = next(batch_gen["test"])
                if rank_ix == 0:
                    dict_of_patient_results[batch["pid"]] = {
                        "results_list": [],
                        "patient_bb_target": batch["patient_bb_target"],
                        "patient_roi_labels": batch["patient_roi_labels"],
                    }
                results_dict = self.predict_patient(batch)
                dict_of_patient_results[batch["pid"]]["results_list"].append(results_dict["boxes"])

        self.logger.info("finished predicting test set. starting post-processing of predictions.")
        list_of_results_per_patient = []
        for pid, p_dict in dict_of_patient_results.items():
            tmp_ens_list = p_dict["results_list"]
            results_dict = {}
            results_dict["boxes"] = [
                [item for d in tmp_ens_list for item in d[batch_instance]]
                for batch_instance in range(len(tmp_ens_list[0]))
            ]
            for b in range(len(p_dict["patient_bb_target"])):
                for t in range(len(p_dict["patient_bb_target"][b])):
                    results_dict["boxes"][b].append(
                        {
                            "box_coords": p_dict["patient_bb_target"][b][t],
                            "box_label": p_dict["patient_roi_labels"][b][t],
                            "box_type": "gt",
                        }
                    )
            list_of_results_per_patient.append([results_dict["boxes"], pid])

        out_string = "raw_pred_boxes_hold_out_list" if self.cf.hold_out_test_set else "raw_pred_boxes_list"
        with open(os.path.join(self.cf.fold_dir, f"{out_string}.pickle"), "wb") as handle:
            pickle.dump(list_of_results_per_patient, handle)

        if return_results:
            list_of_results_per_patient = self._consolidate(list_of_results_per_patient, self.n_ens)
            return list_of_results_per_patient

    def _consolidate(self, list_of_results_per_patient, n_ens):
        self.logger.info(f"applying wcs to test set predictions with iou = {self.cf.wcs_iou} and n_ens = {n_ens}.")
        mp_inputs = [[ii[0], ii[1], self.cf.class_dict, self.cf.wcs_iou, n_ens] for ii in list_of_results_per_patient]
        with ThreadPoolExecutor(max_workers=6) as pool:
            out = list(pool.map(apply_wbc_to_patient, mp_inputs))

        if self.cf.merge_2D_to_3D_preds:
            self.logger.info(f"applying 2Dto3D merging to test set predictions with iou = {self.cf.merge_3D_iou}.")
            mp_inputs = [[ii[0], ii[1], self.cf.class_dict, self.cf.merge_3D_iou] for ii in out]
            with ThreadPoolExecutor(max_workers=6) as pool:
                out = list(pool.map(merge_2D_to_3D_preds_per_patient, mp_inputs))
        return out

    def load_saved_predictions(self, apply_wbc=False):
        """Analysis mode: load raw prediction pickles, consolidate, return."""
        if not self.cf.hold_out_test_set:
            with open(os.path.join(self.cf.fold_dir, "raw_pred_boxes_list.pickle"), "rb") as handle:
                list_of_results_per_patient = pickle.load(handle)
            da_factor = 4 if self.cf.test_aug else 1
            n_ens = self.cf.test_n_epochs * da_factor
            self.logger.info(
                f"loaded raw test set predictions with n_patients = {len(list_of_results_per_patient)} and n_ens = {n_ens}"
            )
        else:
            boxes_list = []
            pids = []
            for fold in self.cf.folds:
                fold_dir = os.path.join(self.cf.exp_dir, f"fold_{fold}")
                with open(os.path.join(fold_dir, "raw_pred_boxes_hold_out_list.pickle"), "rb") as handle:
                    fold_list = pickle.load(handle)
                    pids = [ii[1] for ii in fold_list]
                    boxes_list.append([ii[0] for ii in fold_list])
            list_of_results_per_patient = [
                [[[box for fold_list in boxes_list for box in fold_list[pix][0] if box["box_type"] == "det"]], pid]
                for pix, pid in enumerate(pids)
            ]
            da_factor = 4 if self.cf.test_aug else 1
            n_ens = self.cf.test_n_epochs * da_factor * len(self.cf.folds)

        if apply_wbc:
            self.logger.info(f"applying wcs to test set predictions with iou = {self.cf.wcs_iou} and n_ens = {n_ens}.")
            mp_inputs = [
                [ii[0], ii[1], self.cf.class_dict, self.cf.wcs_iou, n_ens] for ii in list_of_results_per_patient
            ]
            with ThreadPoolExecutor(max_workers=6) as pool:
                list_of_results_per_patient = list(pool.map(apply_wbc_to_patient, mp_inputs))

        if self.cf.merge_2D_to_3D_preds:
            self.logger.info(f"applying 2Dto3D merging to test set predictions with iou = {self.cf.merge_3D_iou}.")
            mp_inputs = [[ii[0], ii[1], self.cf.class_dict, self.cf.merge_3D_iou] for ii in list_of_results_per_patient]
            with ThreadPoolExecutor(max_workers=6) as pool:
                list_of_results_per_patient = list(pool.map(merge_2D_to_3D_preds_per_patient, mp_inputs))

        return list_of_results_per_patient

    # ------------------------------------------------------------------ #

    def data_aug_forward(self, batch):
        """Identity + 3 xy-mirror TTA; coords/segs un-mirrored afterwards."""
        patch_crops = batch["patch_crop_coords"] if self.patched_patient else None
        results_list = [self.spatial_tiling_forward(batch, patch_crops)]
        org_img_shape = batch["original_img_shape"]

        if self.mode == "test" and self.cf.test_aug:
            if self.patched_patient:
                mirrored_patch_crops = get_mirrored_patch_crops(patch_crops, batch["original_img_shape"])
            else:
                mirrored_patch_crops = [None] * 3

            img = np.copy(batch["data"])

            # mirror specs: list of (flip axes, coord fixers)
            for n_aug, flip_axes in (("1", (2,)), ("2", (3,)), ("3", (2, 3))):
                data = img
                for ax in flip_axes:
                    data = np.flip(data, axis=ax)
                batch["data"] = data.copy()
                chunk_dict = self.spatial_tiling_forward(
                    batch, mirrored_patch_crops[int(n_aug) - 1], n_aug=n_aug
                )
                for ix in range(len(chunk_dict["boxes"])):
                    for boxix in range(len(chunk_dict["boxes"][ix])):
                        coords = np.array(chunk_dict["boxes"][ix][boxix]["box_coords"], dtype=float).copy()
                        orig = np.array(chunk_dict["boxes"][ix][boxix]["box_coords"], dtype=float)
                        if 2 in flip_axes:
                            coords[0] = org_img_shape[2] - orig[2]
                            coords[2] = org_img_shape[2] - orig[0]
                        if 3 in flip_axes:
                            coords[1] = org_img_shape[3] - orig[3]
                            coords[3] = org_img_shape[3] - orig[1]
                        assert coords[2] >= coords[0], [coords, orig]
                        assert coords[3] >= coords[1], [coords, orig]
                        chunk_dict["boxes"][ix][boxix]["box_coords"] = coords
                seg = chunk_dict["seg_preds"]
                for ax in flip_axes:
                    seg = np.flip(seg, axis=ax)
                chunk_dict["seg_preds"] = seg.copy()
                results_list.append(chunk_dict)

            batch["data"] = img

        results_dict = {}
        results_dict["boxes"] = [
            [item for d in results_list for item in d["boxes"][batch_instance]]
            for batch_instance in range(org_img_shape[0])
        ]
        results_dict["seg_preds"] = np.array(
            [
                [item for d in results_list for item in d["seg_preds"][batch_instance]]
                for batch_instance in range(org_img_shape[0])
            ]
        )
        if self.mode == "val":
            results_dict["monitor_values"] = results_list[0]["monitor_values"]
        return results_dict

    def spatial_tiling_forward(self, batch, patch_crops=None, n_aug="0"):
        """Patch -> whole-image coords; overlap-averaged seg; WBC metadata."""
        if patch_crops is not None:
            patches_dict = self.batch_tiling_forward(batch)
            results_dict = {"boxes": [[] for _ in range(batch["original_img_shape"][0])]}

            out_seg_preds = np.zeros(batch["original_img_shape"], dtype=np.float16)[:, 0][:, None]
            patch_overlap_map = np.zeros_like(out_seg_preds, dtype="uint8")

            for pix, pc in enumerate(patch_crops):
                if self.cf.dim == 3:
                    out_seg_preds[:, :, pc[0] : pc[1], pc[2] : pc[3], pc[4] : pc[5]] += patches_dict["seg_preds"][pix][None]
                    patch_overlap_map[:, :, pc[0] : pc[1], pc[2] : pc[3], pc[4] : pc[5]] += 1
                else:
                    out_seg_preds[pc[4] : pc[5], :, pc[0] : pc[1], pc[2] : pc[3]] += patches_dict["seg_preds"][pix]
                    patch_overlap_map[pc[4] : pc[5], :, pc[0] : pc[1], pc[2] : pc[3]] += 1

            out_seg_preds[patch_overlap_map > 0] /= patch_overlap_map[patch_overlap_map > 0]
            results_dict["seg_preds"] = out_seg_preds

            for pix, pc in enumerate(patch_crops):
                patch_boxes = patches_dict["boxes"][pix]
                for box in patch_boxes:
                    box["patch_id"] = self.rank_ix + "_" + n_aug + "_" + str(pix)
                    c = np.array(box["box_coords"], dtype=float)
                    box_centers = [(c[ii] + c[ii + 2]) / 2 for ii in range(2)]
                    if self.cf.dim == 3:
                        box_centers.append((c[4] + c[5]) / 2)
                    # Gaussian center weighting: boxes near patch borders are less trustworthy
                    box["box_patch_center_factor"] = np.mean(
                        [
                            norm.pdf(bc, loc=psh, scale=psh * 0.8) * np.sqrt(2 * np.pi) * psh * 0.8
                            for bc, psh in zip(box_centers, np.array(self.cf.patch_size) / 2)
                        ]
                    )
                    if self.cf.dim == 3:
                        c += np.array([pc[0], pc[2], pc[0], pc[2], pc[4], pc[4]])
                        int_c = [int(np.floor(ii)) if ix % 2 == 0 else int(np.ceil(ii)) for ix, ii in enumerate(c)]
                        box["box_n_overlaps"] = np.mean(
                            patch_overlap_map[:, :, int_c[1] : int_c[3], int_c[0] : int_c[2], int_c[4] : int_c[5]]
                        )
                        box["box_coords"] = c
                        results_dict["boxes"][0].append(box)
                    else:
                        c += np.array([pc[0], pc[2], pc[0], pc[2]])
                        int_c = [int(np.floor(ii)) if ix % 2 == 0 else int(np.ceil(ii)) for ix, ii in enumerate(c)]
                        box["box_n_overlaps"] = np.mean(
                            patch_overlap_map[pc[4], :, int_c[1] : int_c[3], int_c[0] : int_c[2]]
                        )
                        box["box_coords"] = c
                        results_dict["boxes"][pc[4]].append(box)

            if self.mode == "val":
                results_dict["monitor_values"] = patches_dict["monitor_values"]
        else:
            results_dict = self.batch_tiling_forward(batch)
            for b in results_dict["boxes"]:
                for box in b:
                    box["box_patch_center_factor"] = 1
                    box["box_n_overlaps"] = 1
                    box["patch_id"] = self.rank_ix + "_" + n_aug

        return results_dict

    def batch_tiling_forward(self, batch):
        """Chunk oversized patch batches into batch_size chunks (padded so the
        device function compiles once per patient shape)."""
        self.logger.info(f"forwarding (patched) patient with shape: {batch['data'].shape}")
        img = batch["data"]

        if img.shape[0] <= self.cf.batch_size:
            if self.mode == "val":
                results_dict = self.net.train_forward(batch, is_validation=True)
                results_dict["boxes"] = [[box for box in b if box["box_type"] == "det"] for b in results_dict["boxes"]]
            else:
                results_dict = self.net.test_forward(batch, return_masks=self.cf.return_masks_in_test)
            return results_dict

        n = img.shape[0]
        bs = self.cf.batch_size
        chunk_dicts = []
        array_keys = [
            k for k in batch.keys() if isinstance(batch[k], np.ndarray) and batch[k].shape[0] == n
        ]
        list_keys = [
            k for k in ("bb_target", "roi_labels", "roi_masks", "class_target")
            if k in batch and not isinstance(batch[k], np.ndarray) and len(batch[k]) == n
        ]
        for start in range(0, n, bs):
            ixs = np.arange(start, min(start + bs, n))
            pad = bs - len(ixs)
            b = {k: batch[k][ixs] for k in array_keys}
            for k in list_keys:
                b[k] = [batch[k][i] for i in ixs]
            if pad:  # pad chunk to batch_size with repeats; trimmed below
                b = {k: np.concatenate([v, v[-1:].repeat(pad, axis=0)]) for k, v in b.items() if isinstance(v, np.ndarray)}
                for k in list_keys:
                    b[k] = [batch[k][i] for i in ixs] + [batch[k][ixs[-1]]] * pad
            if self.mode == "val":
                d = self.net.train_forward(b, is_validation=True)
            else:
                d = self.net.test_forward(b, return_masks=self.cf.return_masks_in_test)
            if pad:
                d["boxes"] = d["boxes"][: len(ixs)]
                d["seg_preds"] = d["seg_preds"][: len(ixs)]
            chunk_dicts.append(d)

        results_dict = {}
        results_dict["boxes"] = [item for d in chunk_dicts for item in d["boxes"]]
        results_dict["seg_preds"] = np.array([item for d in chunk_dicts for item in d["seg_preds"]])
        if self.mode == "val":
            results_dict["monitor_values"] = {
                k: np.mean([d["monitor_values"][k] for d in chunk_dicts]) for k in chunk_dicts[0]["monitor_values"].keys()
            }
            results_dict["boxes"] = [[box for box in b if box["box_type"] == "det"] for b in results_dict["boxes"]]
        return results_dict


# ---------------------------------------------------------------------- #
#  consolidation functions (host NumPy)                                    #
# ---------------------------------------------------------------------- #


def apply_wbc_to_patient(inputs):
    """Weighted box clustering per (batch element, class) for one patient."""
    in_patient_results_list, pid, class_dict, wcs_iou, n_ens = inputs
    out_patient_results_list = [[] for _ in range(len(in_patient_results_list))]

    for bix, b in enumerate(in_patient_results_list):
        for cl in list(class_dict.keys()):
            boxes = [
                (ix, box) for ix, box in enumerate(b) if (box["box_type"] == "det" and box["box_pred_class_id"] == cl)
            ]
            box_coords = np.array([bb[1]["box_coords"] for bb in boxes])
            box_scores = np.array([bb[1]["box_score"] for bb in boxes])
            box_center_factor = np.array([bb[1]["box_patch_center_factor"] for bb in boxes])
            box_n_overlaps = np.array([bb[1]["box_n_overlaps"] for bb in boxes])
            box_patch_id = np.array([bb[1]["patch_id"] for bb in boxes])

            if 0 not in box_scores.shape:
                keep_scores, keep_coords = weighted_box_clustering(
                    np.concatenate(
                        (box_coords, box_scores[:, None], box_center_factor[:, None], box_n_overlaps[:, None]), axis=1
                    ),
                    box_patch_id,
                    wcs_iou,
                    n_ens,
                )
                for boxix in range(len(keep_scores)):
                    out_patient_results_list[bix].append(
                        {
                            "box_type": "det",
                            "box_coords": keep_coords[boxix],
                            "box_score": keep_scores[boxix],
                            "box_pred_class_id": cl,
                        }
                    )
        out_patient_results_list[bix].extend([box for box in b if box["box_type"] == "gt"])

    return [out_patient_results_list, pid]


def merge_2D_to_3D_preds_per_patient(inputs):
    """Cluster per-slice 2D detections into 3D cubes (one patient)."""
    in_patient_results_list, pid, class_dict, merge_3D_iou = inputs
    out_patient_results_list = []

    for cl in list(class_dict.keys()):
        boxes, slice_ids = [], []
        for bix, b in enumerate(in_patient_results_list):
            det_boxes = [
                (ix, box) for ix, box in enumerate(b) if (box["box_type"] == "det" and box["box_pred_class_id"] == cl)
            ]
            boxes += det_boxes
            slice_ids += [bix] * len(det_boxes)

        box_coords = np.array([bb[1]["box_coords"] for bb in boxes])
        box_scores = np.array([bb[1]["box_score"] for bb in boxes])
        slice_ids = np.array(slice_ids)

        if 0 not in box_scores.shape:
            keep_ix, keep_z = nms_2to3D(
                np.concatenate((box_coords, box_scores[:, None], slice_ids[:, None]), axis=1), merge_3D_iou
            )
        else:
            keep_ix, keep_z = [], []

        for kix, kz in zip(keep_ix, keep_z):
            out_patient_results_list.append(
                {
                    "box_type": "det",
                    "box_coords": list(box_coords[kix]) + kz,
                    "box_score": box_scores[kix],
                    "box_pred_class_id": cl,
                }
            )

    out_patient_results_list += [box for b in in_patient_results_list for box in b if box["box_type"] == "gt"]
    return [[out_patient_results_list], pid]


def weighted_box_clustering(dets, box_patch_id, thresh, n_ens):
    """WBC: cluster at IoU > thresh; cluster score = weighted average of member
    scores (weights = overlap * area * patch-center factor), divided by the
    number of EXPECTED predictions at the position (n_ens * mean overlaps),
    with missing members contributing the mean weight; coords = score-weighted
    average. Clusters with avg score <= 0.01 are dropped.
    """
    dim = 2 if dets.shape[1] == 7 else 3
    y1 = dets[:, 0]
    x1 = dets[:, 1]
    y2 = dets[:, 2]
    x2 = dets[:, 3]
    scores = dets[:, -3]
    box_pc_facts = dets[:, -2]
    box_n_ovs = dets[:, -1]

    areas = (y2 - y1 + 1) * (x2 - x1 + 1)
    if dim == 3:
        z1 = dets[:, 4]
        z2 = dets[:, 5]
        areas *= z2 - z1 + 1

    order = scores.argsort()[::-1]
    keep_scores = []
    keep_coords = []

    while order.size > 0:
        i = order[0]
        xx1 = np.maximum(x1[i], x1[order])
        yy1 = np.maximum(y1[i], y1[order])
        xx2 = np.minimum(x2[i], x2[order])
        yy2 = np.minimum(y2[i], y2[order])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        if dim == 3:
            zz1 = np.maximum(z1[i], z1[order])
            zz2 = np.minimum(z2[i], z2[order])
            d = np.maximum(0.0, zz2 - zz1 + 1)
            inter *= d

        ovr = inter / (areas[i] + areas[order] - inter)
        matches = np.argwhere(ovr > thresh)

        match_n_ovs = box_n_ovs[order[matches]]
        match_pc_facts = box_pc_facts[order[matches]]
        match_patch_id = box_patch_id[order[matches]]
        match_ov_facts = ovr[matches]
        match_areas = areas[order[matches]]
        match_scores = scores[order[matches]]

        match_score_weights = match_ov_facts * match_areas * match_pc_facts
        match_scores = match_scores * match_score_weights

        n_expected_preds = n_ens * np.mean(match_n_ovs)
        n_missing_preds = np.max((0, n_expected_preds - np.unique(match_patch_id).shape[0]))
        denom = np.sum(match_score_weights) + n_missing_preds * np.mean(match_score_weights)
        avg_score = np.sum(match_scores) / denom

        avg_coords = [
            np.sum(y1[order[matches]] * match_scores) / np.sum(match_scores),
            np.sum(x1[order[matches]] * match_scores) / np.sum(match_scores),
            np.sum(y2[order[matches]] * match_scores) / np.sum(match_scores),
            np.sum(x2[order[matches]] * match_scores) / np.sum(match_scores),
        ]
        if dim == 3:
            avg_coords.append(np.sum(z1[order[matches]] * match_scores) / np.sum(match_scores))
            avg_coords.append(np.sum(z2[order[matches]] * match_scores) / np.sum(match_scores))

        if avg_score > 0.01:
            keep_scores.append(avg_score)
            keep_coords.append(avg_coords)

        inds = np.where(ovr <= thresh)[0]
        order = order[inds]

    return keep_scores, keep_coords


def nms_2to3D(dets, thresh):
    """Cluster 2D slice detections into 3D cubes bounded at the first slice
    'hole' away from the core (highest-scoring) slice."""
    y1 = dets[:, 0]
    x1 = dets[:, 1]
    y2 = dets[:, 2]
    x2 = dets[:, 3]
    scores = dets[:, -2]
    slice_id = dets[:, -1]

    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]

    keep = []
    keep_z = []

    while order.size > 0:
        i = order[0]
        xx1 = np.maximum(x1[i], x1[order])
        yy1 = np.maximum(y1[i], y1[order])
        xx2 = np.minimum(x2[i], x2[order])
        yy2 = np.minimum(y2[i], y2[order])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order] - inter)
        matches = np.argwhere(ovr > thresh)

        slice_ids = slice_id[order[matches]]
        core_slice = slice_id[int(i)]
        upper_holes = [ii for ii in np.arange(core_slice, np.max(slice_ids)) if ii not in slice_ids]
        lower_holes = [ii for ii in np.arange(np.min(slice_ids), core_slice) if ii not in slice_ids]
        max_valid_slice_id = np.min(upper_holes) if len(upper_holes) > 0 else np.max(slice_ids)
        min_valid_slice_id = np.max(lower_holes) if len(lower_holes) > 0 else np.min(slice_ids)
        z_matches = matches[(slice_ids <= max_valid_slice_id) & (slice_ids >= min_valid_slice_id)]

        z1 = np.min(slice_id[order[z_matches]]) - 1
        z2 = np.max(slice_id[order[z_matches]]) + 1

        keep.append(i)
        keep_z.append([z1, z2])
        order = np.delete(order, z_matches, axis=0)

    return keep, keep_z


def get_mirrored_patch_crops(patch_crops, org_img_shape):
    """Mirror patch-crop coords for the 3 TTA transforms (y, x, y+x)."""
    mirrored_patch_crops = []
    mirrored_patch_crops.append(
        [
            [org_img_shape[2] - ii[1], org_img_shape[2] - ii[0], ii[2], ii[3]]
            if len(ii) == 4
            else [org_img_shape[2] - ii[1], org_img_shape[2] - ii[0], ii[2], ii[3], ii[4], ii[5]]
            for ii in patch_crops
        ]
    )
    mirrored_patch_crops.append(
        [
            [ii[0], ii[1], org_img_shape[3] - ii[3], org_img_shape[3] - ii[2]]
            if len(ii) == 4
            else [ii[0], ii[1], org_img_shape[3] - ii[3], org_img_shape[3] - ii[2], ii[4], ii[5]]
            for ii in patch_crops
        ]
    )
    mirrored_patch_crops.append(
        [
            [
                org_img_shape[2] - ii[1],
                org_img_shape[2] - ii[0],
                org_img_shape[3] - ii[3],
                org_img_shape[3] - ii[2],
            ]
            if len(ii) == 4
            else [
                org_img_shape[2] - ii[1],
                org_img_shape[2] - ii[0],
                org_img_shape[3] - ii[3],
                org_img_shape[3] - ii[2],
                ii[4],
                ii[5],
            ]
            for ii in patch_crops
        ]
    )
    return mirrored_patch_crops
