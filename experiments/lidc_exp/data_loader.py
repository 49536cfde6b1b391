"""LIDC data loader: fold-split patients, fg-biased patch sampling, patient
iteration with patch grids.

Entry-point and batch-contract parity with the reference's
``experiments/lidc_exp/data_loader.py``:
  * ``load_dataset``: info_df.pickle + per-patient ``{pid}_img.npy`` /
    ``{pid}_rois.npy`` (mmap), malignancy binarization (>= 3 -> malignant
    class 1, reference :164-166);
  * train generator: class-balanced patients (when > 2 head classes),
    fg-oversampled slice choice in 2D (p_fg = 0.5, fg_slices metadata),
    fg-guided pre-crop sampling with crop-margin constraint, optional
    ``n_3D_context`` neighbor slices in channels;
  * augmentation = mirror + spatial (train) or center crop (val), then
    seg -> boxes conversion;
  * ``PatientBatchIterator``: whole patient; builds 3D GT even for 2D models
    (for 2D->3D merged evaluation), pads to patch size, computes overlapping
    patch grid, stacks patches in the batch dimension, slices z per-slice for
    2D.

Stored arrays are (z, y, x) like the reference's preprocessing output and are
transposed to (y, x, z) on load (:242-243).
"""

from __future__ import annotations

import os
import pickle
from collections import OrderedDict

import numpy as np
import pandas as pd

from medicaldetectiontoolkit_tpu.data import dataloader_utils as dutils
from medicaldetectiontoolkit_tpu.data.augmentation import center_crop_batch, mirror_batch, spatial_augment_batch
from medicaldetectiontoolkit_tpu.data.loader import BatchGeneratorBase, MultiThreadedGenerator
from medicaldetectiontoolkit_tpu.data.seg_to_boxes import convert_seg_to_bounding_box_coordinates


def get_train_generators(cf, logger):
    all_data = load_dataset(cf, logger)
    all_pids_list = np.unique([v["pid"] for (k, v) in all_data.items()])

    if not cf.created_fold_id_pickle:
        fg = dutils.fold_generator(seed=cf.seed, n_splits=cf.n_cv_splits, len_data=len(all_pids_list)).get_fold_names()
        with open(os.path.join(cf.exp_dir, "fold_ids.pickle"), "wb") as handle:
            pickle.dump(fg, handle)
        cf.created_fold_id_pickle = True
    else:
        with open(os.path.join(cf.exp_dir, "fold_ids.pickle"), "rb") as handle:
            fg = pickle.load(handle)

    train_ix, val_ix, test_ix, _ = fg[cf.fold]
    train_pids = [all_pids_list[ix] for ix in train_ix]
    val_pids = [all_pids_list[ix] for ix in val_ix]
    if cf.hold_out_test_set:
        train_pids += [all_pids_list[ix] for ix in test_ix]

    train_data = {k: v for (k, v) in all_data.items() if v["pid"] in set(train_pids)}
    val_data = {k: v for (k, v) in all_data.items() if v["pid"] in set(val_pids)}

    logger.info(f"data set loaded with: {len(train_ix)} train / {len(val_ix)} val / {len(test_ix)} test patients")
    batch_gen = {}
    batch_gen["train"] = create_data_gen_pipeline(train_data, cf=cf, is_training=True)
    batch_gen["val_sampling"] = create_data_gen_pipeline(val_data, cf=cf, is_training=False)
    if cf.val_mode == "val_patient":
        batch_gen["val_patient"] = PatientBatchIterator(val_data, cf=cf)
        batch_gen["n_val"] = len(val_ix) if cf.max_val_patients is None else min(len(val_ix), cf.max_val_patients)
    else:
        batch_gen["n_val"] = cf.num_val_batches
    return batch_gen


def get_test_generator(cf, logger):
    if cf.hold_out_test_set:
        test_ix = None
        pp_data_path = cf.pp_test_data_path
    else:
        pp_data_path = cf.pp_test_data_path
        with open(os.path.join(cf.exp_dir, "fold_ids.pickle"), "rb") as handle:
            fold_list = pickle.load(handle)
        _, _, test_ix, _ = fold_list[cf.fold]

    test_data = load_dataset(cf, logger, test_ix, pp_data_path=pp_data_path)
    logger.info(f"data set loaded with: {len(test_data)} test patients")
    return {
        "test": PatientBatchIterator(test_data, cf=cf),
        "n_test": len(test_data) if cf.max_test_patients == "all" else min(cf.max_test_patients, len(test_data)),
    }


def copy_and_unpack_data(logger, pids, source_dir, target_dir):
    """Cluster staging: copy the listed patients' npz archives to the local
    working dir and unpack to npy (reference data_loader.py:446-460; shutil
    instead of rsync — same result on a shared filesystem)."""
    import shutil
    import time

    start_time = time.time()
    os.makedirs(target_dir, exist_ok=True)
    for pid in pids:
        for suffix in ("_img", "_rois"):
            for ext in (".npz", ".npy"):
                src = os.path.join(source_dir, f"{pid}{suffix}{ext}")
                if os.path.isfile(src) and not os.path.isfile(os.path.join(target_dir, os.path.basename(src))):
                    shutil.copy(src, target_dir)
    dutils.unpack_dataset(target_dir, threads=16)
    logger.info(
        f"copying and unpacking data set finished: {len(os.listdir(target_dir))} files in {target_dir}. "
        f"took {time.time() - start_time:.0f} sec"
    )


def load_dataset(cf, logger, subset_ixs=None, pp_data_path=None):
    if pp_data_path is None:
        pp_data_path = cf.pp_data_path
    if getattr(cf, "server_env", False) and getattr(cf, "data_dest", None):
        target_dir = os.path.join(cf.data_dest, cf.pp_name)
        if not os.path.isdir(target_dir) or not os.listdir(target_dir):
            os.makedirs(target_dir, exist_ok=True)
            import shutil

            shutil.copy(os.path.join(pp_data_path, cf.input_df_name), target_dir)
            df_tmp = pd.read_pickle(os.path.join(target_dir, cf.input_df_name))
            copy_and_unpack_data(logger, df_tmp.pid.tolist(), pp_data_path, target_dir)
        pp_data_path = target_dir
    p_df = pd.read_pickle(os.path.join(pp_data_path, cf.input_df_name))

    if cf.select_prototype_subset is not None:
        prototype_pids = p_df.pid.tolist()[: cf.select_prototype_subset]
        p_df = p_df[p_df.pid.isin(prototype_pids)]
        logger.warning("WARNING: using prototyping data subset!!!")

    if subset_ixs is not None:
        subset_pids = [np.unique(p_df.pid.tolist())[ix] for ix in subset_ixs]
        p_df = p_df[p_df.pid.isin(subset_pids)]
        logger.info(f"subset: selected {len(p_df)} instances from df")

    class_targets = p_df["class_target"].tolist()
    pids = p_df.pid.tolist()
    fg_slices = p_df["fg_slices"].tolist()

    data = OrderedDict()
    for ix, pid in enumerate(pids):
        # malignancy binarization: rater scores >= 3 are 'malignant' (class 1)
        targets = [1 if ii >= 3 else 0 for ii in class_targets[ix]]
        data[pid] = {
            "data": os.path.join(pp_data_path, f"{pid}_img.npy"),
            "seg": os.path.join(pp_data_path, f"{pid}_rois.npy"),
            "pid": pid,
            "class_target": targets,
            "fg_slices": fg_slices[ix],
        }
    return data


def create_data_gen_pipeline(patient_data, cf, is_training=True):
    data_gen = BatchGenerator(patient_data, batch_size=cf.batch_size, cf=cf)
    transforms = []
    if is_training:
        def mirror_t(batch, rng):
            batch["data"], batch["seg"] = mirror_batch(batch["data"], batch["seg"], rng)
            return batch

        def spatial_t(batch, rng):
            batch["data"], batch["seg"] = spatial_augment_batch(
                batch["data"], batch["seg"], cf.patch_size[: cf.dim], cf.da_kwargs, rng
            )
            return batch

        transforms += [mirror_t, spatial_t]
    else:
        def crop_t(batch, rng):
            batch["data"], batch["seg"] = center_crop_batch(batch["data"], batch["seg"], cf.patch_size[: cf.dim])
            return batch

        transforms.append(crop_t)

    def convert_t(batch, rng):
        return convert_seg_to_bounding_box_coordinates(
            batch, cf.dim, get_rois_from_seg_flag=False, class_specific_seg_flag=cf.class_specific_seg_flag
        )

    transforms.append(convert_t)
    return MultiThreadedGenerator(data_gen, transforms, n_workers=cf.n_workers, seeds=range(cf.n_workers))


class BatchGenerator(BatchGeneratorBase):
    """Samples patients (class-balanced), fg-biased slices/crops to
    pre_crop_size; augmentation produces the final patch_size."""

    def __init__(self, data, batch_size, cf):
        super().__init__(data, batch_size, cf)
        self.crop_margin = np.array(cf.patch_size) / 8.0  # min distance of ROI center to patch edge
        self.p_fg = 0.5

    def generate_train_batch(self, rng):
        cf = self.cf
        batch_data, batch_segs, batch_pids, batch_targets = [], [], [], []
        class_targets_list = [v["class_target"] for (k, v) in self._data.items()]

        if cf.head_classes > 2:
            batch_ixs = dutils.get_class_balanced_patients(
                class_targets_list, self.batch_size, cf.head_classes - 1, slack_factor=cf.batch_sample_slack, rng=rng
            )
        else:
            batch_ixs = rng.choice(len(class_targets_list), self.batch_size)

        patients = list(self._data.items())
        for b in batch_ixs:
            patient = patients[b][1]
            data = np.transpose(np.load(patient["data"], mmap_mode="r"), axes=(1, 2, 0))[np.newaxis]  # (c, y, x, z)
            seg = np.transpose(np.load(patient["seg"], mmap_mode="r"), axes=(1, 2, 0))
            batch_pids.append(patient["pid"])
            batch_targets.append(patient["class_target"])

            if cf.dim == 2:
                # fg-oversampled slice selection
                if len(patient["fg_slices"]) > 0:
                    fg_prob = self.p_fg / len(patient["fg_slices"])
                    bg_prob = (1 - self.p_fg) / max(data.shape[3] - len(patient["fg_slices"]), 1)
                    slices_prob = np.array(
                        [fg_prob if ix in patient["fg_slices"] else bg_prob for ix in range(data.shape[3])]
                    )
                    slices_prob /= slices_prob.sum()
                    slice_id = rng.choice(data.shape[3], p=slices_prob)
                else:
                    slice_id = rng.choice(data.shape[3])

                if cf.n_3D_context is not None:
                    padded_data = dutils.pad_nd_image(
                        data[0], [data.shape[-1] + cf.n_3D_context * 2], mode="constant"
                    )
                    padded_slice_id = slice_id + cf.n_3D_context
                    data = np.concatenate(
                        [
                            padded_data[..., ii][np.newaxis]
                            for ii in range(padded_slice_id - cf.n_3D_context, padded_slice_id + cf.n_3D_context + 1)
                        ],
                        axis=0,
                    )
                else:
                    data = data[..., slice_id]
                seg = seg[..., slice_id]

            # pad up to pre_crop_size
            if np.any([data.shape[d + 1] < ps for d, ps in enumerate(cf.pre_crop_size)]):
                new_shape = [np.max([data.shape[d + 1], ps]) for d, ps in enumerate(cf.pre_crop_size)]
                data = dutils.pad_nd_image(data, new_shape, mode="constant")
                seg = dutils.pad_nd_image(seg, new_shape, mode="constant")

            # fg-biased pre-crop
            crop_dims = [d for d, ps in enumerate(cf.pre_crop_size) if data.shape[d + 1] > ps]
            if len(crop_dims) > 0:
                fg_prob_sample = rng.rand(1)
                if fg_prob_sample < self.p_fg and np.sum(seg) > 0:
                    seg_ixs = np.argwhere(seg == rng.choice(np.unique(seg)[1:], 1))
                    roi_anchor_pixel = seg_ixs[rng.choice(seg_ixs.shape[0], 1)][0]
                    sample_seg_center = {}
                    for ii in crop_dims:
                        low = np.max(
                            (cf.pre_crop_size[ii] // 2, roi_anchor_pixel[ii] - (cf.patch_size[ii] // 2 - self.crop_margin[ii]))
                        )
                        high = np.min(
                            (
                                data.shape[ii + 1] - cf.pre_crop_size[ii] // 2,
                                roi_anchor_pixel[ii] + (cf.patch_size[ii] // 2 - self.crop_margin[ii]),
                            )
                        )
                        if low >= high:  # lesion at image edge: just keep crop inside image
                            low = data.shape[ii + 1] // 2 - (data.shape[ii + 1] // 2 - cf.pre_crop_size[ii] // 2)
                            high = data.shape[ii + 1] // 2 + (data.shape[ii + 1] // 2 - cf.pre_crop_size[ii] // 2)
                        sample_seg_center[ii] = rng.randint(low=int(low), high=int(high))
                else:
                    sample_seg_center = {
                        ii: rng.randint(low=cf.pre_crop_size[ii] // 2, high=data.shape[ii + 1] - cf.pre_crop_size[ii] // 2)
                        for ii in crop_dims
                    }
                for ii in crop_dims:
                    min_crop = int(sample_seg_center[ii] - cf.pre_crop_size[ii] // 2)
                    max_crop = int(sample_seg_center[ii] + cf.pre_crop_size[ii] // 2)
                    data = np.take(data, indices=range(min_crop, max_crop), axis=ii + 1)
                    seg = np.take(seg, indices=range(min_crop, max_crop), axis=ii)

            batch_data.append(data)
            batch_segs.append(seg[np.newaxis])

        return {
            "data": np.array(batch_data).astype(np.float32),
            "seg": np.array(batch_segs).astype(np.uint8),
            "pid": batch_pids,
            "class_target": np.array(batch_targets, dtype=object)
            if len({len(t) for t in batch_targets}) > 1
            else np.array(batch_targets),
        }


class PatientBatchIterator:
    """Whole-patient iteration with patch-grid decomposition (test/val)."""

    def __init__(self, data, cf):
        self._data = data
        self.cf = cf
        self.patient_ix = 0
        self.dataset_pids = [v["pid"] for (k, v) in data.items()]
        self.patch_size = list(cf.patch_size)
        if len(self.patch_size) == 2:
            self.patch_size = self.patch_size + [1]

    def __iter__(self):
        return self

    def __next__(self):
        cf = self.cf
        pid = self.dataset_pids[self.patient_ix]
        patient = self._data[pid]
        data = np.transpose(np.load(patient["data"], mmap_mode="r"), axes=(1, 2, 0))[np.newaxis].astype(np.float32)
        seg = np.transpose(np.load(patient["seg"], mmap_mode="r"), axes=(1, 2, 0)).astype("uint8")
        batch_class_targets = np.array([patient["class_target"]])

        if np.any([data.shape[d + 1] < ps for d, ps in enumerate(self.patch_size)]):
            new_shape = [data.shape[0]] + [np.max([data.shape[d + 1], self.patch_size[d]]) for d in range(3)]
            data = dutils.pad_nd_image(data, new_shape)
            seg = dutils.pad_nd_image(seg, new_shape[1:])

        batch_3D = None
        if cf.dim == 3 or cf.merge_2D_to_3D_preds:
            batch_3D = {
                "data": data[np.newaxis],
                "seg": seg[np.newaxis, np.newaxis],
                "class_target": batch_class_targets,
                "pid": pid,
            }
            batch_3D = convert_seg_to_bounding_box_coordinates(
                batch_3D, dim=3, class_specific_seg_flag=cf.class_specific_seg_flag
            )
            batch_3D.update(
                {
                    "patient_bb_target": batch_3D["bb_target"],
                    "patient_roi_labels": batch_3D["roi_labels"],
                    "original_img_shape": batch_3D["data"].shape,
                }
            )

        if cf.dim == 2:
            out_data = np.transpose(data, axes=(3, 0, 1, 2))  # (z, c, y, x)
            out_seg = np.transpose(seg, axes=(2, 0, 1))[:, np.newaxis]
            out_targets = np.array(np.repeat(batch_class_targets, out_data.shape[0], axis=0))

            if cf.n_3D_context is not None:
                slice_range = range(cf.n_3D_context, out_data.shape[0] + cf.n_3D_context)
                out_data = np.pad(
                    out_data, ((cf.n_3D_context, cf.n_3D_context), (0, 0), (0, 0), (0, 0)), "constant"
                )
                out_data = np.array(
                    [
                        np.concatenate(
                            [out_data[ii] for ii in range(sid - cf.n_3D_context, sid + cf.n_3D_context + 1)], axis=0
                        )
                        for sid in slice_range
                    ]
                )

            batch_2D = {"data": out_data, "seg": out_seg, "class_target": out_targets, "pid": pid}
            batch_2D = convert_seg_to_bounding_box_coordinates(
                batch_2D, dim=2, class_specific_seg_flag=cf.class_specific_seg_flag
            )
            if cf.merge_2D_to_3D_preds:
                batch_2D.update(
                    {
                        "patient_bb_target": batch_3D["patient_bb_target"],
                        "patient_roi_labels": batch_3D["patient_roi_labels"],
                        "original_img_shape": out_data.shape,
                    }
                )
            else:
                batch_2D.update(
                    {
                        "patient_bb_target": batch_2D["bb_target"],
                        "patient_roi_labels": batch_2D["roi_labels"],
                        "original_img_shape": out_data.shape,
                    }
                )

        out_batch = batch_3D if cf.dim == 3 else batch_2D
        patient_batch = out_batch

        # decompose into overlapping patches stacked along the batch dim
        if np.any([data.shape[d + 1] > self.patch_size[d] for d in range(3)]):
            patch_crop_coords_list = dutils.get_patch_crop_coords(data[0], self.patch_size)
            new_img_batch, new_seg_batch = [], []
            for cix, c in enumerate(patch_crop_coords_list):
                seg_patch = seg[c[0] : c[1], c[2] : c[3], c[4] : c[5]]
                new_seg_batch.append(seg_patch)
                if cf.dim == 2 and cf.n_3D_context is not None:
                    tmp_c_5 = c[5] + cf.n_3D_context * 2
                    if cix == 0:
                        data = np.pad(
                            data, ((0, 0), (0, 0), (0, 0), (cf.n_3D_context, cf.n_3D_context)), "constant"
                        )
                else:
                    tmp_c_5 = c[5]
                new_img_batch.append(data[:, c[0] : c[1], c[2] : c[3], c[4] : tmp_c_5])

            data_patched = np.array(new_img_batch)  # (n_patches, c, y, x, z)
            seg_patched = np.array(new_seg_batch)[:, np.newaxis]
            targets_patched = np.repeat(batch_class_targets, len(patch_crop_coords_list), axis=0)

            if cf.dim == 2:
                if cf.n_3D_context is not None:
                    data_patched = np.transpose(data_patched[:, 0], axes=(0, 3, 1, 2))
                else:
                    data_patched = data_patched[..., 0]
                seg_patched = seg_patched[..., 0]

            patch_batch = {
                "data": data_patched.astype(np.float32),
                "seg": seg_patched.astype("uint8"),
                "class_target": targets_patched,
                "pid": pid,
            }
            patch_batch["patch_crop_coords"] = np.array(patch_crop_coords_list)
            patch_batch["patient_bb_target"] = patient_batch["patient_bb_target"]
            patch_batch["patient_roi_labels"] = patient_batch["patient_roi_labels"]
            patch_batch["original_img_shape"] = patient_batch["original_img_shape"]
            patch_batch = convert_seg_to_bounding_box_coordinates(
                patch_batch, cf.dim, class_specific_seg_flag=cf.class_specific_seg_flag
            )
            out_batch = patch_batch

        self.patient_ix += 1
        if self.patient_ix == len(self.dataset_pids):
            self.patient_ix = 0
        return out_batch

    next = __next__
