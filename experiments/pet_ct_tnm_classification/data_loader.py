"""PET/CT data loader: multi-channel 3D variant of the LIDC loader.

Parity with the reference's ``experiments/pet_ct_tnm_classification/
data_loader.py``: per-patient ``{pid}_img.npy`` stores (c, z, y, x) dual-
modality volumes transposed to (c, y, x, z) on load (reference :233-234);
hold-out test set (no inner test split; test dir read directly); single
foreground class so patient sampling is uniform (head_classes == 2).
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

from experiments.lidc_exp.data_loader import PatientBatchIterator as _LidcPatientBatchIterator


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

    logger.info(f"data set loaded with: {len(train_pids)} train / {len(val_pids)} val patients")
    batch_gen = {}
    batch_gen["train"] = create_data_gen_pipeline(train_data, cf=cf, is_training=True)
    batch_gen["val_sampling"] = create_data_gen_pipeline(val_data, cf=cf, is_training=False)
    if cf.val_mode == "val_patient":
        batch_gen["val_patient"] = PatientBatchIterator(val_data, cf=cf)
        batch_gen["n_val"] = len(val_pids) if cf.max_val_patients is None else min(len(val_pids), cf.max_val_patients)
    else:
        batch_gen["n_val"] = cf.num_val_batches
    return batch_gen


def get_test_generator(cf, logger):
    test_data = load_dataset(cf, logger, pp_data_path=cf.pp_test_data_path)
    logger.info(f"data set loaded with: {len(test_data)} test patients")
    return {
        "test": PatientBatchIterator(test_data, cf=cf),
        "n_test": len(test_data) if cf.max_test_patients == "all" else min(cf.max_test_patients, len(test_data)),
    }


def load_dataset(cf, logger, subset_ixs=None, pp_data_path=None):
    if pp_data_path is None:
        pp_data_path = cf.pp_data_path
    p_df = pd.read_pickle(os.path.join(pp_data_path, cf.input_df_name))

    if cf.select_prototype_subset is not None:
        prototype_pids = p_df.pid.tolist()[: cf.select_prototype_subset]
        p_df = p_df[p_df.pid.isin(prototype_pids)]
        logger.warning("WARNING: using prototyping data subset!!!")
    if subset_ixs is not None:
        subset_pids = [np.unique(p_df.pid.tolist())[ix] for ix in subset_ixs]
        p_df = p_df[p_df.pid.isin(subset_pids)]
        logger.info(f"subset: selected {len(p_df)} instances from df")

    pids = p_df.pid.tolist()
    class_targets = p_df["class_target"].tolist()
    fg_slices = p_df["fg_slices"].tolist() if "fg_slices" in p_df.columns else [[]] * len(pids)

    data = OrderedDict()
    for ix, pid in enumerate(pids):
        targets = [int(ii) for ii in np.atleast_1d(class_targets[ix])]
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
    from medicaldetectiontoolkit_tpu.parallel import host_shard_info

    rank, _ = host_shard_info(cf)  # multi-host: distinct sampling per process
    seeds = [rank * cf.n_workers + w for w in range(cf.n_workers)]
    return MultiThreadedGenerator(data_gen, transforms, n_workers=cf.n_workers, seeds=seeds)


class BatchGenerator(BatchGeneratorBase):
    """Multi-channel (c, z, y, x) -> (c, y, x, z) volumes; fg-biased crops."""

    def __init__(self, data, batch_size, cf):
        super().__init__(data, batch_size, cf)
        self.crop_margin = np.array(cf.patch_size) / 8.0
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
            data = np.transpose(np.load(patient["data"], mmap_mode="r"), axes=(0, 2, 3, 1))  # (c, y, x, z)
            data = data[cf.channels]
            seg = np.transpose(np.load(patient["seg"], mmap_mode="r"), axes=(1, 2, 0))
            batch_pids.append(patient["pid"])
            batch_targets.append(patient["class_target"])

            if np.any([data.shape[d + 1] < ps for d, ps in enumerate(cf.pre_crop_size)]):
                new_shape = [np.max([data.shape[d + 1], ps]) for d, ps in enumerate(cf.pre_crop_size)]
                data = dutils.pad_nd_image(data, new_shape, mode="constant")
                seg = dutils.pad_nd_image(seg, new_shape, mode="constant")

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
                        if low >= high:
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


class PatientBatchIterator(_LidcPatientBatchIterator):
    """Whole-patient iteration; multi-channel (c, z, y, x) volumes."""

    def __next__(self):
        cf = self.cf
        pid = self.dataset_pids[self.patient_ix]
        patient = self._data[pid]
        raw = np.load(patient["data"], mmap_mode="r")
        data = np.transpose(raw, axes=(0, 2, 3, 1)).astype(np.float32)[cf.channels]  # (c, y, x, z)
        seg = np.transpose(np.load(patient["seg"], mmap_mode="r"), axes=(1, 2, 0)).astype("uint8")
        batch_class_targets = np.array([patient["class_target"]])

        if np.any([data.shape[d + 1] < ps for d, ps in enumerate(self.patch_size)]):
            new_shape = [data.shape[0]] + [np.max([data.shape[d + 1], self.patch_size[d]]) for d in range(3)]
            data = dutils.pad_nd_image(data, new_shape)
            seg = dutils.pad_nd_image(seg, new_shape[1:])

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
        out_batch = batch_3D

        if np.any([data.shape[d + 1] > self.patch_size[d] for d in range(3)]):
            patch_crop_coords_list = dutils.get_patch_crop_coords(data[0], self.patch_size)
            new_img_batch, new_seg_batch = [], []
            for c in patch_crop_coords_list:
                new_seg_batch.append(seg[c[0] : c[1], c[2] : c[3], c[4] : c[5]])
                new_img_batch.append(data[:, c[0] : c[1], c[2] : c[3], c[4] : c[5]])

            patch_batch = {
                "data": np.array(new_img_batch).astype(np.float32),
                "seg": np.array(new_seg_batch)[:, np.newaxis].astype("uint8"),
                "class_target": np.repeat(batch_class_targets, len(patch_crop_coords_list), axis=0),
                "pid": pid,
            }
            patch_batch["patch_crop_coords"] = np.array(patch_crop_coords_list)
            patch_batch["patient_bb_target"] = batch_3D["patient_bb_target"]
            patch_batch["patient_roi_labels"] = batch_3D["patient_roi_labels"]
            patch_batch["original_img_shape"] = batch_3D["original_img_shape"]
            patch_batch = convert_seg_to_bounding_box_coordinates(
                patch_batch, cf.dim, class_specific_seg_flag=cf.class_specific_seg_flag
            )
            out_batch = patch_batch

        self.patient_ix += 1
        if self.patient_ix == len(self.dataset_pids):
            self.patient_ix = 0
        return out_batch

    next = __next__
