"""Data-loading utilities: balanced sampling, CV folds, patch grids, padding.

Behavior-equivalent rebuild of the reference's ``utils/dataloader_utils.py``:
  * ``get_class_balanced_patients`` — roi-level class-equilibrium patient
    sampling with a slack ratio (:23-55);
  * ``fold_generator`` — n-fold CV with an inner-loop test split, identical
    rotation scheme and seeding so fold memberships match (:59-136);
  * ``get_patch_crop_coords`` — overlapping patch grid with a minimum overlap
    (default 30 px) and per-slice z-tiling for patch_size z == 1 (:140-180);
  * ``pad_nd_image`` — pad to min shape and/or divisibility with an inverse
    slicer (:184-245);
  * npz <-> npy pack/unpack helpers (:252-278).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def get_class_balanced_patients(class_targets, batch_size, num_classes, slack_factor=0.1, rng=None):
    """Sample patient indices toward roi-level class equilibrium.

    class_targets: list (per patient) of lists of roi class labels (0-based
    foreground classes). The first ``slack_factor * batch_size`` picks are
    unconstrained; afterwards a candidate is accepted if its rarest class is
    not the batch's current weakest class while it does contain the weakest
    class — i.e. it boosts what the batch lacks.
    """
    rng = rng or np.random
    batch_ixs = []
    class_count = {k: 0 for k in range(num_classes)}
    weakest_class = 0
    for ix in range(batch_size):
        tries = 0
        while True:
            cand = rng.choice(len(class_targets), 1)[0]
            cand_targets = list(class_targets[cand])
            tmp_weakest_class = np.argmin([cand_targets.count(ii) for ii in range(num_classes)])
            if (tmp_weakest_class != weakest_class and cand_targets.count(weakest_class) > 0) or ix < int(
                batch_size * slack_factor
            ):
                break
            # safety bound absent in the reference: if the weakest class does
            # not exist in the dataset at all, accept any candidate rather
            # than spinning forever.
            tries += 1
            if tries > 100 * max(len(class_targets), batch_size):
                break
        for c in range(num_classes):
            class_count[c] += list(class_targets[cand]).count(c)
        weakest_class = np.argmin([class_count[c] for c in range(num_classes)])
        batch_ixs.append(cand)
    return batch_ixs


class fold_generator:
    """n-fold CV splitter with inner-loop test set; reproduces the reference's
    rotation scheme exactly (same seed -> same fold memberships)."""

    def __init__(self, seed, n_splits, len_data):
        self.tr_ix = []
        self.val_ix = []
        self.te_ix = []
        self.slicer = None
        self.missing = 0
        self.fold = 0
        self.len_data = len_data
        self.n_splits = n_splits
        self.myseed = seed
        self.boost_val = 0

    def init_indices(self):
        t = list(np.arange(self.l))
        split_length = int(np.ceil(len(t) / float(self.n_splits)))
        self.slicer = split_length
        self.mod = len(t) % self.n_splits
        if self.mod > 0:
            self.missing = self.n_splits - self.mod
        self.te_ix = t[: self.slicer]
        self.tr_ix = t[self.slicer :]
        self.val_ix = self.tr_ix[: self.slicer]
        self.tr_ix = self.tr_ix[self.slicer :]

    def new_fold(self):
        slicer = self.slicer
        if self.fold < self.missing:
            slicer = self.slicer - 1
        temp = self.te_ix
        # mod == 1 exception: rebalance the last fold by one element
        if self.fold == self.n_splits - 2 and self.mod == 1:
            temp += self.val_ix[-1:]
            self.val_ix = self.val_ix[:-1]
        self.te_ix = self.val_ix
        self.val_ix = self.tr_ix[:slicer]
        self.tr_ix = self.tr_ix[slicer:] + temp

    def get_fold_names(self):
        names_list = []
        rgen = np.random.RandomState(self.myseed)
        cv_names = np.arange(self.len_data)
        rgen.shuffle(cv_names)
        self.l = len(cv_names)
        self.init_indices()
        for _ in range(self.n_splits):
            train_names = cv_names[self.tr_ix]
            val_names = cv_names[self.val_ix]
            test_names = cv_names[self.te_ix]
            names_list.append([train_names, val_names, test_names, self.fold])
            self.new_fold()
            self.fold += 1
        return names_list


def get_patch_crop_coords(img, patch_size, min_overlap=30):
    """Overlapping patch grid over an image; (n_patches, 2*dim) int coords.

    Outer patches pinned at the borders, inner centers interpolated; an extra
    patch is inserted per axis when overlap would fall below ``min_overlap``.
    patch_size z == 1 emits one patch per slice (2D-on-3D mode).
    """
    crop_coords = []
    for dim in range(len(img.shape)):
        n_patches = int(np.ceil(img.shape[dim] / patch_size[dim]))
        if n_patches == 1:
            crop_coords.append([(0, img.shape[dim])])
            continue
        center_dists = (img.shape[dim] - patch_size[dim]) / (n_patches - 1)
        if (patch_size[dim] - center_dists) < min_overlap:
            n_patches += 1
            center_dists = (img.shape[dim] - patch_size[dim]) / (n_patches - 1)
        patch_centers = np.round([(patch_size[dim] / 2 + (center_dists * ii)) for ii in range(n_patches)])
        crop_coords.append([(c - patch_size[dim] / 2, c + patch_size[dim] / 2) for c in patch_centers])

    coords_mesh_grid = []
    for ymin, ymax in crop_coords[0]:
        for xmin, xmax in crop_coords[1]:
            if len(crop_coords) == 3 and patch_size[2] > 1:
                for zmin, zmax in crop_coords[2]:
                    coords_mesh_grid.append([ymin, ymax, xmin, xmax, zmin, zmax])
            elif len(crop_coords) == 3 and patch_size[2] == 1:
                for zmin in range(img.shape[2]):
                    coords_mesh_grid.append([ymin, ymax, xmin, xmax, zmin, zmin + 1])
            else:
                coords_mesh_grid.append([ymin, ymax, xmin, xmax])
    return np.array(coords_mesh_grid).astype(int)


def pad_nd_image(image, new_shape=None, mode="edge", kwargs=None, return_slicer=False, shape_must_be_divisible_by=None):
    """Pad trailing axes to a minimum shape and/or divisibility constraint.

    new_shape applies to the LAST len(new_shape) axes; axes are never cropped
    (new_shape is a minimum). With return_slicer, also returns slices that
    crop the result back to the original shape.
    """
    if kwargs is None:
        kwargs = {}
    if new_shape is not None:
        old_shape = np.array(image.shape[-len(new_shape) :])
    else:
        assert shape_must_be_divisible_by is not None
        assert isinstance(shape_must_be_divisible_by, (list, tuple, np.ndarray))
        new_shape = image.shape[-len(shape_must_be_divisible_by) :]
        old_shape = new_shape

    num_axes_nopad = len(image.shape) - len(new_shape)
    new_shape = [max(new_shape[i], old_shape[i]) for i in range(len(new_shape))]
    new_shape = np.array(new_shape)

    if shape_must_be_divisible_by is not None:
        if not isinstance(shape_must_be_divisible_by, (list, tuple, np.ndarray)):
            shape_must_be_divisible_by = [shape_must_be_divisible_by] * len(new_shape)
        else:
            assert len(shape_must_be_divisible_by) == len(new_shape)
        for i in range(len(new_shape)):
            if new_shape[i] % shape_must_be_divisible_by[i] == 0:
                new_shape[i] -= shape_must_be_divisible_by[i]
        new_shape = np.array(
            [new_shape[i] + shape_must_be_divisible_by[i] - new_shape[i] % shape_must_be_divisible_by[i] for i in range(len(new_shape))]
        )

    difference = new_shape - old_shape
    pad_below = difference // 2
    pad_above = difference // 2 + difference % 2
    pad_list = [[0, 0]] * num_axes_nopad + list([list(i) for i in zip(pad_below, pad_above)])
    res = np.pad(image, pad_list, mode, **kwargs)
    if not return_slicer:
        return res
    pad_arr = np.array(pad_list)
    pad_arr[:, 1] = np.array(res.shape) - pad_arr[:, 1]
    slicer = list(slice(*i) for i in pad_arr)
    return res, slicer


#############################
#  data packing / unpacking #
#############################


def get_case_identifiers(folder):
    return [i[:-4] for i in os.listdir(folder) if i.endswith("npz")]


def convert_to_npy(npz_file):
    identifier = os.path.split(npz_file)[1][:-4]
    if not os.path.isfile(npz_file[:-4] + ".npy"):
        a = np.load(npz_file)[identifier]
        np.save(npz_file[:-4] + ".npy", a)


def unpack_dataset(folder, threads=8):
    case_identifiers = get_case_identifiers(folder)
    npz_files = [os.path.join(folder, i + ".npz") for i in case_identifiers]
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(convert_to_npy, npz_files))


def pack_dataset(folder, threads=8):
    """npy -> compressed npz (reference pack_dataset.py analog)."""

    def pack_one(npy_file):
        identifier = os.path.split(npy_file)[1][:-4]
        npz_file = npy_file[:-4] + ".npz"
        if not os.path.isfile(npz_file):
            np.savez_compressed(npz_file, **{identifier: np.load(npy_file)})

    npy_files = [os.path.join(folder, i) for i in os.listdir(folder) if i.endswith(".npy")]
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(pack_one, npy_files))


def delete_npy(folder):
    for ident in get_case_identifiers(folder):
        f = os.path.join(folder, ident + ".npy")
        if os.path.isfile(f):
            os.remove(f)
