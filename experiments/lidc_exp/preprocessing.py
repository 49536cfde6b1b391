"""LIDC offline preprocessing: NRRD/NIfTI -> resampled, normalized npy.

Behavior-parity with the reference's ``experiments/lidc_exp/preprocessing.py``:
  * resample CT to cf.target_spacing (0.7, 0.7, 1.25) mm with order-1
    interpolation, clip HU to [-1200, 600], z-score normalize;
  * fuse the 4 raters' per-nodule ROI masks by mean-mask >= 0.5 majority vote
    and mean malignancy over raters with label > -1 (suppressed ROIs logged);
  * emit ``{pid}_img.npy`` (z, y, x), ``{pid}_rois.npy`` (instance-labeled),
    ``meta_info_{pid}.pickle`` with {pid, class_target, spacing, fg_slices},
    aggregated into ``info_df.pickle``.

SimpleITK is an optional dependency (not baked into this image): the module
imports lazily and raises a clear error if raw NRRD reading is attempted
without it. Resampling uses scipy.ndimage.zoom (order 1, edge mode), which is
numerically equivalent to the reference's skimage.transform.resize usage.

Also provides ``generate_synthetic_lidc`` — an LIDC-shaped synthetic dataset
(same file/metadata contract) used for pipeline tests and benchmarks where
the real dataset is unavailable.
"""

from __future__ import annotations

import argparse
import os
import pickle
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd
from scipy import ndimage


def _require_sitk():
    try:
        import SimpleITK as sitk  # noqa: F401

        return sitk
    except ImportError as e:
        raise ImportError(
            "SimpleITK is required to read raw LIDC NRRD/NIfTI files. Install it, or use "
            "generate_synthetic_lidc() / pre-converted npy data."
        ) from e


def resample_array(src_imgs, src_spacing, target_spacing):
    """Order-1 resample of a (z, y, x) array from src to target spacing."""
    src_spacing = np.round(src_spacing, 3)
    target_shape = [
        int(src_imgs.shape[ix] * src_spacing[::-1][ix] / target_spacing[::-1][ix]) for ix in range(len(src_imgs.shape))
    ]
    for i in range(len(target_shape)):
        assert target_shape[i] > 0, ("AssertionError:", src_imgs.shape, src_spacing, target_spacing)
    img = src_imgs.astype(float)
    zoom = [t / s for t, s in zip(target_shape, img.shape)]
    return ndimage.zoom(img, zoom, order=1, mode="nearest").astype("float32")


def _load_normalized_ct(path, pid, cf):
    """Read + resample the CT volume; clip HU to [-1200, 600], z-score."""
    sitk = _require_sitk()
    img = sitk.ReadImage(os.path.join(path, f"{pid}_ct_scan.nrrd"))
    arr = sitk.GetArrayFromImage(img)
    print(f"processing {pid}", img.GetSpacing(), arr.shape)
    arr = resample_array(arr, img.GetSpacing(), cf.target_spacing)
    arr = np.clip(arr, -1200, 600).astype(np.float32)
    return (arr - arr.mean()) / arr.std(), img.GetSpacing()


def _fuse_one_nodule(mask_files, char_df, pid, cf, img_shape):
    """Majority-vote fusion of up to 4 raters' masks for one nodule.

    Returns (fused_bool_mask, malignancy): the vote mean over 4 rater slots
    (absent raters contribute an empty mask) is thresholded at 0.5; the
    malignancy label is the mean over the 4 slots excluding 'not rated'
    (-1) scores — absent raters count as 0, the reference's labeling
    convention (ref ``preprocessing.py:69-83``).
    """
    sitk = _require_sitk()
    votes = np.zeros(img_shape, dtype=np.float32)
    rater_labels = []
    for mf in mask_files:
        roi = sitk.ReadImage(os.path.join(cf.raw_data_dir, pid, mf))
        arr = resample_array(sitk.GetArrayFromImage(roi).astype(np.uint8), roi.GetSpacing(), cf.target_spacing)
        assert arr.shape == img_shape, [arr.shape, img_shape, pid]
        votes += arr
        nodule_id = int(mf.split("_")[2].lstrip("0"))
        rater_labels.append(char_df[char_df.NoduleID == nodule_id].Malignancy.values[0])
    rater_labels += [0] * (4 - len(rater_labels))
    fused = (votes / 4.0) >= 0.5
    malignancy = np.mean([lab for lab in rater_labels if lab > -1])
    return fused, malignancy


def pp_patient(inputs, cf):
    """One patient: normalized image + instance-labeled fused ROI map + meta.

    Output contract (ref ``preprocessing.py:54-110``): ``{pid}_img.npy``
    (z, y, x) float32, ``{pid}_rois.npy`` uint8 instance labels 1..n,
    ``meta_info_{pid}.pickle`` with pid / class_target (mean malignancy per
    kept nodule) / original spacing / fg_slices. Nodules whose fused mask is
    empty are suppressed and logged.
    """
    _, path = inputs
    pid = os.path.basename(path.rstrip("/"))
    img_arr, spacing = _load_normalized_ct(path, pid, cf)

    char_df = pd.read_csv(os.path.join(cf.root_dir, "characteristics.csv"), sep=";")
    char_df = char_df[char_df.PatientID == pid]

    # group the per-rater mask files by nodule id ({...}_{noduleid}_{roiid}.nii.gz);
    # sorted for determinism (the reference iterates a set)
    masks_by_roi = {}
    for f in os.listdir(path):
        if ".nii.gz" in f:
            masks_by_roi.setdefault(f.split(".")[0].split("_")[-1], []).append(f)

    final_rois = np.zeros_like(img_arr, dtype=np.uint8)
    mal_labels = []
    for rid in sorted(masks_by_roi):
        fused, malignancy = _fuse_one_nodule(masks_by_roi[rid], char_df, pid, cf, img_arr.shape)
        if fused.any():
            mal_labels.append(malignancy)
            final_rois[fused] = len(mal_labels)
        else:
            print("suppressed roi!", masks_by_roi[rid])
            with open(os.path.join(cf.pp_dir, "suppressed_rois.txt"), "a") as handle:
                handle.write(" ".join(masks_by_roi[rid]) + "\n")

    fg_slices = [int(z) for z in np.unique(np.nonzero(final_rois)[0])]
    mal_labels = np.array(mal_labels)
    assert len(mal_labels) + 1 == len(np.unique(final_rois)), [len(mal_labels), np.unique(final_rois), pid]

    np.save(os.path.join(cf.pp_dir, f"{pid}_rois.npy"), final_rois)
    np.save(os.path.join(cf.pp_dir, f"{pid}_img.npy"), img_arr)
    with open(os.path.join(cf.pp_dir, f"meta_info_{pid}.pickle"), "wb") as handle:
        pickle.dump({"pid": pid, "class_target": mal_labels, "spacing": spacing, "fg_slices": fg_slices}, handle)


def aggregate_meta_info(exp_dir):
    files = [os.path.join(exp_dir, f) for f in os.listdir(exp_dir) if "meta_info" in f]
    rows = []
    for f in files:
        with open(f, "rb") as handle:
            d = pickle.load(handle)
            rows.append([d["pid"], d["class_target"], d["spacing"], d["fg_slices"]])
    df = pd.DataFrame(rows, columns=["pid", "class_target", "spacing", "fg_slices"])
    df.to_pickle(os.path.join(exp_dir, "info_df.pickle"))
    print("aggregated meta info to df with length", len(df))
    return df


def generate_synthetic_lidc(out_dir, n_patients=8, shape=(64, 96, 96), n_nodules=(1, 3), seed=0):
    """LIDC-shaped synthetic volumes (same npy/info_df contract) for tests.

    Volumes are (z, y, x) noise with ellipsoidal 'nodules'; rois are instance
    labeled; class_target carries raw malignancy scores in [1, 5] so the
    loader's >= 3 binarization applies.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    for p in range(n_patients):
        pid = f"synth_{p:03d}"
        img = rng.randn(*shape).astype(np.float32) * 0.2
        rois = np.zeros(shape, np.uint8)
        n = rng.randint(n_nodules[0], n_nodules[1] + 1)
        mal = []
        for i in range(n):
            r = rng.randint(3, 7)
            cz = rng.randint(r, shape[0] - r)
            cy = rng.randint(r + 2, shape[1] - r - 2)
            cx = rng.randint(r + 2, shape[2] - r - 2)
            zz, yy, xx = np.ogrid[: shape[0], : shape[1], : shape[2]]
            ball = ((zz - cz) ** 2 / (r / 2) ** 2 + (yy - cy) ** 2 / r**2 + (xx - cx) ** 2 / r**2) < 1
            img[ball] += 1.0
            rois[ball] = i + 1
            # alternate benign/malignant so every tiny split contains both
            # classes (class-balanced sampling needs both to exist)
            mal.append(2 if (p + i) % 2 == 0 else 4)
        fg_slices = [int(ii) for ii in np.unique(np.argwhere(rois != 0)[:, 0])]
        np.save(os.path.join(out_dir, f"{pid}_img.npy"), img)
        np.save(os.path.join(out_dir, f"{pid}_rois.npy"), rois)
        with open(os.path.join(out_dir, f"meta_info_{pid}.pickle"), "wb") as handle:
            pickle.dump(
                {"pid": pid, "class_target": np.array(mal), "spacing": (0.7, 0.7, 1.25), "fg_slices": fg_slices},
                handle,
            )
    return aggregate_meta_info(out_dir)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true", help="generate a synthetic LIDC-shaped dataset instead")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--n_patients", type=int, default=8)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from experiments.lidc_exp.configs import configs

    cf = configs()
    if args.synthetic:
        generate_synthetic_lidc(args.out_dir or cf.pp_data_path, n_patients=args.n_patients)
    else:
        paths = [os.path.join(cf.raw_data_dir, ii) for ii in os.listdir(cf.raw_data_dir)]
        os.makedirs(cf.pp_dir, exist_ok=True)
        with ThreadPoolExecutor(max_workers=12) as pool:
            list(pool.map(lambda i: pp_patient(i, cf), enumerate(paths)))
        aggregate_meta_info(cf.pp_dir)
