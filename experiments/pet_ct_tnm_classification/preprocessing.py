"""PET/CT offline preprocessing: dual-modality NIfTI/NRRD -> normalized npy.

Behavior-parity with the reference's
``experiments/pet_ct_tnm_classification/preprocessing.py``:
  * CT resampled to ~(0.98, 0.98, 3.27) mm when finer; PET + seg resampled
    onto the CT grid;
  * lung z-range estimation by thresholding (< -600 HU), border clearing and
    connected-component analysis with center-of-mass radius criteria,
    recursive parameter adaptation when the crop is too long/short;
  * seg labels in the listed background categories are dropped; remaining
    ROIs binarized to one foreground class;
  * CT clipped to [-1200, 600] + z-scored; PET z-scored; channels stacked to
    (2, z, y, x);
  * emits ``{pid}_img.npy`` / ``{pid}_rois.npy`` + info_df rows with
    {pid, raw_pid, class_target, fg_slices}.

SimpleITK / pynrrd are optional dependencies (not baked into this image);
the module raises a clear error when raw reading is attempted without them.
``generate_synthetic_petct`` provides a contract-compatible synthetic dataset
for pipeline tests.
"""

from __future__ import annotations

import argparse
import os
import pickle
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd
from scipy import ndimage

BACKGROUND_CATEGORIES = ["M1b_brain", "N_inflammation", "T_benign", "T_other"]


def _require_sitk():
    try:
        import SimpleITK as sitk

        return sitk
    except ImportError as e:
        raise ImportError(
            "SimpleITK is required for raw PET/CT preprocessing. Install it, or use "
            "generate_synthetic_petct() / pre-converted npy data."
        ) from e


def _clear_border(mask):
    """Remove components touching the image border (skimage.clear_border analog)."""
    labeled, n = ndimage.label(mask)
    if n == 0:
        return mask
    border_labels = np.unique(
        np.concatenate([labeled[0].ravel(), labeled[-1].ravel(), labeled[:, 0].ravel(), labeled[:, -1].ravel()])
    )
    out = mask.copy()
    for lab in border_labels:
        if lab != 0:
            out[labeled == lab] = 0
    return out


def get_z_crops(x, ix, min_pix=1500, n_comps=2, rad_crit=20000):
    """Estimate the lung z-range from the CT volume (z, y, x).

    A slice counts as 'lung' when it contains >= n_comps sufficiently large
    air components (< -600 HU, border-cleared) whose centers of mass lie
    within rad_crit of the slice center. Crop too long -> stricter params;
    too short -> allow one component.
    """
    final_slices = []
    for six in range(x.shape[0]):
        tx = np.copy(x[six]) < -600
        img_center = np.array(tx.shape) / 2
        tx = _clear_border(tx)
        clusters, n_cands = ndimage.label(tx)
        count = np.unique(clusters, return_counts=True)
        keep_comps = np.array([int(ii) for ii in np.argwhere(count[1] > min_pix).ravel() if ii > 0])
        if len(keep_comps) > n_comps - 1:
            coms = ndimage.center_of_mass(tx, clusters, index=list(keep_comps))
            keep_com = [
                kix
                for kix, ii in enumerate(np.atleast_2d(coms))
                if ((ii[0] - img_center[0]) ** 2 + (ii[1] - img_center[1]) ** 2 < rad_crit)
            ]
            keep_comps = keep_comps[keep_com]
            if len(keep_comps) > n_comps - 1:
                final_slices.append(six)

    if not final_slices:
        return 0, x.shape[0]
    z_min = max(np.min(final_slices) - 7, 0)
    z_max = np.max(final_slices) + 7
    dist = z_max - z_min
    if dist >= 151:
        return get_z_crops(x, ix, min_pix=min_pix + 500, n_comps=n_comps, rad_crit=rad_crit - 500)
    if dist <= 43 and n_comps > 1:
        return get_z_crops(x, ix, n_comps=1, min_pix=min_pix - 100, rad_crit=rad_crit + 100)
    return z_min, z_max


def pp_patient(inputs, cf):
    sitk = _require_sitk()
    try:
        import nrrd
    except ImportError as e:
        raise ImportError("pynrrd is required to read .seg.nrrd rater segmentations") from e

    ix, path = inputs
    pid = ix
    print("processing", pid, path)
    x = sitk.ReadImage(os.path.join(path, "lsa_ct.nii.gz"))
    p = sitk.ReadImage(os.path.join(path, "lsa_pet.nii.gz"))
    readdata, header = nrrd.read(os.path.join(path, "lsa.seg.nrrd"))
    if len(readdata.shape) == 3:
        readdata = readdata[None]
        spacing = np.diagonal(header["space directions"])
    else:
        spacing = np.diagonal(header["space directions"][1:, :])

    origin = header["space origin"] * np.sign(spacing)
    labels = [header[k].split("=")[-1] for k in header.keys() if "_Name" in k]
    seg = np.zeros_like(readdata[0])
    for rix in range(readdata.shape[0]):
        if labels[rix] not in BACKGROUND_CATEGORIES:
            seg[readdata[rix] == 1] = rix + 1
    seg = seg.astype("uint8")
    s = sitk.GetImageFromArray(np.transpose(seg, axes=(2, 1, 0)))
    s.SetSpacing(tuple(abs(spacing)))
    s.SetOrigin(tuple(origin))

    x_spacing = x.GetSpacing()
    if x_spacing[0] < 0.95 or x_spacing[2] < 3:
        new_spacing = (0.976562, 0.976562, 3.27)
        new_size = [int(x.GetSize()[ii] * x_spacing[ii] / new_spacing[ii]) for ii in range(3)]
        reference_image = sitk.Image(new_size, x.GetPixelIDValue())
        reference_image.SetOrigin(x.GetOrigin())
        reference_image.SetDirection(x.GetDirection())
        reference_image.SetSpacing(new_spacing)
        x = sitk.Resample(x, reference_image)

    resampler = sitk.ResampleImageFilter()
    resampler.SetReferenceImage(x)
    rp = resampler.Execute(p)
    rs = resampler.Execute(s)
    pi = sitk.GetArrayFromImage(rp)
    si = sitk.GetArrayFromImage(rs)
    xi = sitk.GetArrayFromImage(x)

    zmin, zmax = get_z_crops(xi, ix)
    xa = xi[zmin:zmax]
    pa = pi[zmin:zmax]
    sa = si[zmin:zmax]

    xa = np.clip(xa, -1200, 600)
    xa = (1200 + xa) / (600 + 1200)
    xa = (xa - np.mean(xa)) / np.std(xa)
    pa = (pa - np.mean(pa)) / np.std(pa)

    assert np.all(np.array(xa.shape) == np.array(sa.shape))
    img = np.concatenate((xa[None], pa[None])).astype(np.float32)

    remaining_comps = np.unique(sa)
    remaining_labels = [ii for lix, ii in enumerate(labels) if lix + 1 in remaining_comps]
    sa[sa > 0] = 1
    fg_slices = [int(ii) for ii in np.unique(np.argwhere(sa != 0)[:, 0])]

    np.save(os.path.join(cf.pp_dir, f"{pid}_rois.npy"), sa)
    np.save(os.path.join(cf.pp_dir, f"{pid}_img.npy"), img)
    with open(os.path.join(cf.pp_dir, f"meta_info_{pid}.pickle"), "wb") as handle:
        pickle.dump(
            {"pid": pid, "raw_pid": os.path.basename(path), "class_target": remaining_labels, "fg_slices": fg_slices},
            handle,
        )


def aggregate_meta_info(pp_dir):
    files = [os.path.join(pp_dir, f) for f in os.listdir(pp_dir) if "meta_info" in f]
    rows = []
    for f in files:
        with open(f, "rb") as handle:
            d = pickle.load(handle)
            rows.append([d["pid"], d.get("raw_pid", str(d["pid"])), d["class_target"], d["fg_slices"]])
    df = pd.DataFrame(rows, columns=["pid", "raw_pid", "class_target", "fg_slices"])
    df.to_pickle(os.path.join(pp_dir, "info_df.pickle"))
    print("aggregated meta info to df with length", len(df))
    return df


def collect_paths(in_dir):
    paths = []
    for path, dirs, files in os.walk(in_dir):
        pet_files = [f for f in files if "lsa_pet" in f]
        if len(files) > 0 and "TNM" in path and len(pet_files) > 0:
            paths.append(path)
    return paths


def generate_synthetic_petct(out_dir, n_patients=4, shape=(40, 96, 96), seed=0):
    """PET/CT-shaped synthetic dataset: (2, z, y, x) volumes, binary rois."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    for p in range(n_patients):
        pid = f"petct_{p:03d}"
        ct = rng.randn(*shape).astype(np.float32) * 0.3
        pet = rng.randn(*shape).astype(np.float32) * 0.3
        rois = np.zeros(shape, np.uint8)
        r = rng.randint(3, max(4, min(8, shape[0] // 3)))
        cz = rng.randint(r, shape[0] - r)
        cy = rng.randint(r + 2, shape[1] - r - 2)
        cx = rng.randint(r + 2, shape[2] - r - 2)
        zz, yy, xx = np.ogrid[: shape[0], : shape[1], : shape[2]]
        ball = ((zz - cz) ** 2 / (r / 2) ** 2 + (yy - cy) ** 2 / r**2 + (xx - cx) ** 2 / r**2) < 1
        ct[ball] += 1.0
        pet[ball] += 2.0
        rois[ball] = 1
        img = np.stack([ct, pet])
        fg_slices = [int(ii) for ii in np.unique(np.argwhere(rois != 0)[:, 0])]
        np.save(os.path.join(out_dir, f"{pid}_img.npy"), img)
        np.save(os.path.join(out_dir, f"{pid}_rois.npy"), rois)
        with open(os.path.join(out_dir, f"meta_info_{pid}.pickle"), "wb") as handle:
            pickle.dump({"pid": pid, "raw_pid": pid, "class_target": [0], "fg_slices": fg_slices}, handle)
    return aggregate_meta_info(out_dir)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--n_patients", type=int, default=4)
    args = ap.parse_args()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from experiments.pet_ct_tnm_classification.configs import configs

    cf = configs()
    if args.synthetic:
        generate_synthetic_petct(args.out_dir or cf.pp_data_path, n_patients=args.n_patients)
    else:
        paths = collect_paths(cf.raw_data_dir)
        print("all paths", len(paths))
        os.makedirs(cf.pp_dir, exist_ok=True)
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(lambda i: pp_patient(i, cf), enumerate(paths)))
        aggregate_meta_info(cf.pp_dir)
