"""Synthetic toy dataset generator (circles / donuts), the de-facto e2e test
dataset.

Same data semantics as the reference's ``experiments/toy_exp/generate_toys.py``
(three modes from the Retina U-Net paper: donuts_shape, donuts_pattern,
circles_scale; 320x320 noise images, +0.2 disc foreground, 4-px hole for
donuts, class id in {0, 1}) but drawn vectorized instead of per-pixel Python
loops, and parallelized with threads.

Usage: python experiments/toy_exp/generate_toys.py [--root_dir DIR]
"""

from __future__ import annotations

import argparse
import os
import pickle
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pandas as pd

IMG_SIZE = 320


def create_image(out_dir, six, foreground_margin, class_diameters, mode, seed):
    rng = np.random.RandomState(seed)
    img = rng.rand(IMG_SIZE, IMG_SIZE)
    seg = np.zeros((IMG_SIZE, IMG_SIZE), dtype="uint8")
    center_x = rng.randint(foreground_margin, IMG_SIZE - foreground_margin)
    center_y = rng.randint(foreground_margin, IMG_SIZE - foreground_margin)
    class_id = rng.randint(0, 2)

    yy, xx = np.ogrid[:IMG_SIZE, :IMG_SIZE]
    dist2 = (xx - center_x) ** 2 + (yy - center_y) ** 2
    disc = dist2 < class_diameters[class_id] ** 2
    img[disc] += 0.2
    seg[disc] = 1

    if "donuts" in mode and class_id == 1:
        hole = dist2 < 4**2
        img[hole] -= 0.2
        if mode == "donuts_shape":
            seg[hole] = 0

    out = np.concatenate((img[None], seg[None]))
    out_path = os.path.join(out_dir, f"{six}.npy")
    np.save(out_path, out)
    with open(os.path.join(out_dir, f"meta_info_{six}.pickle"), "wb") as handle:
        pickle.dump([out_path, class_id, str(six)], handle)


def aggregate_meta_info(exp_dir):
    files = [os.path.join(exp_dir, f) for f in os.listdir(exp_dir) if "meta_info" in f]
    rows = []
    for f in files:
        with open(f, "rb") as handle:
            rows.append(pickle.load(handle))
    df = pd.DataFrame(rows, columns=["path", "class_id", "pid"])
    df.to_pickle(os.path.join(exp_dir, "info_df.pickle"))
    print(f"aggregated meta info to df with length {len(df)}")


def generate_experiment(root_dir, exp_name, n_train_images, n_test_images, mode, class_diameters=(20, 20), seed0=0):
    train_dir = os.path.join(root_dir, exp_name, "train")
    test_dir = os.path.join(root_dir, exp_name, "test")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(test_dir, exist_ok=True)
    foreground_margin = int(np.max(class_diameters) // 2)

    jobs = [(train_dir, six, foreground_margin, class_diameters, mode, seed0 + six) for six in range(n_train_images)]
    jobs += [
        (test_dir, six, foreground_margin, class_diameters, mode, seed0 + n_train_images + six)
        for six in range(n_test_images)
    ]
    with ThreadPoolExecutor(max_workers=12) as pool:
        list(pool.map(lambda a: create_image(*a), jobs))
    aggregate_meta_info(train_dir)
    aggregate_meta_info(test_dir)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root_dir", default=os.environ.get("MDT_TOY_ROOT", "/tmp/toy_mdt"))
    ap.add_argument("--n_train", type=int, default=1500)
    ap.add_argument("--n_test", type=int, default=1000)
    ap.add_argument("--modes", nargs="+", default=["donuts_shape", "donuts_pattern", "circles_scale"])
    args = ap.parse_args()
    for mode in args.modes:
        diam = (19, 20) if mode == "circles_scale" else (20, 20)
        generate_experiment(args.root_dir, mode, args.n_train, args.n_test, mode, class_diameters=diam)
