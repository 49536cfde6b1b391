"""Pack/unpack the preprocessed LIDC dataset (npy <-> compressed npz).

Parity with the reference's ``experiments/lidc_exp/pack_dataset.py``: used to
shrink the dataset for cluster transfer; the loader consumes unpacked npy.

Usage:
  python experiments/lidc_exp/pack_dataset.py --mode pack --dir <pp_dir>
  python experiments/lidc_exp/pack_dataset.py --mode unpack --dir <pp_dir>
"""

import argparse

from medicaldetectiontoolkit_tpu.data.dataloader_utils import delete_npy, pack_dataset, unpack_dataset

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["pack", "unpack", "clean_npy"], required=True)
    ap.add_argument("--dir", required=True)
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()
    if args.mode == "pack":
        pack_dataset(args.dir, threads=args.threads)
    elif args.mode == "unpack":
        unpack_dataset(args.dir, threads=args.threads)
    else:
        delete_npy(args.dir)
