#!/usr/bin/env python
"""3D convergence demonstration at LIDC geometry (VERDICT round-1 item 6).

Generates a synthetic LIDC-shaped dataset (volumes large enough for the real
128x128x64 training patches), then drives the REAL trainer + test pipeline
(exec.py train_test: patching, augmentation, fg-biased sampling, ensembled
inference, WBC consolidation, evaluation) for the requested model. Reports
per-epoch val APs and the final test AP, proving (a) monotone 3D convergence
and (b) that the model fits HBM at the reference's training geometry.

Usage (on the chip):
  python tools/convergence3d.py --model retina_unet --epochs 12
  python tools/convergence3d.py --model mrcnn --epochs 12 --batch_size 8
"""

import argparse
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_data(root, n_patients, seed=7, shape=(100, 176, 176)):
    pp = os.path.join(root, "lidc_mdt")
    marker = os.path.join(pp, "info_df.pickle")
    if os.path.isfile(marker):
        return pp
    from experiments.lidc_exp.preprocessing import generate_synthetic_lidc

    # default volumes comfortably larger than the 128x128x64 patch /
    # 156x156x96 pre-crop so patient tiling and fg-biased cropping are
    # exercised (shape is (z, y, x))
    generate_synthetic_lidc(pp, n_patients=n_patients, shape=shape,
                            n_nodules=(1, 4), seed=seed)
    return pp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="retina_unet")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--ntb", type=int, default=40, help="train batches / epoch")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--n_patients", type=int, default=40)
    ap.add_argument("--root", default="/tmp/lidc_synth")
    ap.add_argument("--exp_dir", default=None)
    ap.add_argument("--mode", default="train_test")
    ap.add_argument("--patch", default=None,
                    help="shrink patch geometry, e.g. 48,48,16 (CPU smoke of "
                         "this script before spending chip time on it)")
    ap.add_argument("--shape", default=None,
                    help="synthetic volume (z,y,x), e.g. 40,104,104")
    ap.add_argument("--resume", action="store_true",
                    help="resume from <exp_dir>/fold_0/last_checkpoint "
                         "(continue an interrupted run through to test)")
    args = ap.parse_args()

    shape = tuple(int(v) for v in args.shape.split(",")) if args.shape else (100, 176, 176)
    pp = ensure_data(args.root, args.n_patients, shape=shape)
    exp_dir = args.exp_dir or f"/tmp/conv3d_{args.model}"

    env = dict(os.environ)
    if args.patch:
        env["MDT_LIDC_PATCH"] = args.patch
    env.update(
        MDT_LIDC_ROOT=args.root,
        MDT_LIDC_PP=pp,
        MDT_MODEL=args.model,
        MDT_DIM="3",
        MDT_LIDC_EPOCHS=str(args.epochs),
        MDT_LIDC_NTB=str(args.ntb),
        MDT_LIDC_BS=str(args.batch_size),
        MDT_LIDC_NVB="5",
        JAX_COMPILATION_CACHE_DIR=env.get("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache"),
    )
    cmd = [sys.executable, os.path.join(REPO, "exec.py"), "--mode", args.mode,
           "--exp_source", os.path.join(REPO, "experiments/lidc_exp"),
           "--exp_dir", exp_dir, "--folds", "0"]
    if args.resume:
        cmd += ["--resume_to_checkpoint",
                os.path.join(exp_dir, "fold_0", "last_checkpoint")]
    print("running:", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd, env=env)
    if rc:
        sys.exit(rc)

    # surface the val-AP trajectory + final test score
    log = os.path.join(exp_dir, "fold_0", "exec.log")
    if os.path.isfile(log):
        with open(log) as fh:
            txt = fh.read()
        for line in txt.splitlines():
            if re.search(r"val results|malignant_ap|benign_ap", line):
                print(line)
    results = os.path.join(exp_dir, "test", "results.txt")
    if os.path.isfile(results):
        print("===== test results =====")
        print(open(results).read())


if __name__ == "__main__":
    main()
