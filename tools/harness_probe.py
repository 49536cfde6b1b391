#!/usr/bin/env python
"""Decompose the exec.py train-step wall clock (VERDICT r4 Weak 3).

The pure jitted step runs ~0.43 s at LIDC batch 6 (bench.py) yet the same
model inside exec.py logs 5-70 s/step (conv3d runs) and the 2D toy logs
~3.5 s device + ~4 s host load — a ~10x harness factor nobody has measured.
This probe drives the REAL experiment machinery (prep_exp + data_loader +
detector) serially and times every phase of N steps:

  load      next(batch_gen)                       (host: IO + augmentation)
  prep      detector._prep(batch), inputs forced  (host->device transfer)
  dispatch  train-step + detect enqueue           (host: trace-cache lookup,
                                                   arg handling)
  device    block_until_ready(monitor loss)       (device compute + queue)
  convert   train_forward_convert                 (device->host pulls + box
                                                   building)

plus the sizes crossing the link each way. Usage:
  python tools/harness_probe.py --exp toy  --model mrcnn --steps 6
  python tools/harness_probe.py --exp lidc --model mrcnn --steps 4 --bs 8
Env: MDT_HPROBE_* none; flags only. Needs toy data at /tmp/toy_mdt (or
--exp lidc generates synthetic LIDC under /tmp/lidc_synth).
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _tree_nbytes(tree):
    import jax

    return sum(
        getattr(l, "nbytes", 0)
        for l in jax.tree_util.tree_leaves(tree)
        if hasattr(l, "nbytes")
    )


def _batch_nbytes(batch):
    n = 0
    for v in batch.values():
        if isinstance(v, np.ndarray):
            n += v.nbytes
        elif isinstance(v, (list, tuple)):
            for e in v:
                if isinstance(e, np.ndarray):
                    n += e.nbytes
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", choices=["toy", "lidc"], default="toy")
    ap.add_argument("--model", default="mrcnn")
    ap.add_argument("--dim", type=int, default=None)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--bs", type=int, default=None)
    ap.add_argument("--exp_dir", default="/tmp/harness_probe")
    args = ap.parse_args()

    os.environ["MDT_MODEL"] = args.model
    if args.exp == "toy":
        src = os.path.join(REPO, "experiments/toy_exp")
        os.environ["MDT_DIM"] = str(args.dim or 2)
        if args.bs:
            os.environ["MDT_TOY_BS"] = str(args.bs)
        os.environ.setdefault("MDT_TOY_EPOCHS", "1")
    else:
        src = os.path.join(REPO, "experiments/lidc_exp")
        os.environ["MDT_DIM"] = str(args.dim or 3)
        if args.bs:
            os.environ["MDT_LIDC_BS"] = str(args.bs)
        sys.path.insert(0, REPO)
        from tools.convergence3d import ensure_data

        pp = ensure_data("/tmp/lidc_synth", 40)
        os.environ["MDT_LIDC_ROOT"] = "/tmp/lidc_synth"
        os.environ["MDT_LIDC_PP"] = pp

    import jax

    from medicaldetectiontoolkit_tpu.models import build_model
    from medicaldetectiontoolkit_tpu.utils import exp_utils as utils

    cf = utils.prep_exp(src, args.exp_dir, False, use_stored_settings=False)
    cf.fold = 0
    cf.fold_dir = os.path.join(cf.exp_dir, "fold_0")
    os.makedirs(cf.fold_dir, exist_ok=True)
    cf.data_dest = None
    logger = utils.get_logger(cf.fold_dir)
    data_loader = utils.import_module("dl", os.path.join(src, "data_loader.py"))

    net = build_model(cf, logger)
    net.initialize()
    net.current_lr = 1e-4
    batch_gen = data_loader.get_train_generators(cf, logger)

    print(f"exp={args.exp} model={args.model} dim={cf.dim} bs={cf.batch_size} "
          f"patch={cf.patch_size} platform={jax.devices()[0].platform}", flush=True)

    phases = {k: [] for k in ("load", "prep", "dispatch", "device", "convert", "convert_seg")}
    h2d = d2h = 0

    for i in range(args.steps + 1):  # step 0 = compile, excluded from stats
        t0 = time.perf_counter()
        batch = next(batch_gen["train"])
        t1 = time.perf_counter()
        prep = net._prep(batch)
        jax.block_until_ready(prep)
        t2 = time.perf_counter()
        # dispatch through the real path (prep runs again inside — cheap the
        # second time for numpy work, and the device puts dedupe by content)
        handles = net.train_forward_dispatch(batch)
        t3 = time.perf_counter()
        # the monitor dict of device scalars (position differs per family)
        monitor = next(h for h in handles if isinstance(h, dict))
        jax.block_until_ready(monitor)
        t4 = time.perf_counter()
        # lean convert = what exec.py's monitoring loop does; the second call
        # adds only the seg_preds device->host pull (the suspected hot phase)
        results = net.train_forward_convert(handles, batch, need_seg_preds=False)
        t5 = time.perf_counter()
        net.train_forward_convert(handles, batch, need_seg_preds=True)
        t6 = time.perf_counter()
        if i == 0:
            print(f"  compile/first step: {t5 - t0:.1f}s", flush=True)
            h2d = _tree_nbytes(prep)
            d2h = sum(
                np.asarray(h).nbytes if hasattr(h, "nbytes") else 0
                for h in jax.tree_util.tree_leaves(handles)
            )
            continue
        phases["load"].append(t1 - t0)
        phases["prep"].append(t2 - t1)
        phases["dispatch"].append(t3 - t2)
        phases["device"].append(t4 - t3)
        phases["convert"].append(t5 - t4)
        phases["convert_seg"].append(t6 - t5)
        print(f"  step {i}: load {t1-t0:.3f}  prep {t2-t1:.3f}  dispatch {t3-t2:.3f}"
              f"  device {t4-t3:.3f}  convert {t5-t4:.3f}  +seg {t6-t5:.3f}"
              f"  loss {results['loss']:.3f}", flush=True)

    print(f"h2d bytes/step: {h2d/1e6:.1f} MB  (link ~1.3 GB/s => {h2d/1.3e9*1e3:.0f} ms floor)")
    print(f"d2h bytes/step (handles): {d2h/1e6:.1f} MB => {d2h/1.3e9*1e3:.0f} ms floor")
    total = 0.0
    for k, v in phases.items():
        med = sorted(v)[len(v) // 2]
        total += med
        print(f"  {k:>9}: median {med*1e3:8.1f} ms   (min {min(v)*1e3:.1f}, max {max(v)*1e3:.1f})")
    print(f"  {'TOTAL':>9}: {total*1e3:8.1f} ms/step (sum of medians)", flush=True)

    for key in ("train", "val_sampling"):
        if key in batch_gen and hasattr(batch_gen[key], "shutdown"):
            batch_gen[key].shutdown()


if __name__ == "__main__":
    main()
