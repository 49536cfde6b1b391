#!/usr/bin/env python
"""Benchmark: LIDC-geometry 3D Retina U-Net training throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's LIDC 3D configuration
(``/root/reference/experiments/lidc_exp/configs.py:79-115,322``): patch
128x128x64, batch 8, start_filts 18 / end_filts 36, retina anchor scales,
n_rpn_features 64 — trained with the full jitted step (forward + on-device
anchor matching + SHEM + losses + grads + adam + detection refinement).

vs_baseline: ratio against the reference PyTorch pipeline's estimated V100
throughput for the same model/batch. The reference publishes no numbers
(BASELINE.md); we anchor on an engineering estimate of 2.4 patches/s
(fw+bw ~3.3 s / 8-patch batch for 3D ResNet50-FPN + heads on one V100 at
fp32 — consistent with the reference's ~30 min/epoch-of-200-batches era
schedules). The north-star target is >= 5x that, i.e. vs_baseline >= 5.

FLOP cross-check of the 2.4 patches/s anchor (round 2): XLA cost analysis of
this exact train step measures 1.09 TFLOP/patch (4.34 TFLOP at batch 4 —
fw+bw+optimizer for the same geometry; see tools/probe.py `cost`). The torch
0.4.1 reference runs fp32 (no AMP in 2018-era code), so 2.4 patches/s
corresponds to 2.6 TFLOP/s = 17% of a V100's 15.7 TFLOP/s fp32 peak —
mid-range for cuDNN-era 3D convolutions at 18-36 channels (which map poorly
onto cuDNN's implicit-GEMM tiles), and GENEROUS to the reference overall: it
additionally pays host-side NumPy anchor matching over ~7e5 anchors per batch
element per step (SURVEY 3.3's top host hotspot) and mid-forward
device<->host round-trips, neither of which this estimate charges it for.
On the reference's actual published hardware (TitanX sm_52, 6.7 TFLOP/s
fp32, README.md:45-53) the same utilization gives ~1.0 patches/s, so the
V100 anchor overstates, not understates, the baseline.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mdt_tpu_jax_cache")

import numpy as np

REF_V100_PATCHES_PER_SEC = 2.4  # documented estimate, see module docstring


def _probe_backend():
    """Fail fast if the accelerator backend is unreachable.

    Device discovery against a dead axon tunnel HANGS (it accepts TCP but the
    backend never answers), so an unreachable chip used to burn the full
    per-attempt timeout per batch size and surface to the driver as rc=124
    with no JSON (BENCH_r02/r03). Probe in a bounded SUBPROCESS (the hang is
    inside the PJRT plugin; an in-process alarm cannot reliably interrupt it)
    and convert "tunnel down" into an explicit bench_error record in <=2 min.
    """
    import subprocess

    timeout = int(os.environ.get("MDT_BENCH_PROBE_TIMEOUT", 120))
    if timeout <= 0:  # escape hatch
        return
    try:
        res = subprocess.run(
            [sys.executable, "-c", "import jax; d=jax.devices(); print(d[0].platform)"],
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        raise RuntimeError(
            f"backend unreachable: device discovery hung >{timeout}s (axon tunnel down?)"
        )
    if res.returncode != 0:
        raise RuntimeError(
            "backend probe failed: " + (res.stderr or res.stdout).strip()[-300:]
        )
    platform = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else "?"
    if platform == "cpu" and not os.environ.get("MDT_BENCH_ALLOW_CPU"):
        raise RuntimeError(
            "backend probe found only CPU (accelerator plugin not registered); "
            "set MDT_BENCH_ALLOW_CPU=1 to bench on CPU anyway"
        )
    print(f"# backend probe ok: {platform}", file=sys.stderr)


def main():
    """Try the reference batch size first, backing off on HBM exhaustion.

    The reference trains LIDC 3D at batch 8 on a 12 GB GPU; on a single
    v5e (16 GB) the bf16+remat configuration may still exceed HBM due to
    lane-padding of small channel counts, so the bench reports throughput at
    the largest batch that fits (patches/sec normalizes across batch sizes).

    Each attempt runs in a SUBPROCESS: the TPU runtime does not reliably
    reclaim HBM after an in-process ResourceExhausted, so retries must start
    from a clean device state.
    """
    # driver-proof defaults: try the measured-best config first — "2x4" is
    # effective batch 8 as 4 accumulated microbatches of 2 (the reference's
    # effective batch, and 16.1 p/s on chip vs 13.77 for monolithic batch 6,
    # chip_logs_r4/ab_accum2x4.log) — then back off to monolithic batches
    # (batch 8 has never fit v5e HBM, and a cold-cache OOM attempt costs
    # 10-20 min of compile before failing). Each attempt's wall clock is
    # bounded so one wedged attempt can't eat the driver's whole budget.
    if not os.environ.get("MDT_BENCH_PROBED"):
        _probe_backend()
        os.environ["MDT_BENCH_PROBED"] = "1"  # inherited: children skip re-probing

    batches = os.environ.get("MDT_BENCH_BATCH", "2x4,6,4").split(",")
    if len(batches) == 1:
        return _run(batches[0])

    import subprocess

    attempt_timeout = int(os.environ.get("MDT_BENCH_ATTEMPT_TIMEOUT", 2700))
    last = ""
    for bs in batches:
        env = dict(os.environ)
        env["MDT_BENCH_BATCH"] = bs
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True,
                text=True,
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=attempt_timeout,
            )
        except subprocess.TimeoutExpired:
            print(f"# batch {bs} attempt timed out after {attempt_timeout}s", file=sys.stderr)
            last = f"attempt timeout ({attempt_timeout}s) at batch {bs}"
            continue
        last = (res.stdout + res.stderr).strip()
        line = next((ln for ln in res.stdout.splitlines() if ln.startswith("{")), None)
        if res.returncode == 0 and line and "bench_error" not in line:
            print(line)
            return
        print(f"# batch {bs} attempt failed, retrying smaller", file=sys.stderr)
    raise RuntimeError(last[-500:])


def _run(batch_spec):
    import jax
    import jax.numpy as jnp

    from medicaldetectiontoolkit_tpu.models import base as model_base
    from medicaldetectiontoolkit_tpu.models import build_model
    from medicaldetectiontoolkit_tpu.testing import make_batch, make_config

    class _Log:
        def info(self, *a, **k):
            pass

    # "6" = monolithic batch 6; "2x4" = 4 accumulated microbatches of 2
    # (effective batch 8 in one jitted step, remat-live memory of batch 2)
    batch_spec = str(batch_spec)
    if "x" in batch_spec:
        micro, accum = (int(v) for v in batch_spec.split("x"))
        batch_size = micro * accum
    else:
        batch_size, accum = int(batch_spec), 1
    cf = make_config(
        model="retina_unet",
        dim=3,
        patch_size=[128, 128, 64],
        start_filts=18,
        end_filts=36,
        batch_size=batch_size,
    )
    cf.n_rpn_features = 64
    cf.pre_nms_limit = 50000
    cf.model_max_instances_per_batch_element = 30
    cf.rpn_train_anchors_per_image = 300  # LIDC 3D setting (lidc configs.py:257)
    # bfloat16 conv stack (losses/boxes stay fp32): the TPU-native precision
    # choice; with fp32 the full-res stride-1 levels do not fit v5e HBM at
    # batch 8 (lane padding inflates 18-channel tensors 7x).
    cf.compute_dtype = os.environ.get("MDT_BENCH_DTYPE", "bfloat16")
    cf.grad_accum_steps = accum

    net = build_model(cf, _Log())
    net.initialize(seed=0)
    net.current_lr = 1e-4

    batch = make_batch(cf)
    img = model_base.image_to_device(batch["data"])
    gt_boxes, gt_ids, gt_valid = model_base.pad_gt_boxes(
        batch["bb_target"], batch["roi_labels"], img.shape[0], cf.dim, cf.max_gt_boxes
    )
    seg = model_base.seg_to_device(batch["seg"])
    rng = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-4)

    params, opt_state = net.params, net.opt_state

    def step(params, opt_state, i):
        out = net._train_step_fn(
            params, opt_state, jax.random.fold_in(rng, i), lr, img, gt_boxes, gt_ids, gt_valid, seg
        )
        # detection refinement runs every train step in the reference, too
        net._detect_fn(*out[3])
        return out

    # warmup (compile + 2 steps)
    out = step(params, opt_state, 0)
    params, opt_state = out[0], out[1]
    out = step(params, opt_state, 1)
    params, opt_state = out[0], out[1]
    jax.block_until_ready(out[2]["loss"])

    n_steps = int(os.environ.get("MDT_BENCH_STEPS", 10))
    t0 = time.perf_counter()
    for i in range(n_steps):
        out = step(params, opt_state, 2 + i)
        params, opt_state = out[0], out[1]
    jax.block_until_ready(out[2]["loss"])
    dt = time.perf_counter() - t0
    patches_per_sec = n_steps * batch_size / dt

    result = {
        "metric": "lidc3d_retina_unet_train_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 3),
        "unit": "patches/s",
        "vs_baseline": round(patches_per_sec / REF_V100_PATCHES_PER_SEC, 3),
    }

    if os.environ.get("MDT_BENCH_MODE") == "infer":
        # inference path: forward + detection refinement (no grads/update).
        # The step index is threaded into the input VALUES inside the jitted
        # wrapper: the TPU runtime elides executions whose inputs are
        # bit-identical to a previous call, so a same-inputs loop measures
        # dispatch, not compute (additive epsilons that round away do not
        # defeat it; the 1e-3 relative scale is timing-irrelevant).
        @jax.jit
        def infer(p, x, i):
            heads = net._predict(p, x * (1.0 + i.astype(x.dtype) * x.dtype.type(1e-3)))
            return net._finalize_outputs_jit(*heads)

        out_i = infer(params, img, jnp.int32(0))
        jax.block_until_ready(out_i[0])
        t0 = time.perf_counter()
        for i in range(n_steps):
            out_i = infer(params, img, jnp.int32(1 + i))
        jax.block_until_ready(out_i[0])
        dt_i = time.perf_counter() - t0
        result = {
            "metric": "lidc3d_retina_unet_infer_patches_per_sec_per_chip",
            "value": round(n_steps * batch_size / dt_i, 3),
            "unit": "patches/s",
            "vs_baseline": round(n_steps * batch_size / dt_i / REF_V100_PATCHES_PER_SEC, 3),
        }

    result["config"] = f"batch={batch_spec} dtype={cf.compute_dtype}"
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # emit a parseable failure record
        print(json.dumps({"metric": "bench_error", "value": 0, "unit": str(e)[:200], "vs_baseline": 0}))
        sys.exit(1)
