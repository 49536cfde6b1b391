#!/bin/bash
# Round-4 chip queue: run everything that needs the real TPU, in priority
# order, unattended. Fire this the moment the axon tunnel is back:
#   nohup bash tools/chip_queue.sh > /tmp/chip_queue.log 2>&1 &
# Each stage appends to its own log under /tmp/r3_chip/; stages are
# independent (a failure moves on to the next) and each is bounded.
#
# Priority (VERDICT round-2 "Next round"):
#   1. bench.py train  -> the driver metric (claim: >= 20 patches/s)
#   2. bench.py infer  -> stale 42.4 number refresh
#   3. convergence3d mrcnn -> HBM-fit + convergence proof (item 2)
#   4. convergence3d retina_unet
#   5. trace the current step (item 6's evidence)
#   6. toy mrcnn at reference schedule (item 4; longest)
set -u
OUT=/tmp/r4_chip
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/mdt_tpu_jax_cache

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u +%H:%M:%S) ==="
  tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

# 0. sanity: is the chip actually reachable? bail early if not.
timeout 120 python -c "import jax; print(jax.devices())" > "$OUT/probe.log" 2>&1 || {
  echo "chip probe FAILED — tunnel still down"; exit 1; }
echo "chip reachable: $(tail -1 "$OUT/probe.log")"

# 0.5 hardware-validate the Pallas kernels + the new zband program first
# (fast, and a failure here explains anything downstream)
stage tpu_kernel_tests 1800 env MDT_TEST_ON_TPU=1 python -m pytest \
  tests/test_roi_align_pallas.py tests/test_nms_pallas.py \
  tests/test_zband_conv.py -q -x
# stem Pallas kernel: first-ever Mosaic compile of ops/stem_conv_pallas.py
# (interpret-mode-only so far; failure here just disqualifies ab_stem_pallas)
stage tpu_stem_pallas 1800 env MDT_TEST_ON_TPU=1 python -m pytest \
  tests/test_stem_conv_pallas.py -q -x

stage bench_train 5400 python bench.py
stage bench_infer 3600 env MDT_BENCH_MODE=infer python bench.py
stage conv3d_mrcnn 7200 python tools/convergence3d.py --model mrcnn --epochs 12
stage conv3d_retina_unet 7200 python tools/convergence3d.py --model retina_unet --epochs 12
stage trace_step 1800 python tools/trace.py

# --- A/B matrix (ablate.py 'full' = the real train step, elision-safe) ----
# PROMOTION RULE (decided in advance, acted on in-session when results land):
#   ab_zblock7 full-step time <= 0.95 * ab_base  ->  promote zblock G=7 to
#   auto-dispatch for the cin-18 3D stem (move from MDT_ZBLOCK_G env opt-in
#   into the _zfold_policy-style default in backbone.py, same SAME-geometry
#   gate); 0.95..1.0 -> keep opt-in; > 1.0 -> document the null result in
#   BASELINE.md and drop the env knob.
#   Same rule for ab_nozband vs ab_base: if removing zband WINS, flip the
#   auto-policy default off.
stage ab_base 1800 python tools/ablate.py full
stage ab_nozband 1800 env MDT_NO_ZBAND=1 python tools/ablate.py full
stage ab_noremat 1800 env MDT_ABLATE_REMAT=0 python tools/ablate.py full
stage ab_batch8 2400 env MDT_ABLATE_BATCH=8 python tools/ablate.py full
stage ab_stage_loop 1800 env MDT_STAGE_MODE=loop python tools/probe.py cost
stage ab_zblock7 1800 env MDT_ZBLOCK_G=7 python tools/ablate.py full
# Pallas stem forward (ops/stem_conv_pallas.py) vs the XLA zband default;
# same promotion rule as zblock (<= 0.95 * best-of(ab_base, ab_zblock7))
stage ab_stem_pallas 1800 env MDT_STEM_PALLAS=1 python tools/ablate.py full
# gradient accumulation: reference-parity EFFECTIVE batch 8 as 2 x physical 4
# (models/base.accum_value_and_grad). Not a throughput play — record
# patches/s + peak-HBM headroom; if it fits where monolithic batch 8 OOMs,
# note in BASELINE.md that 3D runs can use the reference schedule verbatim
# (MDT_GRAD_ACCUM=2 at batch 8).
stage ab_accum2x4 2400 env MDT_GRAD_ACCUM=2 MDT_ABLATE_BATCH=8 python tools/ablate.py full

# --- toy quality table at the REFERENCE schedule (24 ep x 100 x bs 20,
# 1000 train / 100 val / 400 test; data pre-generated at /tmp/toy_mdt).
# mrcnn first: its round-2 run died at epoch 6/24 in the tunnel outage.
toy() {
  local model=$1 tmo=$2
  stage "toy_$model" "$tmo" env MDT_MODEL="$model" MDT_TOY_MAXVAL=100 MDT_TOY_MAXTEST=400 \
    python exec.py --mode train_test --exp_source experiments/toy_exp \
    --exp_dir "/tmp/toy24_$model" --folds 0
}
toy mrcnn 14400
toy retina_net 10800
toy ufrcnn 10800
toy detection_unet 10800

# --- PET/CT dual-modality smoke on hardware (dev scale; proves the
# 2-channel 3D path + no-validation selection on the chip)
stage petct_gen 3600 python -c "
import os
from experiments.pet_ct_tnm_classification.preprocessing import generate_synthetic_petct
if not os.path.isfile('/tmp/petct_synth/info_df.pickle'):
    generate_synthetic_petct('/tmp/petct_synth', n_patients=6, shape=(48, 320, 320))
"
stage petct_dev_train 7200 env MDT_PETCT_PP=/tmp/petct_synth MDT_MODEL=retina_net \
  MDT_PETCT_EPOCHS=2 MDT_PETCT_NTB=10 MDT_PETCT_BS=2 \
  python exec.py --mode train_test --exp_source experiments/pet_ct_tnm_classification \
  --exp_dir /tmp/petct_chip --folds 0
echo "=== chip queue done $(date -u) ==="
