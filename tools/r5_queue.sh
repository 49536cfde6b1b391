#!/bin/bash
# Round-5 fenced chip queue. The round-4 verdict's #1 complaint: the builder's
# queue held the chip when the driver's round-end bench ran (BENCH rc=124,
# third round running). This queue is HARD-FENCED: every stage's timeout is
# clamped to an absolute stop epoch (MDT_QUEUE_STOP, default = computed round
# end minus a ~38 min buffer), stages are skipped outright once the fence is
# near, and a stop-file (/tmp/r5_queue.stop) is honored between stages. The
# chip is guaranteed free after the fence.
#
# Priority (VERDICT round-4 "Next round"):
#   1. conv3d mrcnn RESUME from the round-4 epoch-8 checkpoint through
#      epoch 12 + train_test -> the first 3D Mask R-CNN test AP (item 2)
#   2. ablate fwd/bb_fwd/bb_bwd with the round-5 chain mixer (item 6)
#   3. harness_probe mrcnn -> decompose the ~16 s real-trainer step (item 4)
#   4. PET-CT dev-scale smoke on hardware (item 8)
set -u
OUT=/tmp/r5_chip
REPOLOG=chip_logs_r5
STOP=${MDT_QUEUE_STOP:-1787134500}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
mkdir -p "$REPOLOG"
export JAX_COMPILATION_CACHE_DIR=/tmp/mdt_tpu_jax_cache

stage() {
  local name=$1 cap=$2; shift 2
  local now remain tmo rc
  now=$(date +%s); remain=$((STOP - now - 60))
  if [ -f /tmp/r5_queue.stop ]; then
    echo "=== [$name] SKIPPED (stop-file) ==="; return
  fi
  if [ "$remain" -lt 180 ]; then
    echo "=== [$name] SKIPPED (fence: ${remain}s to stop) ==="; return
  fi
  tmo=$((cap < remain ? cap : remain))
  echo "=== [$name] start $(date -u +%H:%M:%S) (timeout ${tmo}s, fence $(date -u -d @$STOP +%H:%M:%S)) ==="
  timeout --kill-after=30 "$tmo" "$@" > "$OUT/$name.log" 2>&1
  rc=$?
  echo "=== [$name] rc=$rc end $(date -u +%H:%M:%S) ==="
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
  # keep evidence in-repo so it survives a VM reset (driver commits at round end)
  tail -c 16000 "$OUT/$name.log" > "$REPOLOG/$name.log" 2>/dev/null || true
}

timeout 180 python -c "import jax; print(jax.devices())" > "$OUT/probe.log" 2>&1 || {
  echo "chip probe FAILED"; exit 1; }
echo "chip reachable: $(tail -1 "$OUT/probe.log")  stop fence: $(date -u -d @$STOP)"

stage conv3d_mrcnn_resume 5400 python tools/convergence3d.py --model mrcnn --epochs 12 --resume
stage ab_fwd3 2400 python tools/ablate.py full fwd bb_fwd bb_bwd
stage probe_mrcnn 1500 python tools/harness_probe.py --exp lidc --model mrcnn --steps 5
stage petct_gen 900 python -c "
import os
from experiments.pet_ct_tnm_classification.preprocessing import generate_synthetic_petct
if not os.path.isfile('/tmp/petct_synth/info_df.pickle'):
    generate_synthetic_petct('/tmp/petct_synth', n_patients=6, shape=(48, 320, 320))
"
stage petct_smoke 2400 env MDT_PETCT_PP=/tmp/petct_synth MDT_MODEL=retina_net \
  MDT_PETCT_EPOCHS=2 MDT_PETCT_NTB=10 MDT_PETCT_BS=2 \
  python exec.py --mode train_test --exp_source experiments/pet_ct_tnm_classification \
  --exp_dir /tmp/petct_chip --folds 0
echo "=== r5 queue drained $(date -u) ==="
