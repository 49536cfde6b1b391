#!/bin/bash
# Round-5 FENCED chip queue (VERDICT r4 "Next 1" / "Weak 2": the round-4
# queue had no preemption hook and held the chip through the driver's bench,
# making BENCH_r04 rc=124 despite a live tunnel).
#
# Fence mechanics — this queue can never hold the TPU at round end:
#   * stop-file: `touch /tmp/mdt_queue_stop` prevents any further stage from
#     starting (checked between stages; a human or bench wrapper can preempt).
#   * deadline: MDT_QUEUE_DEADLINE (unix epoch seconds, default now+4h). A
#     stage's timeout is clamped to the remaining budget, and a stage is
#     skipped outright when <300 s remain — the queue always drains.
#   * every stage is `timeout`-bounded; nothing runs unbounded.
#   * after each stage the log tail syncs into the repo (chip_logs_r5/) so
#     evidence survives the VM resets that wiped /tmp twice in round 4.
#
# Usage: nohup bash tools/chip_queue_r5.sh <stage> [<stage> ...] \
#          > /tmp/r5_queue.log 2>&1 & echo $! > /tmp/r5_queue.pid
set -u
OUT=${MDT_QUEUE_OUT:-/tmp/r5_chip}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SYNC="$REPO/chip_logs_r5"
STOP=/tmp/mdt_queue_stop
DEADLINE=${MDT_QUEUE_DEADLINE:-$(($(date +%s) + 14400))}
mkdir -p "$OUT" "$SYNC"
cd "$REPO"
export JAX_COMPILATION_CACHE_DIR=/tmp/mdt_tpu_jax_cache

stage() {
  local name=$1 tmo=$2; shift 2
  if [ -f "$STOP" ]; then
    echo "=== [$name] SKIPPED (stop-file $STOP present) ==="; return
  fi
  local left=$((DEADLINE - $(date +%s)))
  if [ "$left" -lt 300 ]; then
    echo "=== [$name] SKIPPED (deadline: ${left}s left) ==="; return
  fi
  [ "$tmo" -gt "$left" ] && tmo=$left
  echo "=== [$name] start $(date -u +%H:%M:%S) (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc end $(date -u +%H:%M:%S) ==="
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
  # durable copy (bounded: exec logs can be huge)
  tail -c 200000 "$OUT/$name.log" > "$SYNC/$name.log" 2>/dev/null
}

# bounded reachability probe: bail early instead of hanging on a dead tunnel
timeout 120 python -c "import jax; print(jax.devices())" > "$OUT/probe.log" 2>&1 || {
  echo "chip probe FAILED — tunnel down"; exit 1; }
echo "chip reachable: $(tail -1 "$OUT/probe.log")"

for s in "$@"; do
  case "$s" in
    bench_train)   stage bench_train 4500 python bench.py ;;
    bench_infer)   stage bench_infer 2400 env MDT_BENCH_MODE=infer MDT_BENCH_BATCH=6 python bench.py ;;
    # full train step + detect under the NEW defaults (zband stem OFF,
    # zblock7 auto): the missing A/B cell from the round-4 matrix
    ab_full_new)   stage ab_full_new 2400 python tools/ablate.py full detect ;;
    # fwd/bb split with the tensor-content mixer + 5 ms elision floor
    ab_fwd2)       stage ab_fwd2 2400 python tools/ablate.py fwd bb_fwd bb_bwd ;;
    ab_mrcnn)      stage ab_mrcnn 3600 env MDT_ABLATE_MODEL=mrcnn python tools/ablate.py full ;;
    ab_stage_loop) stage ab_stage_loop 2400 env MDT_STAGE_MODE=loop python tools/ablate.py full ;;
    # exec-harness factor decomposition (VERDICT r4 Weak 3) on the chip
    hprobe_toy)    stage hprobe_toy 2400 python tools/harness_probe.py --exp toy --model mrcnn --steps 6 --bs 20 --exp_dir /tmp/hprobe_toy ;;
    hprobe_lidc)   stage hprobe_lidc 3600 env MDT_GRAD_ACCUM=4 python tools/harness_probe.py --exp lidc --model retina_unet --steps 4 --bs 8 --exp_dir /tmp/hprobe_lidc ;;
    hprobe_mrcnn)  stage hprobe_mrcnn 4500 env MDT_GRAD_ACCUM=4 python tools/harness_probe.py --exp lidc --model mrcnn --steps 4 --bs 8 --exp_dir /tmp/hprobe_mrcnn ;;
    trace)         stage trace 1800 python tools/trace.py ;;
    # PET-CT on-chip smoke (VERDICT r4 Next 8): synthetic dual-modality data,
    # full exec drive (--dev), hold-out test path + WBC ensembling
    petct_smoke)
      python experiments/pet_ct_tnm_classification/preprocessing.py \
        --synthetic --out_dir /tmp/petct_synth --n_patients 8 > "$OUT/petct_gen.log" 2>&1
      stage petct_smoke 3600 env MDT_PETCT_PP=/tmp/petct_synth \
        python exec.py --mode train_test \
        --exp_source experiments/pet_ct_tnm_classification \
        --exp_dir /tmp/petct_smoke --folds 0 --dev ;;
    *)             # free-form: "name:timeout:cmd..." via env is overkill; run scripts/ad-hoc
                   echo "unknown stage: $s" ;;
  esac
done
echo "=== queue drained $(date -u +%H:%M:%S) ==="
