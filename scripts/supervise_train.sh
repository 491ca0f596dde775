#!/bin/bash
# Supervise a long training run over the flaky TPU tunnel: (re)launch
# train.py, resuming from the newest checkpoint after each worker crash.
# Usage: scripts/supervise_train.sh <config.yaml> <out_dir> [max_restarts]
set -u
CFG="$1"
OUT="$2"
MAX_RESTARTS="${3:-40}"
LOG="${SUPERVISE_LOG:-/tmp/supervise_train.log}"

for i in $(seq 0 "$MAX_RESTARTS"); do
    CKPT=$(ls -v "$OUT"/checkpoints/checkpoint_*.npz 2>/dev/null | tail -1)
    RESUME=()
    if [ -n "${CKPT:-}" ]; then
        RESUME=(--resume "$CKPT")
    fi
    echo "[supervise] attempt $i: python train.py -c $CFG ${RESUME[*]:-}" | tee -a "$LOG"
    python train.py -c "$CFG" "${RESUME[@]}" >> "$LOG" 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then
        echo "[supervise] run completed (rc=0)" | tee -a "$LOG"
        exit 0
    fi
    echo "[supervise] run died rc=$rc; sleeping 60s before resume" | tee -a "$LOG"
    sleep 60
done
echo "[supervise] gave up after $MAX_RESTARTS restarts" | tee -a "$LOG"
exit 1
