#!/bin/bash
# Supervise a long training run over the flaky TPU tunnel: (re)launch
# train.py, resuming from the newest checkpoint after each worker crash,
# and kill+resume the run if it HANGS (no log write for STALL_S seconds —
# the tunnel sometimes wedges a device call forever instead of erroring).
# Usage: scripts/supervise_train.sh <config.yaml> <out_dir> [max_restarts]
set -u
CFG="$1"
OUT="$2"
MAX_RESTARTS="${3:-40}"
LOG="${SUPERVISE_LOG:-/tmp/supervise_train.log}"
STALL_S="${STALL_S:-420}"
# first step after a resume can sit in XLA compile for many minutes
# (remote-compile through the tunnel has been observed north of 40 min)
COMPILE_GRACE_S="${COMPILE_GRACE_S:-3600}"

for i in $(seq 0 "$MAX_RESTARTS"); do
    CKPT=$(ls -v "$OUT"/checkpoints/checkpoint_*.npz 2>/dev/null | tail -1)
    RESUME=()
    if [ -n "${CKPT:-}" ]; then
        RESUME=(--resume "$CKPT")
    fi
    echo "[supervise] attempt $i: python train.py -c $CFG ${RESUME[*]:-}" | tee -a "$LOG"
    python train.py -c "$CFG" "${RESUME[@]}" >> "$LOG" 2>&1 &
    PID=$!
    START=$(date +%s)
    while kill -0 "$PID" 2>/dev/null; do
        sleep 30
        NOW=$(date +%s)
        LAST=$(stat -c %Y "$LOG" 2>/dev/null || echo "$NOW")
        AGE=$((NOW - LAST))
        # during the compile window allow longer silence
        LIMIT=$STALL_S
        if [ $((NOW - START)) -lt "$COMPILE_GRACE_S" ]; then
            LIMIT=$COMPILE_GRACE_S
        fi
        if [ "$AGE" -gt "$LIMIT" ]; then
            echo "[supervise] stalled ${AGE}s (limit ${LIMIT}s); killing $PID" | tee -a "$LOG"
            kill "$PID" 2>/dev/null
            sleep 5
            kill -9 "$PID" 2>/dev/null
            break
        fi
    done
    wait "$PID"
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
