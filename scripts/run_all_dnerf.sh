#!/usr/bin/env bash
# Train + test every D-NeRF scene (reference: scripts/run_all_dnerf.sh).
# TPU-native: one process per chip slice. With a single chip (the default),
# scenes run sequentially; set WORKERS="0 1 2 3" to fan out one scene per
# TPU_VISIBLE_DEVICES slice on a multi-chip host.
set -e
ROOT=$(cd "$(dirname "$0")"/..; pwd)
cd "$ROOT"
scenes=(${SCENES:-hellwarrior hook jumpingjacks mutant standup trex})
cfg=${CFG:-configs/d_nerf_400.yaml}
workers=(${WORKERS:-"-"})   # "-" = current default device
args=("$@")

run_scene() {
  local scene=$1 dev=$2
  local env=()
  [[ "$dev" != "-" ]] && env=(env TPU_VISIBLE_DEVICES="$dev")
  echo "== scene $scene (device ${dev}) =="
  "${env[@]}" python train.py -c "$cfg" --set dataset.scene="$scene" \
      --set exp_name="DNeRF_400/$scene" "${args[@]}"
  "${env[@]}" python test.py -c "$cfg" --set dataset.scene="$scene" \
      --set exp_name="DNeRF_400/$scene" \
      --load "results/DNeRF_400/$scene/checkpoints/best.npz"
}

n=${#workers[@]}
pids=()
for i in "${!scenes[@]}"; do
  dev=${workers[$((i % n))]}
  if [[ $n -gt 1 ]]; then
    run_scene "${scenes[$i]}" "$dev" &
    pids+=($!)
    (( (i + 1) % n == 0 )) && wait "${pids[@]}" && pids=()
  else
    run_scene "${scenes[$i]}" "$dev"
  fi
done
[[ ${#pids[@]} -gt 0 ]] && wait "${pids[@]}"
python scripts/show_results.py results/DNeRF_400
