#!/usr/bin/env bash
# Ablation fleet (reference: scripts/run_ablation_study.sh): every yaml in
# configs/ablations/$ABLATION_CASE runs on every scene. Ablation configs
# inherit the base config and flip one knob (see configs/ablations/).
set -e
ROOT=$(cd "$(dirname "$0")"/..; pwd)
cd "$ROOT"
case=${ABLATION_CASE:?set ABLATION_CASE (a dir under configs/ablations/)}
scenes=(${SCENES:-hellwarrior hook jumpingjacks mutant standup trex})
echo "configs in $case:"; ls "configs/ablations/$case"
for scene in "${scenes[@]}"; do
  for exp in configs/ablations/"$case"/*.yaml; do
    name=$(basename "$exp" .yaml)
    out="results/ablations/$case/$scene/$name"
    if [[ -e "$out/checkpoints/last.npz" ]]; then
      echo "skip $out (done)"; continue
    fi
    python train.py -c "$exp" --set dataset.scene="$scene" \
        --set exp_name="ablations/$case/$scene/$name" "$@"
  done
done
python scripts/show_results.py "results/ablations/$case"
