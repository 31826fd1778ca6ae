#!/usr/bin/env bash
# Sweep Chamfer evaluation over scans x experiment names — parity with the
# reference's dtu_eval/batch_eval_{stl,surfaces}.sh.
#
# usage: batch_eval_surfaces.sh <evals_dir> <dtu_gt_dir> [scans] [expnames]
set -u
EVALS=${1:-evals}
GT_DIR=${2:-data/DTU_points}
SCANS=${3:-"122 110 114 65"}
EXPNAMES=${4:-"Posenc HashGrid NFFB StylemodNFFB HashGridTCNN StylemodNFFB_TCNN FourierNTK"}

for scan in $SCANS; do
  for exp in $EXPNAMES; do
    dir="$EVALS/dtu_fixed_cameras${exp}_${scan}"
    mesh=$(ls -t "$dir"/surface_world_coordinates_*.ply 2>/dev/null | head -1)
    [ -z "$mesh" ] && { echo "skip $dir (no mesh)"; continue; }
    gt="$GT_DIR/stl$(printf '%03d' "$scan")_total.ply"
    [ -f "$gt" ] || { echo "skip scan $scan (no GT $gt)"; continue; }
    echo "== $exp scan $scan"
    python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer \
      --data "$mesh" --gt "$gt" --scan "$scan" \
      --dataset_dir "$GT_DIR" --log "$dir/chamfer_log.jsonl"
  done
done
