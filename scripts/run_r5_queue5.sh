#!/usr/bin/env bash
# Round-5 queue v5 — final-stretch replan: wall clock cannot fit the full
# queue-4 tail, so: posenc chamfer, f32 fused-tracer validation, the
# hashgrid scan0 cell (full 1000 epochs, trimmed eval), and a 400-epoch
# anchor-budget StyleModNFFB cell on scan1 for scene diversity.  Trainable
# cameras at 49 views is dropped this session (documented in RESULTS.md).
# $1 = pid of the in-flight posenc run_eval to wait for.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs_r5
CONFS=hashmodnffbanks_idr_tpu/config/confs
WAIT_PID="${1:-}"

run() {
  local name="$1" to="$2"; shift 2
  echo "=== $(date +%H:%M:%S) $name ==="
  timeout "$to" "$@" > "logs_r5/${name}.log" 2>&1 \
    && echo "OK  $name" || echo "FAIL $name (rc=$?)"
}

cham() {  # cham <expdir> <scan>
  local mesh
  mesh=$(ls -t "evals/$1"/surface_world_coordinates_*.ply 2>/dev/null | head -1)
  [ -n "$mesh" ] && run "chamferv5_$1" 2400 \
    python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
    --gt "data/dtu_shaped/scan$2/gt_mesh.ply" \
    --downsample_density 0.005 --log "evals/$1/chamfer_log.txt"
}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
fi

cham dtu_shaped_posenc_0 0

run f32_fused_validate 1500 env HMNFFB_EXACT_FUSED=1 \
  python scripts/step_breakdown.py --embed_type StyleModNFFB --tracer exact \
  --reps 20 --json STEP_BREAKDOWN_r05_flagship_fused.json

run trainv5_hashgrid_scan0 14000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_hashgrid.conf" --nepoch 1000 --data_root data --scan_id 0
run evalv5_dtu_shaped_hashgrid_0 7000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
  --conf "$CONFS/dtu_shaped_hashgrid.conf" --data_root data --resolution 250 \
  --eval_rendering --scan_id 0 --views 0 8 16 24 32 40 48
cham dtu_shaped_hashgrid_0 0

# scene diversity at the shared 400-epoch anchor budget
run trainv5_smn_scan1 8000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --nepoch 400 --data_root data --scan_id 1
run evalv5_dtu_shaped_stylemodnffb_1 7000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --data_root data --resolution 250 \
  --eval_rendering --scan_id 1 --views 0 16 32 48
cham dtu_shaped_stylemodnffb_1 1

echo "QUEUE5 DONE $(date +%H:%M:%S)"
