#!/usr/bin/env bash
# Round-5 TPU job queue (single chip, sequential).  VERDICT r4 items:
#   A. tracer-precision A/B (item 4)           — 4 anchor runs + f32 step time
#   B. encoder quality matrix on scan0 (item 1) — eval hashgrid, train+eval
#      fourierfeatures / posenc / hashgridtcnn
#   C. scene diversity (item 1)                 — generate scan1/scan2, flagship on each
#   D. 2000-epoch flagship (item 8), trainable cameras at 49 views (item 3)
# Each job logs to logs_r5/<job>.log and failures never stop the queue.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs_r5

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== $(date +%H:%M:%S) $name ==="
  timeout "$to" "$@" > "logs_r5/${name}.log" 2>&1 \
    && echo "OK  $name" || echo "FAIL $name (rc=$?)"
}

CONFS=hashmodnffbanks_idr_tpu/config/confs
SMALL_GT=data/dtu_shaped_small/scan0/gt_mesh.ply

anchor() {  # anchor <conf> <expname> <seed>
  local conf="$1" exp="$2" seed="$3"
  run "train_${exp}" 2400 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
    --conf "$conf" --nepoch 400 --data_root data --seed "$seed" --expname "$exp"
  run "eval_${exp}" 2400 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
    --conf "$conf" --expname "$exp" --data_root data --resolution 200 --eval_rendering
  local mesh
  mesh=$(ls -t "evals/${exp}_0"/surface_world_coordinates_*.ply 2>/dev/null | head -1)
  [ -n "$mesh" ] && run "chamfer_${exp}" 1200 env JAX_PLATFORMS=cpu \
    python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
    --gt "$SMALL_GT" --downsample_density 0.005 --log "evals/${exp}_0/chamfer_log.txt"
}

# --------------------------- Phase A: tracer A/B ---------------------------
anchor "$CONFS/headtohead_ours_400.conf"     headtohead_ours400_mixed_s1 1
anchor "$CONFS/headtohead_ours_400.conf"     headtohead_ours400_mixed_s2 2
anchor "$CONFS/headtohead_ours_400_f32.conf" headtohead_ours400_f32_s1   1
anchor "$CONFS/headtohead_ours_400_f32.conf" headtohead_ours400_f32_s2   2
run f32_flagship_steptime 1200 python scripts/step_breakdown.py \
  --embed_type StyleModNFFB --tracer exact --reps 20 --json /tmp/sb_flag_f32.json

# ----------------- Phase B: encoder matrix on dtu_shaped scan0 -------------
dtu_eval() {  # dtu_eval <conf> <expdir> <scan>
  local conf="$1" expdir="$2" scan="${3:-0}"
  run "eval_${expdir}" 10000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
    --conf "$conf" --data_root data --resolution 300 --eval_rendering --scan_id "$scan"
  local mesh
  mesh=$(ls -t "evals/${expdir}"/surface_world_coordinates_*.ply 2>/dev/null | head -1)
  [ -n "$mesh" ] && run "chamfer_${expdir}" 2400 env JAX_PLATFORMS=cpu \
    python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
    --gt "data/dtu_shaped/scan${scan}/gt_mesh.ply" \
    --downsample_density 0.005 --log "evals/${expdir}/chamfer_log.txt"
}

dtu_train() {  # dtu_train <conf> <scan> [extra args...]
  local conf="$1" scan="$2"; shift 2
  run "train_$(basename "$conf" .conf)_scan${scan}" 14000 \
    python -m hashmodnffbanks_idr_tpu.train.exp_runner \
    --conf "$conf" --nepoch 1000 --data_root data --scan_id "$scan" "$@"
}

dtu_eval  "$CONFS/dtu_shaped_hashgrid.conf"        dtu_shaped_hashgrid_0
dtu_train "$CONFS/dtu_shaped_fourierfeatures.conf" 0
dtu_eval  "$CONFS/dtu_shaped_fourierfeatures.conf" dtu_shaped_fourierfeatures_0
dtu_train "$CONFS/dtu_shaped_posenc.conf"          0
dtu_eval  "$CONFS/dtu_shaped_posenc.conf"          dtu_shaped_posenc_0
dtu_train "$CONFS/dtu_shaped_hashgridtcnn.conf"    0
dtu_eval  "$CONFS/dtu_shaped_hashgridtcnn.conf"    dtu_shaped_hashgridtcnn_0

# --------------------- Phase C: scene diversity (scan1/2) ------------------
run gen_scan1 4000 python -m hashmodnffbanks_idr_tpu.data.dtu_shaped --out data --scan_id 1
run gen_scan2 4000 python -m hashmodnffbanks_idr_tpu.data.dtu_shaped --out data --scan_id 2
dtu_train "$CONFS/dtu_shaped_stylemodnffb.conf" 1
dtu_eval  "$CONFS/dtu_shaped_stylemodnffb.conf" dtu_shaped_stylemodnffb_1 1
dtu_train "$CONFS/dtu_shaped_stylemodnffb.conf" 2
dtu_eval  "$CONFS/dtu_shaped_stylemodnffb.conf" dtu_shaped_stylemodnffb_2 2

# ------------- Phase D: full budget + trainable cameras (49 views) ---------
run train_smn2000 28000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --nepoch 2000 --data_root data \
  --expname dtu_shaped_stylemodnffb2000
run eval_smn2000 10000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --expname dtu_shaped_stylemodnffb2000 \
  --data_root data --resolution 300 --eval_rendering
mesh=$(ls -t evals/dtu_shaped_stylemodnffb2000_0/surface_world_coordinates_*.ply 2>/dev/null | head -1)
[ -n "$mesh" ] && run chamfer_smn2000 2400 env JAX_PLATFORMS=cpu \
  python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
  --gt data/dtu_shaped/scan0/gt_mesh.ply --downsample_density 0.005 \
  --log evals/dtu_shaped_stylemodnffb2000_0/chamfer_log.txt

run train_smn_cams 16000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_stylemodnffb_trained_cameras.conf" --nepoch 1000 \
  --data_root data --train_cameras
run eval_smn_cams 10000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
  --conf "$CONFS/dtu_shaped_stylemodnffb_trained_cameras.conf" --data_root data \
  --resolution 300 --eval_rendering --eval_cameras
mesh=$(ls -t evals/dtu_shaped_stylemodnffb_trained_0/surface_world_coordinates_*.ply 2>/dev/null | head -1)
[ -n "$mesh" ] && run chamfer_smn_cams 2400 env JAX_PLATFORMS=cpu \
  python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
  --gt data/dtu_shaped/scan0/gt_mesh.ply --downsample_density 0.005 \
  --log evals/dtu_shaped_stylemodnffb_trained_0/chamfer_log.txt

echo "QUEUE DONE $(date +%H:%M:%S)"
