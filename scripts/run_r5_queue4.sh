#!/usr/bin/env bash
# Round-5 queue v4 — reprioritized remainder after a stray TPU probe killed
# the queue-3 hashgrid training (the axon tunnel is single-client: a second
# process touching the chip FAILED_PRECONDITIONs the first).  Waits for the
# in-flight posenc train (pid passed as $1), then: posenc eval, the f32
# fused-exact-tracer validation (3 min), the lost hashgrid cell, flagship on
# scan1, trainable cameras at 49 views; tcnn + 2000-epoch tail is sacrificial.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs_r5
CONFS=hashmodnffbanks_idr_tpu/config/confs
VIEWS="0 4 8 12 16 20 24 28 32 36 40 44 48"
WAIT_PID="${1:-}"

run() {
  local name="$1" to="$2"; shift 2
  echo "=== $(date +%H:%M:%S) $name ==="
  timeout "$to" "$@" > "logs_r5/${name}.log" 2>&1 \
    && echo "OK  $name" || echo "FAIL $name (rc=$?)"
}

ev() {  # ev <conf> <expdir> <scan> [extra run_eval args...]
  local conf="$1" expdir="$2" scan="$3"; shift 3
  run "evalv4_${expdir}" 7000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
    --conf "$conf" --data_root data --resolution 300 --eval_rendering \
    --scan_id "$scan" --views $VIEWS "$@"
  local mesh
  mesh=$(ls -t "evals/${expdir}"/surface_world_coordinates_*.ply 2>/dev/null | head -1)
  [ -n "$mesh" ] && run "chamferv4_${expdir}" 2400 \
    python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
    --gt "data/dtu_shaped/scan${scan}/gt_mesh.ply" \
    --downsample_density 0.005 --log "evals/${expdir}/chamfer_log.txt"
}

tr1000() {
  local name="$1" scan="$2"; shift 2
  run "trainv4_${name}_scan${scan}" 14000 \
    python -m hashmodnffbanks_idr_tpu.train.exp_runner \
    --conf "$CONFS/${name}.conf" --nepoch 1000 --data_root data \
    --scan_id "$scan" "$@"
}

# 0. wait for the in-flight posenc train to release the chip
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

ev "$CONFS/dtu_shaped_posenc.conf" dtu_shaped_posenc_0 0

# f32 fused-exact tracer: hardware validation (flagship step breakdown with
# the kernel on vs off; gate for flipping tracer_exact_fused default)
run f32_fused_validate 1500 env HMNFFB_EXACT_FUSED=1 \
  python scripts/step_breakdown.py --embed_type StyleModNFFB --tracer exact \
  --reps 20 --json STEP_BREAKDOWN_r05_flagship_fused.json

# the matrix cell lost to the tunnel crash
tr1000 dtu_shaped_hashgrid 0
ev "$CONFS/dtu_shaped_hashgrid.conf" dtu_shaped_hashgrid_0 0

# scene diversity: flagship on scan1
tr1000 dtu_shaped_stylemodnffb 1
ev "$CONFS/dtu_shaped_stylemodnffb.conf" dtu_shaped_stylemodnffb_1 1

# trainable cameras at 49 views
run trainv4_cams 16000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_stylemodnffb_trained_cameras.conf" --nepoch 1000 \
  --data_root data --train_cameras
ev "$CONFS/dtu_shaped_stylemodnffb_trained_cameras.conf" \
  dtu_shaped_stylemodnffb_trained_0 0 --eval_cameras

# sacrificial tail
tr1000 dtu_shaped_hashgridtcnn 0
ev "$CONFS/dtu_shaped_hashgridtcnn.conf" dtu_shaped_hashgridtcnn_0 0

run trainv4_smn2000 28000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --nepoch 2000 --data_root data \
  --expname dtu_shaped_stylemodnffb2000
run evalv4_smn2000 7000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --expname dtu_shaped_stylemodnffb2000 \
  --data_root data --resolution 300 --eval_rendering --views $VIEWS
mesh=$(ls -t evals/dtu_shaped_stylemodnffb2000_0/surface_world_coordinates_*.ply 2>/dev/null | head -1)
[ -n "$mesh" ] && run chamferv4_smn2000 2400 \
  python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
  --gt data/dtu_shaped/scan0/gt_mesh.ply --downsample_density 0.005 \
  --log evals/dtu_shaped_stylemodnffb2000_0/chamfer_log.txt

echo "QUEUE4 DONE $(date +%H:%M:%S)"
