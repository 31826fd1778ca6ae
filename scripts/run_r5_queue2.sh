#!/usr/bin/env bash
# Round-5 queue v2 — priority-ordered remainder after the 49-view eval pace
# proved too slow.  New evals use a fixed 13-view subset (0,4,..,48); the two
# cells already evaluated at 49 views (stylemodnffb r4, fourierfeatures) get
# same-subset means recomputed from their committed per-view CSVs.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs_r5
CONFS=hashmodnffbanks_idr_tpu/config/confs
VIEWS="0 4 8 12 16 20 24 28 32 36 40 44 48"

run() {
  local name="$1" to="$2"; shift 2
  echo "=== $(date +%H:%M:%S) $name ==="
  timeout "$to" "$@" > "logs_r5/${name}.log" 2>&1 \
    && echo "OK  $name" || echo "FAIL $name (rc=$?)"
}

ev() {  # ev <conf> <expdir> <scan> [extra run_eval args...]
  local conf="$1" expdir="$2" scan="$3"; shift 3
  run "evalv2_${expdir}" 7000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
    --conf "$conf" --data_root data --resolution 300 --eval_rendering \
    --scan_id "$scan" --views $VIEWS "$@"
  local mesh
  mesh=$(ls -t "evals/${expdir}"/surface_world_coordinates_*.ply 2>/dev/null | head -1)
  [ -n "$mesh" ] && run "chamferv2_${expdir}" 2400 \
    python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
    --gt "data/dtu_shaped/scan${scan}/gt_mesh.ply" \
    --downsample_density 0.005 --log "evals/${expdir}/chamfer_log.txt"
}

tr1000() {  # tr1000 <confname> <scan>
  run "trainv2_$1_scan$2" 14000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
    --conf "$CONFS/$1.conf" --nepoch 1000 --data_root data --scan_id "$2"
}

# 0. wait for the in-flight posenc train (launched by queue v1)
while pgrep -f "exp_runner.*dtu_shaped_posenc" > /dev/null 2>&1; do sleep 60; done

ev "$CONFS/dtu_shaped_posenc.conf" dtu_shaped_posenc_0 0

tr1000 dtu_shaped_hashgridtcnn 0
ev "$CONFS/dtu_shaped_hashgridtcnn.conf" dtu_shaped_hashgridtcnn_0 0

tr1000 dtu_shaped_hashgrid 0
ev "$CONFS/dtu_shaped_hashgrid.conf" dtu_shaped_hashgrid_0 0

run gen_scan1 4000 python -m hashmodnffbanks_idr_tpu.data.dtu_shaped --out data --scan_id 1
tr1000 dtu_shaped_stylemodnffb 1
ev "$CONFS/dtu_shaped_stylemodnffb.conf" dtu_shaped_stylemodnffb_1 1

run trainv2_cams 16000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_stylemodnffb_trained_cameras.conf" --nepoch 1000 \
  --data_root data --train_cameras
ev "$CONFS/dtu_shaped_stylemodnffb_trained_cameras.conf" \
  dtu_shaped_stylemodnffb_trained_0 0 --eval_cameras

# full reference budget last (sacrificial if the round ends first: checkpoints
# land every 25 epochs and the eval below keys 'latest')
run trainv2_smn2000 28000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --nepoch 2000 --data_root data \
  --expname dtu_shaped_stylemodnffb2000
run evalv2_smn2000 7000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --expname dtu_shaped_stylemodnffb2000 \
  --data_root data --resolution 300 --eval_rendering --views $VIEWS
mesh=$(ls -t evals/dtu_shaped_stylemodnffb2000_0/surface_world_coordinates_*.ply 2>/dev/null | head -1)
[ -n "$mesh" ] && run chamferv2_smn2000 2400 \
  python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
  --gt data/dtu_shaped/scan0/gt_mesh.ply --downsample_density 0.005 \
  --log evals/dtu_shaped_stylemodnffb2000_0/chamfer_log.txt

echo "QUEUE2 DONE $(date +%H:%M:%S)"
