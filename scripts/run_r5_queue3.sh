#!/usr/bin/env bash
# Round-5 queue v3 — restarted session: the driver wiped untracked exps/ and
# data/, so every uncommitted checkpoint is gone.  Priority-ordered re-run of
# the remaining VERDICT r4 items (matrix cells > trainable cams > tcnn cell >
# 2000-epoch tail, which is sacrificial — checkpoints land every 25 epochs).
# Evals use the fixed 13-view subset (0,4,..,48) like queue v2.
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
  run "evalv3_${expdir}" 7000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
    --conf "$conf" --data_root data --resolution 300 --eval_rendering \
    --scan_id "$scan" --views $VIEWS "$@"
  local mesh
  mesh=$(ls -t "evals/${expdir}"/surface_world_coordinates_*.ply 2>/dev/null | head -1)
  [ -n "$mesh" ] && run "chamferv3_${expdir}" 2400 \
    python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
    --gt "data/dtu_shaped/scan${scan}/gt_mesh.ply" \
    --downsample_density 0.005 --log "evals/${expdir}/chamfer_log.txt"
}

tr1000() {  # tr1000 <confname> <scan> [extra args...]
  local name="$1" scan="$2"; shift 2
  run "trainv3_${name}_scan${scan}" 14000 \
    python -m hashmodnffbanks_idr_tpu.train.exp_runner \
    --conf "$CONFS/${name}.conf" --nepoch 1000 --data_root data \
    --scan_id "$scan" "$@"
}

# scene regeneration (lost with data/)
run gen_scan0 4000 python -m hashmodnffbanks_idr_tpu.data.dtu_shaped --out data --scan_id 0
run gen_scan1 4000 python -m hashmodnffbanks_idr_tpu.data.dtu_shaped --out data --scan_id 1

# matrix cells lost to the wipe (hashgrid previously NaN'd — retrained with
# the clamped-secant fix; posenc trained but its checkpoint was wiped)
tr1000 dtu_shaped_hashgrid 0
ev "$CONFS/dtu_shaped_hashgrid.conf" dtu_shaped_hashgrid_0 0
tr1000 dtu_shaped_posenc 0
ev "$CONFS/dtu_shaped_posenc.conf" dtu_shaped_posenc_0 0

# scene diversity: flagship on scan1
tr1000 dtu_shaped_stylemodnffb 1
ev "$CONFS/dtu_shaped_stylemodnffb.conf" dtu_shaped_stylemodnffb_1 1

# trainable cameras at reference view count (49)
run trainv3_cams 16000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_stylemodnffb_trained_cameras.conf" --nepoch 1000 \
  --data_root data --train_cameras
ev "$CONFS/dtu_shaped_stylemodnffb_trained_cameras.conf" \
  dtu_shaped_stylemodnffb_trained_0 0 --eval_cameras

# large-table preset cell
tr1000 dtu_shaped_hashgridtcnn 0
ev "$CONFS/dtu_shaped_hashgridtcnn.conf" dtu_shaped_hashgridtcnn_0 0

# full reference budget last (sacrificial)
run trainv3_smn2000 28000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --nepoch 2000 --data_root data \
  --expname dtu_shaped_stylemodnffb2000
run evalv3_smn2000 7000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
  --conf "$CONFS/dtu_shaped_stylemodnffb.conf" --expname dtu_shaped_stylemodnffb2000 \
  --data_root data --resolution 300 --eval_rendering --views $VIEWS
mesh=$(ls -t evals/dtu_shaped_stylemodnffb2000_0/surface_world_coordinates_*.ply 2>/dev/null | head -1)
[ -n "$mesh" ] && run chamferv3_smn2000 2400 \
  python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer --data "$mesh" \
  --gt data/dtu_shaped/scan0/gt_mesh.ply --downsample_density 0.005 \
  --log evals/dtu_shaped_stylemodnffb2000_0/chamfer_log.txt

echo "QUEUE3 DONE $(date +%H:%M:%S)"
