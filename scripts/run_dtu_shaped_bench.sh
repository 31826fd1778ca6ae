#!/usr/bin/env bash
# DTU-shaped quality benchmark (VERDICT round-1 item 7): train three encoder
# families to convergence on the 49-view 1200x1600 synthetic scene and run
# the full eval stack on each. Sequential — one TPU chip.
set -u
cd "$(dirname "$0")/.."

EPOCHS="${EPOCHS:-1000}"
CONFS="${CONFS:-dtu_shaped_stylemodnffb dtu_shaped_hashgrid dtu_shaped_fourierfeatures}"

for name in $CONFS; do
  conf="hashmodnffbanks_idr_tpu/config/confs/${name}.conf"
  echo "=== training ${name} (${EPOCHS} epochs) ==="
  timeout 14000 python -m hashmodnffbanks_idr_tpu.train.exp_runner \
    --conf "$conf" --nepoch "$EPOCHS" --data_root data || echo "TRAIN FAIL ${name}"
  echo "=== eval ${name} ==="
  timeout 7000 python -m hashmodnffbanks_idr_tpu.eval.run_eval \
    --conf "$conf" --data_root data --resolution 300 --eval_rendering \
    || echo "EVAL FAIL ${name}"
  echo "=== chamfer ${name} ==="
  mesh=$(ls -t "evals/${name}_0"/surface_world_coordinates_*.ply | head -1)
  JAX_PLATFORMS=cpu timeout 3000 python -m hashmodnffbanks_idr_tpu.eval.dtu_chamfer \
    --data "$mesh" --gt data/dtu_shaped/scan0/gt_mesh.ply \
    --downsample_density 0.005 --log "evals/${name}_0/chamfer_log.txt" \
    || echo "CHAMFER FAIL ${name}"
done
echo "ALL DONE"
