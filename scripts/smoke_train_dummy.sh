#!/usr/bin/env bash
# End-to-end smoke: generate the dummy cube scene, train, evaluate.
# CPU: ~minutes with the small conf; TPU: full-size conf.
set -eu
cd "$(dirname "$0")/.."

DATA_ROOT=${DATA_ROOT:-data}
EPOCHS=${EPOCHS:-150}
CONF=${CONF:-hashmodnffbanks_idr_tpu/config/confs/dummy.conf}

[ -d "$DATA_ROOT/dummy/scan0/image" ] || \
  python -m hashmodnffbanks_idr_tpu.data.dummy_cli --out "$DATA_ROOT/dummy/scan0"

HMNFFB_DATA_ROOT=$DATA_ROOT python -m hashmodnffbanks_idr_tpu.train.exp_runner \
  --conf "$CONF" --nepoch "$EPOCHS" --data_root "$DATA_ROOT" "$@"

HMNFFB_DATA_ROOT=$DATA_ROOT python -m hashmodnffbanks_idr_tpu.eval.run_eval \
  --conf "$CONF" --data_root "$DATA_ROOT" --resolution 100 --eval_rendering
