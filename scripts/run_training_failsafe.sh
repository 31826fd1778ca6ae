#!/usr/bin/env bash
# Crash/OOM-resilient training wrapper — parity with the reference's
# code/scripts/run_training_failsafe.sh:1-125: map an experiment name to its
# conf, cap memory, and restart with --is_continue from the latest checkpoint
# on any nonzero exit, forever (or until --max_retries).
set -u

usage() {
  echo "usage: $0 <EXPNAME> <SCAN_ID> [extra exp_runner args...]"
  echo "  EXPNAME in: Posenc HashGrid NFFB StylemodNFFB HashGridTCNN StylemodNFFB_TCNN FourierNTK CUDAHashGrid"
  exit 1
}

[ $# -lt 2 ] && usage
EXPNAME=$1; shift
SCAN_ID=$1; shift

CONF_ROOT="$(dirname "$0")/../hashmodnffbanks_idr_tpu/config/confs/embedder_conf_var"
case "$EXPNAME" in
  Posenc)            CONF="$CONF_ROOT/PosEnc/dtu_fixed_cameras.conf" ;;
  HashGrid)          CONF="$CONF_ROOT/MultiResHashPointsAndViewDirs/dtu_fixed_cameras.conf" ;;
  NFFB)              CONF="$CONF_ROOT/FFB/dtu_fixed_cameras.conf" ;;
  StylemodNFFB)      CONF="$CONF_ROOT/FFB_StyleMod/dtu_fixed_cameras.conf" ;;
  HashGridTCNN)      CONF="$CONF_ROOT/HashGrid_TCNN_PointsAndViewDirs/dtu_fixed_cameras.conf" ;;
  StylemodNFFB_TCNN) CONF="$CONF_ROOT/FFB_TCNN/dtu_fixed_cameras.conf" ;;
  FourierNTK)        CONF="$CONF_ROOT/FourierFeatures/dtu_fixed_cameras.conf" ;;
  CUDAHashGrid)      CONF="$CONF_ROOT/CUDA_HashGrid/dtu_fixed_cameras.conf" ;;
  *) usage ;;
esac

# memory cap at ~90% of RAM (reference: ulimit -v, scripts/run_training_failsafe.sh:4-6)
TOTAL_KB=$(awk '/MemTotal/ {print $2}' /proc/meminfo 2>/dev/null || echo 0)
if [ "$TOTAL_KB" -gt 0 ]; then
  ulimit -v $((TOTAL_KB * 90 / 100)) 2>/dev/null || true
fi

MAX_RETRIES=${MAX_RETRIES:-0}   # 0 = infinite
attempt=0
CONTINUE_FLAG=""
while :; do
  python -m hashmodnffbanks_idr_tpu.train.exp_runner \
    --conf "$CONF" --expname "$EXPNAME" --scan_id "$SCAN_ID" $CONTINUE_FLAG "$@"
  rc=$?
  [ $rc -eq 0 ] && { echo "training finished cleanly"; exit 0; }
  attempt=$((attempt + 1))
  echo "training exited rc=$rc — restarting from latest checkpoint (attempt $attempt)"
  CONTINUE_FLAG="--is_continue"
  if [ "$MAX_RETRIES" -gt 0 ] && [ $attempt -ge "$MAX_RETRIES" ]; then
    echo "giving up after $attempt attempts"; exit $rc
  fi
  sleep 5
done
