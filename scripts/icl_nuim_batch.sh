#!/usr/bin/env bash
# ICL-NUIM batch — mirrors /root/reference/test/icl-nuim_batch.sh:
# living-room L0-L3 and office O0-O3 with the ideal pinhole calibration.
#
#   DATASET_PATH=/data/icl-nuim [RUNS=1] ./scripts/icl_nuim_batch.sh
set -u
DATASET_PATH="${DATASET_PATH:?set DATASET_PATH to the ICL-NUIM root}"
RUNS="${RUNS:-1}"
HERE="$(cd "$(dirname "$0")" && pwd)"
CALIB="$HERE/../data/cameras/icl-nuim.txt"
TIMES="${TIMES_DIR:-$HERE/../data/timestamps}"

for name in L0 L1 L2 L3 O0 O1 O2 O3; do
  targs=""
  [ -f "$TIMES/$name.txt" ] && targs="times=$TIMES/$name.txt"
  for i in $(seq 0 $((RUNS-1))); do
    python "$HERE/run_dataset.py" image="$DATASET_PATH/$name/rgb" \
        calib="$CALIB" $targs name="${name}_$i"
  done
done
