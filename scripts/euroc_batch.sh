#!/usr/bin/env bash
# EuRoC batch evaluation — mirrors the reference protocol
# (/root/reference/test/euroc_batch.sh): per-sequence start/end frame skips,
# N repeated runs per sequence (the paper methodology is 10).
#
#   DATASET_PATH=/data/euroc [RUNS=1] ./scripts/euroc_batch.sh
#
# Expects <DATASET_PATH>/<sequence>/cam0/data (or mav0/cam0/data).
set -u
DATASET_PATH="${DATASET_PATH:?set DATASET_PATH to the EuRoC root}"
RUNS="${RUNS:-1}"
HERE="$(cd "$(dirname "$0")" && pwd)"
CALIB="$HERE/../data/cameras/euroc.txt"
# timestamp files (per-sequence, reference test/timestamp format) are
# optional: point TIMES_DIR at a directory holding <SEQ>.txt files
TIMES="${TIMES_DIR:-$HERE/../data/timestamps}"

run_seq() {  # name seq_dir extra_args...
  local name="$1" seq="$2"; shift 2
  local img="$DATASET_PATH/$seq/cam0/data"
  [ -d "$img" ] || img="$DATASET_PATH/$seq/mav0/cam0/data"
  local targs=""
  [ -f "$TIMES/$name.txt" ] && targs="times=$TIMES/$name.txt"
  for i in $(seq 0 $((RUNS-1))); do
    python "$HERE/run_dataset.py" image="$img" calib="$CALIB" \
        $targs name="${name}_$i" "$@"
  done
}

run_seq MH01 MH_01_easy        start=50
run_seq MH02 MH_02_easy
run_seq MH03 MH_03_medium
run_seq MH04 MH_04_difficult   start=450 end=1925
run_seq MH05 MH_05_difficult   start=450 end=2200
run_seq V101 V1_01_easy
run_seq V102 V1_02_medium      start=120
run_seq V103 V1_03_difficult   start=200
run_seq V201 V2_01_easy
run_seq V202 V2_02_medium
run_seq V203 V2_03_difficult
