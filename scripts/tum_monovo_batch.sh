#!/usr/bin/env bash
# TUM MonoVO batch — mirrors /root/reference/test/tum_monoVO_batch.sh:
# 50 auto-exposure sequences, FOV/ATAN camera (narrow sequences 1-13/21-50,
# wide 14-20; wide pre-undistorts whole images). Online photometric
# calibration is ON (photo=1) — these sequences need it.
#
#   DATASET_PATH=/data/tum_mono_vo [RUNS=1] ./scripts/tum_monovo_batch.sh
set -u
DATASET_PATH="${DATASET_PATH:?set DATASET_PATH to the TUM MonoVO root}"
RUNS="${RUNS:-1}"
HERE="$(cd "$(dirname "$0")" && pwd)"

for n in $(seq 1 50); do
  seq=$(printf "sequence_%02d" "$n")
  calib="$HERE/../data/cameras/tum_mono_vo_narrow.txt"
  if [ "$n" -ge 14 ] && [ "$n" -le 20 ]; then
    calib="$HERE/../data/cameras/tum_mono_vo_wide.txt"
  fi
  # prefer the sequence's own shipped calibration when present
  [ -f "$DATASET_PATH/$seq/camera.txt" ] && calib="$DATASET_PATH/$seq/camera.txt"
  for i in $(seq 0 $((RUNS-1))); do
    python "$HERE/run_dataset.py" image="$DATASET_PATH/$seq/images" \
        calib="$calib" times="$DATASET_PATH/$seq/times.txt" \
        name="$(printf "seq%02d_%d" "$n" "$i")" photo=1
  done
done
