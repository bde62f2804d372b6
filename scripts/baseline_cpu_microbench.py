"""Build + run the reference-workload CPU microbench and derive the
measured baseline anchor (BASELINE_CPU.json) that bench.py's
``vs_baseline`` divides by.

Derivation (see native/baseline_microbench.cpp for the workload model and
its file:line citations into /root/reference):

  * The reference prints TRACKING-THREAD fps (frame_handler_base.cpp:
    121-127); its per-frame tracking work is pyramid construction, the
    coarse photometric aligner (4 levels x <=50 LM iterations with early
    stop), reprojection matching (~1.5x maxFts align attempts), the
    per-frame undistortion remap (test_dataset.cpp:276 — EuRoC is
    Pinhole+radtan), the motion-only pose LM (12 iterations,
    pose_optimizer.cpp:399-771), and — at keyframes, ON the tracking
    thread — LocalBundleAdjustment (frame_handler_mono.cpp:314-327),
    amortized at the keyframe interval.  The microbench measures those
    loops, in the reference's arithmetic (double-precision Jacobians,
    per-term buffer push_back), on this machine's CPU.
  * Everything else the reference spends time on per frame — feature
    management over pointer graphs, covisibility upkeep, locks shared
    with the mapping thread, allocation churn, g2o graph construction —
    is EXCLUDED, so the measured fps is an UPPER bound on the real
    reference and the derived speedup is a LOWER bound.
  * The unknowable-without-running-it quantity is the early-stop iteration
    count of the LM loops; the bench brackets it with a typical-converged
    point (10 iters/level) and the configured max (50), and anchors on the
    geometric mean of the two tracking-thread fps numbers.

Writes BASELINE_CPU.json and prints it.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "native", "baseline_microbench.cpp")
BIN = os.path.join(ROOT, "native", "build", "baseline_microbench")
OUT = os.path.join(ROOT, "BASELINE_CPU.json")


def main() -> None:
    os.makedirs(os.path.dirname(BIN), exist_ok=True)
    subprocess.run(
        ["g++", "-O3", "-march=native", "-o", BIN, SRC], check=True)
    runs = []
    for _ in range(3):
        out = subprocess.run([BIN], capture_output=True, text=True,
                             check=True).stdout.strip()
        runs.append(json.loads(out))
    # median-of-3 per field (one noisy run on a shared box must not skew)
    med = {k: sorted(r[k] for r in runs)[1] for k in runs[0]}

    fps_hi = med["fps_tracking_typical"]
    fps_lo = med["fps_tracking_max_iters"]
    anchor = math.sqrt(fps_hi * fps_lo)
    doc = {
        "reference_cpu_fps": round(anchor, 2),
        "reference_cpu_fps_range": [round(fps_lo, 2), round(fps_hi, 2)],
        "note": (
            "measured hot-loop anchor: reference tracking-thread workload "
            "(pyramid + 4-level coarse align + reprojection matching + "
            "per-frame undistort remap + pose LM + LocalBundleAdjustment "
            "amortized at the keyframe interval, double-precision "
            "Jacobians) transcribed to C++ and timed on this machine's "
            "CPU; geometric mean of the early-stop(10)/max(50) "
            "LM-iteration brackets.  UPPER bound on the real reference "
            "(feature management over pointer graphs, covisibility "
            "upkeep, locks, allocation churn, g2o graph construction "
            "excluded) => derived speedups are LOWER bounds."
        ),
        "literature_estimate_fps": 40.0,
        "literature_note": (
            "HSO-class sparse direct VO real-time design point on a "
            "desktop CPU (SVO lineage reports 25-60 fps); kept for "
            "context only"
        ),
        "cpu": "Intel Xeon @ 2.10GHz (2 cores), single-threaded bench",
        "microbench": med,
        "raw_runs": runs,
    }
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in (
        "reference_cpu_fps", "reference_cpu_fps_range")}))


if __name__ == "__main__":
    main()
