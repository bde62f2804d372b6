#!/usr/bin/env python
"""Scale-aligned ATE between an estimated TUM trajectory and ground truth.

In-repo replacement for the external evo/TUM evaluation the reference's
protocol relies on (/root/reference/test/test_dataset.cpp:312-335 writes the
trajectory; accuracy is judged offline).  Usage:

    python scripts/evaluate_ate.py result/MH01.txt MH01_gt.csv [--max-dt 0.02]
        [--no-scale] [--json]

Ground truth may be TUM format (stamp tx ty tz qx qy qz qw) or EuRoC csv
(comma-separated, stamps in nanoseconds) — detected automatically.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hso_tpu.utils.evaluate import associate, ate, load_tum


def load_any(path: str):
    """TUM whitespace or EuRoC comma-separated (ns stamps) ground truth."""
    with open(path) as fh:
        first = ""
        for line in fh:
            if line.strip() and not line.startswith("#"):
                first = line
                break
    if "," in first:
        rows = np.genfromtxt(path, delimiter=",", comments="#")
        stamps = rows[:, 0] * 1e-9  # EuRoC: ns
        return stamps, rows[:, 1:4]
    stamps, rows = load_tum(path)
    return stamps, rows[:, :3]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("est", help="estimated trajectory (TUM format)")
    ap.add_argument("gt", help="ground truth (TUM or EuRoC csv)")
    ap.add_argument("--max-dt", type=float, default=0.02)
    ap.add_argument("--no-scale", action="store_true",
                    help="SE3 alignment instead of Sim3")
    ap.add_argument("--json", action="store_true", help="one JSON line")
    args = ap.parse_args()

    st_e, rows_e = load_tum(args.est)
    st_g, xyz_g = load_any(args.gt)
    ia, ib = associate(st_e, st_g, max_dt=args.max_dt)
    if len(ia) < 3:
        print(f"error: only {len(ia)} associated pairs", file=sys.stderr)
        return 2
    res = ate(rows_e[ia, :3], xyz_g[ib], with_scale=not args.no_scale)
    if args.json:
        print(json.dumps({
            "ate_rmse": res.rmse, "ate_mean": res.mean,
            "ate_median": res.median, "ate_max": res.max,
            "n_pairs": res.n_pairs, "scale": res.scale,
        }))
    else:
        print(res)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
