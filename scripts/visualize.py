"""Headless map/trajectory visualization — the Pangolin viewer replacement.

The reference renders its map live in an OpenGL thread
(/root/reference/src/viewer.cpp); this framework is headless by design and
instead renders the same content offline from a checkpoint or trajectory
file:

    python scripts/visualize.py checkpoint=<map.npz> [out=<prefix>]
    python scripts/visualize.py traj=<KeyFrameTrajectory.txt> [out=<prefix>]

Outputs:
    <prefix>.png  — top-down + side trajectory with keyframes and map points
                    (points colored by host intensity, like the viewer's
                    DrawMapPoints)
    <prefix>.ply  — map points + keyframe centers as a point cloud for any
                    external 3D viewer (replaces the interactive GL view)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _load_checkpoint(path):
    z = np.load(path, allow_pickle=False)
    valid = z["pt_valid"]
    # world positions from host anchoring
    kf_poses = z["kf_poses"]
    host_kf = z["pt_host_kf"]
    f = z["pt_host_f"].astype(np.float64)
    idist = np.maximum(z["pt_idist"], 1e-10)

    from hso_tpu.math import se3np

    T_h = kf_poses[host_kf]
    p_h = f / idist[:, None]
    pts = se3np.apply(se3np.inv(T_h), p_h)[valid]
    # host-window center intensity for coloring (viewer.cpp DrawMapPoints)
    win = z["pt_host_win"][valid]
    inten = win[:, win.shape[1] // 2, win.shape[2] // 2]
    n_kf = int(z["kf_count"])
    centers = np.stack(
        [se3np.translation(se3np.inv(z[f"kf{i}_T"])) for i in range(n_kf)]
    ) if n_kf else np.zeros((0, 3))
    return pts, inten, centers


def _load_traj(path):
    rows = np.loadtxt(path)
    if rows.ndim == 1:
        rows = rows[None]
    return rows[:, 1:4]  # TUM format: stamp tx ty tz qx qy qz qw


def _write_ply(path, pts, inten, centers):
    n = len(pts) + len(centers)
    with open(path, "w") as fh:
        fh.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(pts, inten):
            g = int(np.clip(c, 0, 255))
            fh.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {g} {g} {g}\n")
        for p in centers:
            fh.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} 220 40 40\n")


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    if "checkpoint" not in args and "traj" not in args:
        print(__doc__)
        sys.exit(1)
    out = args.get("out", "map_view")

    pts = np.zeros((0, 3))
    inten = np.zeros((0,))
    centers = np.zeros((0, 3))
    if "checkpoint" in args:
        pts, inten, centers = _load_checkpoint(args["checkpoint"])
    traj = _load_traj(args["traj"]) if "traj" in args else centers

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(14, 7))
    for ax, (i, j), name in zip(axes, [(0, 2), (0, 1)], ["top-down (x-z)", "side (x-y)"]):
        if len(pts):
            ax.scatter(pts[:, i], pts[:, j], s=1.5,
                       c=np.clip(inten / 255.0, 0, 1), cmap="gray",
                       vmin=0, vmax=1, alpha=0.7, label="map points")
        if len(traj):
            ax.plot(traj[:, i], traj[:, j], "r-", lw=1.5, label="trajectory")
        if len(centers):
            ax.scatter(centers[:, i], centers[:, j], s=14, c="tab:blue",
                       marker="s", label="keyframes")
        ax.set_title(name)
        ax.set_aspect("equal")
        ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(out + ".png", dpi=130)
    print(f"wrote {out}.png")

    if len(pts) or len(centers):
        _write_ply(out + ".ply", pts, inten, centers)
        print(f"wrote {out}.ply ({len(pts)} points, {len(centers)} keyframes)")


if __name__ == "__main__":
    main()
