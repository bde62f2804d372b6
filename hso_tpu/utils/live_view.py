"""Live run viewer — the runtime counterpart of the reference's Pangolin
thread and OpenCV "Tracking Image" overlay.

The reference renders the map and the tracked features while the sequence
runs (/root/reference/src/viewer.cpp polls ``_vo->lastFrame()`` from a GUI
thread; /root/reference/test/test_dataset.cpp:289-305 draws the feature
overlay).  This framework is deterministic and headless by design, so the
live view is a *file sink*: every ``every``-th frame it refreshes

    <dir>/tracking.png   — current image with matched features (corners
                           green, edgelets magenta, TEMPORARY cyan) and the
                           frame/inlier counters burned in,
    <dir>/map.png        — top-down map points + keyframe trajectory +
                           current camera, same content as DrawMapPoints/
                           DrawKeyFrames.

Point the viewer of your choice (VS Code, `watch -n1 feh`, a browser) at the
two PNGs for a live display; with ``show=True`` and a reachable X display it
also drives ``cv2.imshow`` like the reference app.
"""

from __future__ import annotations

import os

import numpy as np


class LiveViewer:
    def __init__(self, out_dir: str = "result/live", every: int = 10,
                 show: bool = False):
        self.out_dir = out_dir
        self.every = max(1, every)
        self.show = show
        self.count = 0
        self.traj: list[np.ndarray] = []
        os.makedirs(out_dir, exist_ok=True)

    def update(self, vo, img: np.ndarray) -> None:
        """Call once per processed frame with the input image (grayscale)."""
        from hso_tpu.math import se3np

        frame = vo.last_frame
        if frame is not None:
            self.traj.append(se3np.translation(se3np.inv(frame.T_f_w)))
        self.count += 1
        if self.count % self.every:
            return
        self._draw_tracking(vo, img)
        self._draw_map(vo)

    # ------------------------------------------------------------ renderers
    def _draw_tracking(self, vo, img: np.ndarray) -> None:
        import cv2

        vis = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_GRAY2BGR)
        frame = vo.last_frame
        n_inl = 0
        if frame is not None and frame.obs is not None:
            o = frame.obs
            ov = o["valid"] & (o["point_id"] >= 0)
            n_inl = int(ov.sum())
            ptype = vo.points.type[np.where(ov, o["point_id"], 0)]
            for i in np.where(ov)[0]:
                x, y = int(o["px"][i, 0]), int(o["px"][i, 1])
                if ptype[i] == 1:                       # TEMPORARY
                    color = (255, 255, 0)
                elif o["species"][i] == 1:              # edgelet
                    color = (255, 0, 255)
                else:
                    color = (0, 255, 0)
                cv2.circle(vis, (x, y), 3, color, 1, cv2.LINE_AA)
        txt = (f"frame {self.count}  inl {n_inl}  kfs {len(vo.kfs.frames)} "
               f"pts {int(vo.points.valid.sum())}  stage {vo.stage}")
        cv2.putText(vis, txt, (8, 20), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (0, 255, 255), 1, cv2.LINE_AA)
        cv2.imwrite(os.path.join(self.out_dir, "tracking.png"), vis)
        if self.show:
            cv2.imshow("hso_tpu tracking", vis)
            cv2.waitKey(1)

    def _draw_map(self, vo) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from hso_tpu.math import se3np

        pts = vo.points
        valid = pts.valid
        fig, ax = plt.subplots(figsize=(6, 6))
        if valid.any():
            p = pts.positions(vo.kfs.poses)[valid]
            ax.scatter(p[:, 0], p[:, 2], s=1.5, c="#777777", linewidths=0)
        if self.traj:
            t = np.stack(self.traj)
            ax.plot(t[:, 0], t[:, 2], color="#1f77b4", lw=1.0)
        for kf in vo.kfs.frames:
            c = se3np.translation(se3np.inv(kf.T_f_w))
            ax.plot(c[0], c[2], marker="s", ms=2.5, color="#2ca02c")
        if self.traj:
            ax.plot(t[-1, 0], t[-1, 2], marker="o", ms=5, color="#d62728")
        ax.set_aspect("equal")
        ax.set_xlabel("x [m]")
        ax.set_ylabel("z [m]")
        ax.set_title(f"map: {int(valid.sum())} points, "
                     f"{len(vo.kfs.frames)} keyframes")
        fig.tight_layout()
        fig.savefig(os.path.join(self.out_dir, "map.png"), dpi=110)
        plt.close(fig)
