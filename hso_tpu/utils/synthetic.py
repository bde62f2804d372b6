"""Synthetic planar scene renderer — ground-truth data for tests and benches.

Renders views of a textured plane (world z = z0) for any camera pose with
known per-pixel depth, giving every estimator a closed-loop oracle: the
reference has no unit tests at all (SURVEY.md §4); this is the foundation of
ours.  Pure host-side numpy/cv2 — not part of the measured compute path.
"""

from __future__ import annotations

import cv2
import numpy as np

from hso_tpu.math import se3np


class PlaneScene:
    def __init__(self, cam, z0: float = 2.0, extent: float = 2.0,
                 tex_size: int = 2048, seed: int = 0, blur: float = 2.0):
        self.cam = cam
        self.z0 = float(z0)
        self.extent = float(extent)  # plane spans [-extent, extent] in x and y
        rng = np.random.default_rng(seed)
        tex = rng.integers(0, 256, size=(tex_size, tex_size)).astype(np.float32)
        tex = cv2.GaussianBlur(tex, (0, 0), blur)
        # renormalize to a healthy contrast range
        tex = (tex - tex.min()) / (tex.max() - tex.min()) * 220.0 + 15.0
        self.tex = tex
        self.tex_size = tex_size

    def _world_to_tex(self, x, y):
        s = self.tex_size / (2.0 * self.extent)
        return (x + self.extent) * s, (y + self.extent) * s

    def render(self, T_c_w=None, exposure: float = 1.0) -> np.ndarray:
        """Render the uint8 view from camera pose ``T_c_w`` (world→camera)."""
        if T_c_w is None:
            T_c_w = se3np.identity()
        T_w_c = se3np.inv(T_c_w)
        h, w = self.cam.height, self.cam.width
        v, u = np.mgrid[0:h, 0:w].astype(np.float64)
        px = np.stack([u.reshape(-1), v.reshape(-1)], axis=-1)
        f_cam = self.cam.cam2world(px)                      # (HW, 3) unit rays
        f_w = se3np.rotate(T_w_c, f_cam)
        t_w = se3np.translation(T_w_c)
        lam = (self.z0 - t_w[2]) / f_w[:, 2]
        p_w = t_w[None, :] + lam[:, None] * f_w
        tx, ty = self._world_to_tex(p_w[:, 0], p_w[:, 1])
        img = cv2.remap(
            self.tex,
            tx.reshape(h, w).astype(np.float32),
            ty.reshape(h, w).astype(np.float32),
            cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
            borderValue=0.0,
        )
        behind = (lam <= 0).reshape(h, w)
        img = np.where(behind, 0.0, img) * exposure
        return np.clip(img, 0, 255).astype(np.uint8)

    def depth_along_ray(self, px: np.ndarray, T_c_w=None) -> np.ndarray:
        """Ground-truth distance along the bearing for pixels (N, 2)."""
        if T_c_w is None:
            T_c_w = se3np.identity()
        T_w_c = se3np.inv(T_c_w)
        f_cam = self.cam.cam2world(px)
        f_w = se3np.rotate(T_w_c, f_cam)
        t_w = se3np.translation(T_w_c)
        return (self.z0 - t_w[2]) / f_w[:, 2]

    def grid_features(self, step: int = 24, border: int = 24, T_c_w=None):
        """Regular grid of features: (px (N,2), f (N,3), dist (N,))."""
        h, w = self.cam.height, self.cam.width
        us = np.arange(border, w - border, step, dtype=np.float64)
        vs = np.arange(border, h - border, step, dtype=np.float64)
        uu, vv = np.meshgrid(us, vs)
        px = np.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1)
        f = self.cam.cam2world(px)
        dist = self.depth_along_ray(px, T_c_w)
        return px, f, dist
