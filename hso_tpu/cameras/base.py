"""Camera interface.

The reference's ``AbstractCamera`` (/root/reference/include/hso/camera.h:35-91)
exposes per-point ``cam2world`` / ``world2cam`` virtual calls; here every
method is *batched over arbitrary leading dimensions* and dtype-polymorphic
(numpy in ⇒ numpy out for host bookkeeping, jax in ⇒ jax out for use inside
jitted kernels — camera intrinsics are Python floats, i.e. static at trace
time, so the same object works in both worlds).
"""

from __future__ import annotations

import numpy as np


def _xp(*arrays):
    """Pick the array namespace from the first jax array argument."""
    import jax.numpy as jnp

    for a in arrays:
        if isinstance(a, jnp.ndarray) and not isinstance(a, np.ndarray):
            return jnp
    return np


class AbstractCamera:
    """Pinhole-core camera; subclasses add distortion in unit-plane space."""

    def __init__(self, width: int, height: int, fx: float, fy: float, cx: float, cy: float):
        self.width = int(width)
        self.height = int(height)
        self.fx, self.fy, self.cx, self.cy = float(fx), float(fy), float(cx), float(cy)
        # reference ``errorMultiplier2()`` — mean focal length used to convert
        # unit-plane errors to pixels (camera.h:76, camera.cpp:59)
        self.focal_mean = abs(fx) if fx * fy < 0 else abs((fx + fy) * 0.5)

    # -- distortion hooks (identity by default) ------------------------------
    def distort(self, x, y):
        """unit-plane (x, y) -> distorted unit-plane coordinates."""
        return x, y

    def undistort(self, xd, yd):
        """distorted unit-plane -> ideal unit-plane coordinates."""
        return xd, yd

    # -- core API ------------------------------------------------------------
    def world2cam_uv(self, uv):
        """unit-plane coords (..., 2) -> pixel coords (..., 2)."""
        xd, yd = self.distort(uv[..., 0], uv[..., 1])
        xp = _xp(uv)
        return xp.stack([xd * self.fx + self.cx, yd * self.fy + self.cy], axis=-1)

    def world2cam(self, xyz):
        """camera-frame points (..., 3) -> pixel coords (..., 2).

        No chirality check here (matches reference world2cam); callers mask
        on z > 0 themselves.
        """
        xp = _xp(xyz)
        z = xyz[..., 2]
        zsafe = xp.where(xp.abs(z) < 1e-12, xp.ones_like(z) * 1e-12, z)
        uv = xp.stack([xyz[..., 0] / zsafe, xyz[..., 1] / zsafe], axis=-1)
        return self.world2cam_uv(uv)

    def cam2world(self, px):
        """pixel coords (..., 2) -> unit bearing vectors (..., 3)."""
        xp = _xp(px)
        xd = (px[..., 0] - self.cx) / self.fx
        yd = (px[..., 1] - self.cy) / self.fy
        x, y = self.undistort(xd, yd)
        f = xp.stack([x, y, xp.ones_like(x)], axis=-1)
        return f / xp.linalg.norm(f, axis=-1, keepdims=True)

    def is_in_frame(self, px, border: float = 0.0, level: int = 0):
        """True where integer pixel fits inside level-``level`` image with
        ``border`` margin (reference camera.h:60-71 uses int compare)."""
        xp = _xp(px)
        w = self.width >> level
        h = self.height >> level
        u = xp.floor(px[..., 0])
        v = xp.floor(px[..., 1])
        return (u >= border) & (u < w - border) & (v >= border) & (v < h - border)

    # -- whole-image undistortion -------------------------------------------
    def undistort_remap(self) -> tuple[np.ndarray, np.ndarray]:
        """Build (map_x, map_y) float32 arrays of shape (H, W): for each
        rectified pixel, the source pixel in the raw (distorted) image.
        Rectified images use the same K (matches reference
        initUndistortRectifyMap with newK = K, camera.cpp:47-54)."""
        v, u = np.mgrid[0 : self.height, 0 : self.width].astype(np.float64)
        x = (u - self.cx) / self.fx
        y = (v - self.cy) / self.fy
        xd, yd = self.distort(x, y)
        map_x = (xd * self.fx + self.cx).astype(np.float32)
        map_y = (yd * self.fy + self.cy).astype(np.float32)
        return map_x, map_y

    def ideal(self) -> "AbstractCamera":
        """The distortion-free pinhole with the same K (what the pipeline uses
        after whole-image undistortion)."""
        cam = AbstractCamera(self.width, self.height, self.fx, self.fy, self.cx, self.cy)
        return cam
