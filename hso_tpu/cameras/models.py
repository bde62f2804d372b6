"""Concrete camera models: pinhole+radtan, FOV (ATAN), equidistant fisheye.

Behavioural parity targets (math transcribed from equations, vectorized):
  * PinholeCamera      — /root/reference/src/camera.cpp:31-131
  * FOVCamera          — /root/reference/src/camera.cpp:134-271
  * EquidistantCamera  — /root/reference/src/camera.cpp:274-370

The reference inverts radtan distortion with OpenCV ``undistortPoints``
(an iterative fixed-point scheme); we use the same fixed-point iteration,
vectorized, with a fixed trip count so it jits.
"""

from __future__ import annotations

from hso_tpu.cameras.base import AbstractCamera, _xp


class PinholeCamera(AbstractCamera):
    """Pinhole with radial-tangential distortion d = [k1 k2 p1 p2 k3]."""

    def __init__(self, width, height, fx, fy, cx, cy,
                 d0=0.0, d1=0.0, d2=0.0, d3=0.0, d4=0.0, undistort_image=False):
        super().__init__(width, height, fx, fy, cx, cy)
        self.d = (float(d0), float(d1), float(d2), float(d3), float(d4))
        self.has_distortion = abs(d0) > 1e-7
        self.undistort_image = bool(undistort_image)

    def distort(self, x, y):
        if not self.has_distortion:
            return x, y
        k1, k2, p1, p2, k3 = self.d
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        a1 = 2.0 * x * y
        a2 = r2 + 2.0 * x * x
        a3 = r2 + 2.0 * y * y
        cdist = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
        xd = x * cdist + p1 * a1 + p2 * a2
        yd = y * cdist + p1 * a3 + p2 * a1
        return xd, yd

    def undistort(self, xd, yd, n_iter: int = 20):
        if not self.has_distortion:
            return xd, yd
        k1, k2, p1, p2, k3 = self.d
        x, y = xd, yd
        for _ in range(n_iter):  # cv::undistortPoints fixed-point iteration
            r2 = x * x + y * y
            icdist = 1.0 / (1.0 + ((k3 * r2 + k2) * r2 + k1) * r2)
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
            x = (xd - dx) * icdist
            y = (yd - dy) * icdist
        return x, y


class FOVCamera(AbstractCamera):
    """FOV / ATAN model (Devernay-Faugeras), used by TUM MonoVO.

    Normalised intrinsics (< 1.0) are scaled by image size, matching
    camera.cpp:142-155. With ``undistort_image=True`` the model acts as an
    ideal pinhole over pre-rectified images (wide calib); otherwise the
    per-point ATAN warp is live (narrow calib).
    """

    def __init__(self, width, height, fx, fy, cx, cy, omega, undistort_image=False):
        if cx < 1.0 and cy < 1.0:
            fx, fy, cx, cy = fx * width, fy * height, cx * width, cy * height
        super().__init__(width, height, fx, fy, cx, cy)
        self.omega = float(omega)
        self.undistort_image = bool(undistort_image)
        self.has_distortion = (not undistort_image) and abs(self.omega) > 1e-9

    def distort(self, x, y):
        if not self.has_distortion:
            return x, y
        xp = _xp(x, y)
        import math

        r = xp.sqrt(x * x + y * y)
        rsafe = xp.maximum(r, 1e-12)
        fac = xp.arctan(2.0 * rsafe * math.tan(self.omega / 2.0)) / (rsafe * self.omega)
        fac = xp.where(r < 1e-12, xp.ones_like(fac), fac)
        return fac * x, fac * y

    def undistort(self, xd, yd):
        if not self.has_distortion:
            return xd, yd
        xp = _xp(xd, yd)
        import math

        rd = xp.sqrt(xd * xd + yd * yd)
        rdsafe = xp.maximum(rd, 1e-12)
        fac = xp.tan(rdsafe * self.omega) / (2.0 * rdsafe * math.tan(self.omega / 2.0))
        fac = xp.where(rd < 1e-12, xp.ones_like(fac), fac)
        return fac * xd, fac * yd


class EquidistantCamera(AbstractCamera):
    """Equidistant (Kannala-Brandt) fisheye, k = [k0..k3].

    The reference *always* pre-rectifies whole images for this model
    (undistort_=true, camera.cpp:289) and then treats points as ideal
    pinhole; we do the same — ``distort`` is only used to build the remap.
    """

    def __init__(self, width, height, fx, fy, cx, cy, k0, k1, k2, k3):
        super().__init__(width, height, fx, fy, cx, cy)
        self.k = (float(k0), float(k1), float(k2), float(k3))
        self.undistort_image = True
        self.has_distortion = False  # per-point path is ideal after remap

    def _equi_distort(self, x, y):
        xp = _xp(x, y)
        k0, k1, k2, k3 = self.k
        r = xp.sqrt(x * x + y * y)
        theta = xp.arctan(r)
        t2 = theta * theta
        t4 = t2 * t2
        t6 = t4 * t2
        t8 = t4 * t4
        thetad = theta * (1.0 + k0 * t2 + k1 * t4 + k2 * t6 + k3 * t8)
        scaling = xp.where(r > 1e-8, thetad / xp.maximum(r, 1e-12), xp.ones_like(r))
        return x * scaling, y * scaling

    def undistort_remap(self):
        import numpy as np

        v, u = np.mgrid[0 : self.height, 0 : self.width].astype(np.float64)
        x = (u - self.cx) / self.fx
        y = (v - self.cy) / self.fy
        xd, yd = self._equi_distort(x, y)
        return (xd * self.fx + self.cx).astype(np.float32), (
            yd * self.fy + self.cy
        ).astype(np.float32)
