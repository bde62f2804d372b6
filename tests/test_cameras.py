import cv2
import numpy as np
import pytest

from hso_tpu.cameras import EquidistantCamera, FOVCamera, PinholeCamera

# EuRoC cam0 calibration (reference test/cameras/euroc.txt)
EUROC = dict(
    width=752, height=480,
    fx=458.654, fy=457.296, cx=367.215, cy=248.375,
    d0=-0.28340811, d1=0.07395907, d2=0.00019359, d3=1.76187114e-05, d4=0.0,
)


def interior_pixels(cam, n=200, border=40, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(border, cam.width - border, n)
    v = rng.uniform(border, cam.height - border, n)
    return np.stack([u, v], axis=-1)


def test_pinhole_roundtrip():
    cam = PinholeCamera(**EUROC)
    px = interior_pixels(cam)
    f = cam.cam2world(px)
    np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, atol=1e-12)
    px2 = cam.world2cam(f * 3.7)
    np.testing.assert_allclose(px2, px, atol=1e-4)


def test_pinhole_vs_opencv():
    cam = PinholeCamera(**EUROC)
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    D = np.array(cam.d)
    px = interior_pixels(cam)

    # cam2world vs cv2.undistortPoints
    und = cv2.undistortPoints(px.reshape(-1, 1, 2).astype(np.float64), K, D).reshape(-1, 2)
    f = cam.cam2world(px)
    uv = f[:, :2] / f[:, 2:3]
    # cv2.undistortPoints truncates at 5 fixed-point iterations (~0.3px error
    # near the border for EuRoC distortion); ours converges to ~3e-8 px, so
    # only loose agreement is expected here — test_pinhole_roundtrip is the
    # strict correctness anchor.
    np.testing.assert_allclose(uv, und, atol=2e-3)

    # world2cam vs cv2.projectPoints
    pts = np.concatenate([und, np.ones((len(und), 1))], axis=-1) * 2.0
    proj, _ = cv2.projectPoints(pts, np.zeros(3), np.zeros(3), K, D)
    np.testing.assert_allclose(cam.world2cam(pts), proj.reshape(-1, 2), atol=1e-6)


def test_fov_roundtrip():
    # TUM MonoVO narrow-calib style (normalized intrinsics)
    cam = FOVCamera(640, 480, 0.535719, 0.669566, 0.493248, 0.500408, 0.897966)
    assert cam.fx > 1.0  # scaled by width
    px = interior_pixels(cam)
    f = cam.cam2world(px)
    px2 = cam.world2cam(f * 1.9)
    np.testing.assert_allclose(px2, px, atol=1e-6)


def test_fov_distortion_is_nontrivial():
    cam = FOVCamera(640, 480, 0.535719, 0.669566, 0.493248, 0.500408, 0.897966)
    ideal = cam.ideal()
    px = np.array([[30.0, 30.0]])  # near corner: strong ATAN warp
    assert np.abs(cam.cam2world(px) - ideal.cam2world(px)).max() > 1e-3


def test_equidistant_remap_vs_opencv_fisheye():
    cam = EquidistantCamera(752, 480, 460.0, 460.0, 376.0, 240.0,
                            -0.01, 0.02, -0.005, 0.001)
    map_x, map_y = cam.undistort_remap()

    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]])
    D = np.array(cam.k).reshape(4, 1)
    mx_cv, my_cv = cv2.fisheye.initUndistortRectifyMap(
        K, D, np.eye(3), K, (cam.width, cam.height), cv2.CV_32FC1
    )
    np.testing.assert_allclose(map_x, mx_cv, atol=1e-2)
    np.testing.assert_allclose(map_y, my_cv, atol=1e-2)


def test_is_in_frame():
    cam = PinholeCamera(**EUROC)
    px = np.array([[0.5, 0.5], [751.2, 479.1], [-1.0, 10.0], [100.0, 100.0]])
    np.testing.assert_array_equal(
        cam.is_in_frame(px), np.array([True, True, False, True])
    )
    np.testing.assert_array_equal(
        cam.is_in_frame(px, border=8), np.array([False, False, False, True])
    )


def test_jax_matches_numpy():
    import jax.numpy as jnp

    cam = PinholeCamera(**EUROC)
    px = interior_pixels(cam).astype(np.float32)
    f_np = cam.cam2world(px)
    f_jx = np.asarray(cam.cam2world(jnp.asarray(px)))
    np.testing.assert_allclose(f_jx, f_np, atol=1e-5)
