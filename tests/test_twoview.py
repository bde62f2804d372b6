import numpy as np
import pytest

from hso_tpu.math import se3np
from hso_tpu.math.epipolar_geometry import (
    recover_pose_homography_ransac,
    recover_pose_ransac,
    recover_pose_twoview,
)

FOCAL = 400.0


def bearings(p):
    return p / np.linalg.norm(p, axis=-1, keepdims=True)


def make_view_pair(planar: bool, seed=0, noise_px=0.3, n=200):
    rng = np.random.default_rng(seed)
    if planar:
        p1 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), np.full(n, 3.0)],
            axis=-1,
        )
    else:
        p1 = np.stack(
            [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(2, 6, n)],
            axis=-1,
        )
    T_gt = se3np.exp(np.r_[0.3, -0.1, 0.05, 0.02, 0.04, -0.01])
    p2 = se3np.apply(T_gt, p1)
    f1 = bearings(p1 + rng.normal(0, noise_px / FOCAL, (n, 3)) * p1[:, 2:3])
    f2 = bearings(p2 + rng.normal(0, noise_px / FOCAL, (n, 3)) * p2[:, 2:3])
    return f1, f2, T_gt


def pose_err(T_est, T_gt):
    """Rotation error + translation direction angle (scale-free)."""
    r = np.linalg.norm(se3np.log(se3np.mul(T_est, se3np.inv(T_gt)))[3:])
    te = se3np.translation(T_est)
    tg = se3np.translation(T_gt)
    c = np.dot(te / np.linalg.norm(te), tg / np.linalg.norm(tg))
    return r, np.arccos(np.clip(c, -1, 1))


@pytest.mark.parametrize("planar", [False, True])
def test_twoview_model_selection(planar):
    f1, f2, T_gt = make_view_pair(planar)
    res = recover_pose_twoview(f1, f2, FOCAL)
    assert res is not None and res["n_inliers"] > 120
    r, t_ang = pose_err(res["T_21"], T_gt)
    assert r < 5e-3, (planar, r)
    assert t_ang < 2e-2, (planar, t_ang)


def test_essential_struggles_on_plane_homography_doesnt():
    f1, f2, T_gt = make_view_pair(planar=True, seed=3)
    res_h = recover_pose_homography_ransac(f1, f2, FOCAL)
    assert res_h is not None
    r_h, _ = pose_err(res_h["T_21"], T_gt)
    assert r_h < 5e-3
