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


def test_five_point_minimal_exact():
    """Noise-free 5-correspondence samples: the Nistér/Stewénius solver must
    contain the ground-truth essential matrix among its candidates."""
    from hso_tpu.math.epipolar_geometry import _essential_candidates_5pt

    rng = np.random.default_rng(0)
    for _ in range(10):
        T = se3np.exp(rng.normal(0, 0.2, 6))
        R, t = T[:3, :3], T[:3, 3] / np.linalg.norm(T[:3, 3])
        p1 = np.stack([rng.uniform(-1, 1, 5), rng.uniform(-1, 1, 5),
                       rng.uniform(2, 6, 5)], -1)
        p2 = (R @ p1.T).T + t
        uv1 = p1[:, :2] / p1[:, 2:3]
        uv2 = p2[:, :2] / p2[:, 2:3]
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
        E_gt = tx @ R
        E_gt = E_gt / np.linalg.norm(E_gt)
        cands = _essential_candidates_5pt(uv1, uv2)
        best = min(min(np.linalg.norm(E - E_gt), np.linalg.norm(E + E_gt))
                   for E in cands)
        assert best < 1e-6, best


def _outlier_pair(seed, outlier, n=120, noise_px=0.5):
    rng = np.random.default_rng(seed)
    T_gt = se3np.exp(np.r_[0.15, -0.1, 0.05, 0.02, 0.04, -0.03])
    R, t = T_gt[:3, :3], T_gt[:3, 3] / np.linalg.norm(T_gt[:3, 3])
    p1 = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.1, 1.1, n),
                   rng.uniform(2, 6, n)], -1)
    p2 = (R @ p1.T).T + t
    uv1 = p1[:, :2] / p1[:, 2:3] + rng.normal(0, noise_px / FOCAL, (n, 2))
    uv2 = p2[:, :2] / p2[:, 2:3] + rng.normal(0, noise_px / FOCAL, (n, 2))
    uv2[: int(outlier * n)] = rng.uniform(-0.5, 0.5, (int(outlier * n), 2))
    f1 = bearings(np.concatenate([uv1, np.ones((n, 1))], -1))
    f2 = bearings(np.concatenate([uv2, np.ones((n, 1))], -1))
    return f1, f2, se3np.from_Rt(R, t)


def test_five_point_doubles_outlier_tolerance():
    """VERDICT-r4 item 9 done-criterion: the 5-pt bootstrap is robust at
    ≥2× the outlier rate the 8-pt path tolerates (same iteration budget).
    Measured sweep (10 seeds, 0.5 px noise, 100 iters): 8pt ≥50% success up
    to ε=0.2; 5pt up to ε=0.5-0.6."""
    def rate(method, eps, seeds=8):
        ok = 0
        for s in range(seeds):
            f1, f2, T_gt = _outlier_pair(s, eps)
            res = recover_pose_ransac(f1, f2, FOCAL, n_iter=100, seed=s,
                                      method=method)
            if res is None:
                continue
            r, td = pose_err(res["T_21"], T_gt)
            ok += (r < 0.02) and (td < 0.05)
        return ok / seeds

    grid = [0.2, 0.3, 0.4, 0.5]
    tol8 = max([e for e in grid if rate("8pt", e) >= 0.5], default=0.0)
    tol5 = max([e for e in grid if rate("5pt", e) >= 0.5], default=0.0)
    assert tol5 >= 0.4, (tol5, tol8)
    assert tol5 >= 2.0 * max(tol8, 0.2), (tol5, tol8)
