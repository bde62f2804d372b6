"""End-to-end VO under auto-exposure + vignette with online calibration.

TUM MonoVO-style conditions: the rendered sequence passes through a
non-linear camera response, radial vignette, and per-frame exposure changes.
With ``photometric_calib`` on, the pipeline must calibrate online and keep
tracking with low drift.
"""

import numpy as np
import pytest

from hso_tpu.cameras import PinholeCamera
from hso_tpu.config import Config
from hso_tpu.math import se3np
from hso_tpu.pipeline.frame_handler import (
    RESULT_FAILURE,
    STAGE_DEFAULT,
    FrameHandler,
)
from hso_tpu.utils.synthetic import PlaneScene
from tests.test_pipeline_e2e import make_trajectory

GAMMA = 0.75
VIG = (-0.35, -0.15)


def _distort(img: np.ndarray, log_e: float, r2n: np.ndarray) -> np.ndarray:
    v_fac = np.exp(VIG[0] * r2n + VIG[1] * r2n ** 2)
    y = np.clip(np.exp(log_e) * v_fac * img, 0.0, 255.0)
    return 255.0 * (y / 255.0) ** GAMMA


@pytest.fixture(scope="module")
def run_vo_photo():
    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    scene = PlaneScene(cam, z0=2.0, extent=4.0, seed=21)
    poses = make_trajectory(36)
    rng = np.random.default_rng(4)
    # smooth auto-exposure walk, bounded
    log_e = np.cumsum(rng.uniform(-0.06, 0.06, len(poses)))
    log_e = np.clip(log_e - log_e[0], -0.3, 0.3)
    yy, xx = np.mgrid[0:480, 0:640]
    r2max = (0 - 320.0) ** 2 + (0 - 240.0) ** 2
    r2n = ((xx - 320.0) ** 2 + (yy - 240.0) ** 2) / r2max

    cfg = Config(photometric_calib=True)
    vo = FrameHandler(cam, cfg)
    # calibrate eagerly on short synthetic sequences
    vo.photo.solve_every = 6
    vo.photo.min_frames = 6
    results = []
    for k, T in enumerate(poses):
        img = _distort(scene.render(T).astype(np.float64), log_e[k], r2n)
        results.append(vo.add_image(img, ts=float(k)))
    return dict(vo=vo, poses=poses, results=results)


def test_tracks_through_photometric_distortion(run_vo_photo):
    vo = run_vo_photo["vo"]
    results = run_vo_photo["results"]
    assert vo.stage == STAGE_DEFAULT
    fails = [r.status for r in results if r.status == RESULT_FAILURE]
    assert len(fails) == 0, [r.status for r in results]
    n_m = [r.n_inliers for r in results if r.n_inliers > 0]
    assert np.median(n_m) > 50, n_m


def test_calibration_converged(run_vo_photo):
    """Online estimates carry a gamma-family gauge ambiguity (U^α, e^α, V^α
    is equally self-consistent), so assert the gauge-invariant property the
    pipeline needs: corrected images of the SAME view at different exposures
    differ by a spatially constant factor (response linearized + vignette
    removed)."""
    vo = run_vo_photo["vo"]
    assert vo.photo is not None and vo.photo.calibrated
    rms0, rms1 = vo.photo.last_rms
    assert rms1 < rms0

    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    scene = PlaneScene(cam, z0=2.0, extent=4.0, seed=21)
    poses = run_vo_photo["poses"]
    yy, xx = np.mgrid[0:480, 0:640]
    r2max = (0 - 320.0) ** 2 + (0 - 240.0) ** 2
    r2n = ((xx - 320.0) ** 2 + (yy - 240.0) ** 2) / r2max
    img = scene.render(poses[len(poses) // 2]).astype(np.float64)
    o1 = np.asarray(vo.photo.correct(_distort(img, 0.0, r2n)))
    o2 = np.asarray(vo.photo.correct(_distort(img, 0.35, r2n)))
    m = (o1 > 20) & (o1 < 230) & (o2 > 20) & (o2 < 230)
    ratio = o2[m] / o1[m]
    cv_corrected = np.std(ratio) / np.mean(ratio)
    assert cv_corrected < 0.05, cv_corrected

    # vignette removal: a uniform-radiance frame comes out flat after
    # correction while the distorted input falls off with radius.  Evaluate
    # where calibration samples actually live (tracked features stay in the
    # frame interior, so the far-corner vignette is unobservable — restrict
    # to r² ≤ 0.6 of the corner radius).
    flat = np.full((480, 640), 140.0)
    d = _distort(flat, 0.0, r2n)
    c = np.asarray(vo.photo.correct(d))
    m = r2n <= 0.6
    flat_raw = np.std(np.log(d[m]))
    flat_cor = np.std(np.log(c[m]))
    assert flat_raw > 0.03              # the synthetic vignette is strong
    assert flat_cor < 0.5 * flat_raw, (flat_cor, flat_raw)


def test_drift_still_bounded(run_vo_photo):
    vo = run_vo_photo["vo"]
    poses_gt = run_vo_photo["poses"]
    est = {int(ts): T for ts, T in vo.trajectory}
    frames = sorted(est.keys())
    start = next(
        f for f in frames if np.abs(est[f] - se3np.identity()).max() > 1e-9
    )

    def centers(d, idx):
        return np.stack([se3np.translation(se3np.inv(d[i])) for i in idx])

    idx = [f for f in frames if f >= start]
    c_est = centers(est, idx)
    c_gt = centers({i: poses_gt[i] for i in idx}, idx)
    c_est -= c_est[0]
    c_gt -= c_gt[0]
    len_est = np.linalg.norm(np.diff(c_est, axis=0), axis=1).sum()
    len_gt = np.linalg.norm(np.diff(c_gt, axis=0), axis=1).sum()
    assert len_est > 0.01
    s = len_gt / len_est
    ate = np.linalg.norm(c_est * s - c_gt, axis=1)
    rmse = np.sqrt(np.mean(ate**2))
    # photometric distortion costs some accuracy vs the clean 0.05 bound,
    # but drift must stay at the centimetre level
    assert rmse < 0.08, (rmse, ate.max())
