import numpy as np
import jax.numpy as jnp
import pytest

from hso_tpu.cameras import PinholeCamera
from hso_tpu.image.pyramid import build_frame_pyramids
from hso_tpu.math import se3np
from hso_tpu.track.coarse_tracker import make_coarse_tracker
from hso_tpu.utils.synthetic import PlaneScene


@pytest.fixture(scope="module")
def scene():
    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    return PlaneScene(cam, z0=2.0, extent=2.5, seed=3)


def build_pyr(img):
    return build_frame_pyramids(jnp.asarray(img), n_pyr_levels=3, n_total_levels=5)["pyr"]


def pad_features(scene, n_max=256):
    px, f, dist = scene.grid_features(step=32, border=32)
    n = len(px)
    assert n <= n_max
    px_p = np.zeros((n_max, 2), np.float32)
    f_p = np.zeros((n_max, 3), np.float32)
    f_p[:, 2] = 1.0
    d_p = np.full((n_max,), -1.0, np.float32)
    px_p[:n] = px
    f_p[:n] = f
    d_p[:n] = dist
    return px_p, f_p, d_p


GT_XI = np.array([0.04, -0.03, 0.02, 0.01, -0.015, 0.008])  # [rho, phi]


@pytest.mark.parametrize("inverse", [False, True])
def test_recovers_known_motion(scene, inverse):
    T_gt = se3np.exp(GT_XI)  # T_cur_ref (= T_cur_w since ref at identity)
    img_ref = scene.render()
    img_cur = scene.render(T_gt)
    ref_pyr = build_pyr(img_ref)
    cur_pyr = build_pyr(img_cur)
    px, f, dist = pad_features(scene)

    track = make_coarse_tracker(scene.cam, inverse=inverse)
    out = track(ref_pyr, cur_pyr, px, f, dist, se3np.identity().astype(np.float32), 1.0)

    T_est = np.asarray(out["T_cur_ref"], np.float64)
    err = se3np.log(se3np.mul(T_est, se3np.inv(T_gt)))
    assert int(out["n_tracked"]) > 100
    # trans err < 2mm (scene scale 2m), rot err < 0.1 deg
    assert np.linalg.norm(err[:3]) < 2e-3, err
    assert np.linalg.norm(err[3:]) < 2e-3, err


def test_exposure_ratio_estimated(scene):
    T_gt = se3np.exp(GT_XI * 0.5)
    img_ref = scene.render()
    img_cur = scene.render(T_gt, exposure=1.3)
    px, f, dist = pad_features(scene)

    track = make_coarse_tracker(scene.cam, inverse=False)
    out = track(
        build_pyr(img_ref), build_pyr(img_cur), px, f, dist,
        se3np.identity().astype(np.float32), 1.0,
    )
    assert abs(float(out["exposure_ratio"]) - 1.3) < 0.05
    T_est = np.asarray(out["T_cur_ref"], np.float64)
    err = se3np.log(se3np.mul(T_est, se3np.inv(T_gt)))
    assert np.linalg.norm(err) < 4e-3, err


def test_large_motion_needs_pyramid(scene):
    """A ~40px-disparity motion must still converge thanks to coarse levels."""
    T_gt = se3np.exp(np.array([0.15, 0.1, 0.0, 0.0, 0.0, 0.03]))
    img_ref = scene.render()
    img_cur = scene.render(T_gt)
    px, f, dist = pad_features(scene)
    track = make_coarse_tracker(scene.cam, inverse=False)
    out = track(
        build_pyr(img_ref), build_pyr(img_cur), px, f, dist,
        se3np.identity().astype(np.float32), 1.0,
    )
    T_est = np.asarray(out["T_cur_ref"], np.float64)
    err = se3np.log(se3np.mul(T_est, se3np.inv(T_gt)))
    assert np.linalg.norm(err) < 5e-3, err


def test_invalid_slots_ignored(scene):
    T_gt = se3np.exp(GT_XI)
    img_ref = scene.render()
    img_cur = scene.render(T_gt)
    px, f, dist = pad_features(scene)
    # poison padded slots with absurd values; dist<0 must shield them
    bad = dist < 0
    px[bad] = 1e6
    f[bad] = np.array([0, 0, -1.0])
    track = make_coarse_tracker(scene.cam, inverse=False)
    out = track(
        build_pyr(img_ref), build_pyr(img_cur), px, f, dist,
        se3np.identity().astype(np.float32), 1.0,
    )
    T_est = np.asarray(out["T_cur_ref"], np.float64)
    err = se3np.log(se3np.mul(T_est, se3np.inv(T_gt)))
    assert np.linalg.norm(err) < 2e-3, err
