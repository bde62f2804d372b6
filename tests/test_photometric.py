"""Online photometric calibration: synthetic ground-truth recovery.

The reference's PhotomatricCalibration module (RA-L'18 algorithm) is compiled
out and untestable; this validates our batched reimplementation against a
synthetic camera with known response curve, vignette, and per-frame exposure.
"""

import numpy as np
import jax.numpy as jnp

from hso_tpu.photometric import (
    OnlinePhotometricCalibrator,
    correct_image,
    inverse_response_curve,
    solve_photometric,
    vignette_map,
)


def _forward(radiance, e, r2n, gamma=0.8, vig=(-0.3, -0.1)):
    """Synthetic camera: irradiance -> observed intensity.

    V(r) = exp(vig1*R + vig2*R^2); O = 255 * (e*V*L/255)^gamma.
    """
    v_fac = np.exp(vig[0] * r2n + vig[1] * r2n ** 2)
    y = np.clip(e * v_fac * radiance, 0.0, 255.0)
    return 255.0 * (y / 255.0) ** gamma


def _make_problem(f_n=24, m_n=96, seed=3, drop=0.2):
    rng = np.random.default_rng(seed)
    radiance = rng.uniform(20.0, 220.0, m_n)
    log_e = np.concatenate([[0.0], rng.uniform(-0.5, 0.5, f_n - 1)])
    e = np.exp(log_e)
    r2 = rng.uniform(0.0, 1.0, (f_n, m_n))
    obs = _forward(radiance[None, :], e[:, None], r2)
    valid = rng.uniform(size=obs.shape) > drop
    return obs, r2, valid, log_e, radiance


def test_solver_recovers_exposures_and_flattens_residual():
    obs, r2, valid, log_e_true, _ = _make_problem()
    out = solve_photometric(
        jnp.asarray(obs, jnp.float32), jnp.asarray(r2, jnp.float32),
        jnp.asarray(valid),
    )
    rms0 = float(out["rms_before"])
    rms1 = float(out["rms_after"])
    assert rms1 < 0.25 * rms0, (rms0, rms1)
    assert rms1 < 0.03
    # exposures recovered up to the gamma ambiguity: log_e_est ≈ s*log_e_true
    le = np.asarray(out["log_e"])
    corr = np.corrcoef(le, log_e_true)[0, 1]
    assert corr > 0.995, corr
    scale = np.polyfit(log_e_true, le, 1)[0]
    assert 0.7 < scale < 1.4, scale


def test_correction_linearizes_observations():
    """After correction, the same point under different exposures must obey
    I_corr(j) / e_j = const (photometric linearity)."""
    obs, r2, valid, log_e_true, radiance = _make_problem(seed=11)
    out = solve_photometric(
        jnp.asarray(obs, jnp.float32), jnp.asarray(r2, jnp.float32),
        jnp.asarray(valid),
    )
    c, v = out["c"], out["v"]
    lin = np.asarray(
        correct_image(jnp.asarray(obs, jnp.float32), c, v,
                      jnp.asarray(r2, jnp.float32))
    )
    le = np.asarray(out["log_e"])
    usable = valid & (obs > 5) & (obs < 250)
    # per-point coefficient of variation of lin/e across frames
    ratio = lin / np.exp(le)[:, None]
    cvs = []
    for p in range(obs.shape[1]):
        m = usable[:, p]
        if m.sum() < 6:
            continue
        r = ratio[m, p]
        cvs.append(np.std(r) / np.mean(r))
    assert np.median(cvs) < 0.04, np.median(cvs)


def test_response_curve_shape_and_vignette_map():
    obs, r2, valid, _, _ = _make_problem(seed=5)
    out = solve_photometric(
        jnp.asarray(obs, jnp.float32), jnp.asarray(r2, jnp.float32),
        jnp.asarray(valid),
    )
    curve = inverse_response_curve(out["c"])
    assert curve.shape == (256,)
    assert curve[0] == 0.0
    assert abs(curve[-1] - 255.0) < 1.0          # U(255)=255 gauge
    assert np.all(np.diff(curve[2:]) > -1e-3)    # monotone
    # recovered inverse response matches O -> 255*(O/255)^(1/0.8) up to the
    # exponent-scale ambiguity: compare normalized log curves
    x = np.linspace(5, 250, 64)
    u_true = np.log(255.0 * (x / 255.0) ** (1.0 / 0.8))
    u_est = np.log(np.interp(x, np.linspace(0, 255, 256), curve))
    corr = np.corrcoef(u_true, u_est)[0, 1]
    assert corr > 0.999, corr

    vmap = vignette_map(out["v"], 48, 64, 31.5, 23.5)
    assert vmap.shape == (48, 64)
    assert abs(vmap[24, 32] - 1.0) < 0.05        # V ≈ 1 at the centre
    assert vmap[0, 0] < vmap[24, 32]             # darker corners


def test_online_calibrator_end_to_end():
    """Feed the host-side calibrator frames of a static point set under
    varying exposure; it must calibrate and its correction must reduce the
    brightness inconstancy of a held-out point set."""

    class Cam:
        width, height = 64, 48
        cx, cy = 31.5, 23.5

    rng = np.random.default_rng(0)
    n_pts = 60
    px = np.stack([rng.uniform(2, 61, n_pts), rng.uniform(2, 45, n_pts)], -1)
    radiance = rng.uniform(30.0, 200.0, n_pts)
    r2max = max(
        (0 - 31.5) ** 2 + (0 - 23.5) ** 2,
        (63 - 31.5) ** 2 + (0 - 23.5) ** 2,
        (0 - 31.5) ** 2 + (47 - 23.5) ** 2,
        (63 - 31.5) ** 2 + (47 - 23.5) ** 2,
    )
    yy, xx = np.mgrid[0:48, 0:64]
    r2_img = ((xx - 31.5) ** 2 + (yy - 23.5) ** 2) / r2max

    cal = OnlinePhotometricCalibrator(Cam(), window=40, solve_every=10,
                                      min_frames=10)
    n_max = 128
    log_es = rng.uniform(-0.4, 0.4, 30)
    log_es[0] = 0.0
    for j, le in enumerate(log_es):
        # render: nearest-pixel splat of radiances on a mid-gray background
        img = np.full((48, 64), 100.0)
        iu = px[:, 0].round().astype(int)
        iv = px[:, 1].round().astype(int)
        img[iv, iu] = radiance
        obs_img = _forward(img, np.exp(le), r2_img)
        obs = {
            "valid": np.zeros(n_max, bool),
            "px": np.zeros((n_max, 2), np.float32),
            "point_id": np.full(n_max, -1, np.int32),
        }
        obs["valid"][:n_pts] = True
        obs["px"][:n_pts] = np.stack([iu, iv], -1)
        obs["point_id"][:n_pts] = np.arange(n_pts)
        cal.add_frame_samples(obs_img, obs)
    assert cal.calibrated
    rms0, rms1 = cal.last_rms
    assert rms1 < 0.5 * rms0

    # correction linearity on a fresh frame pair differing only by exposure
    img = np.full((48, 64), 100.0)
    img[10:20, 10:30] = 180.0
    o1 = np.asarray(cal.correct(_forward(img, 1.0, r2_img)))
    o2 = np.asarray(cal.correct(_forward(img, 1.6, r2_img)))
    m = (o1 > 20) & (o1 < 235) & (o2 > 20) & (o2 < 235)
    ratio = o2[m] / o1[m]
    assert np.std(ratio) / np.mean(ratio) < 0.05
