import numpy as np
import jax.numpy as jnp
import pytest

from hso_tpu.cameras import PinholeCamera
from hso_tpu.image.pyramid import build_frame_pyramids
from hso_tpu.math import se3np
from hso_tpu.mapping.depth_filter import (
    empty_seeds,
    harvest_and_prune,
    init_seeds,
    update_seeds,
)
from hso_tpu.ops.detect import detect_features, occupancy_grid
from hso_tpu.utils.synthetic import PlaneScene

S_MAX = 512


@pytest.fixture(scope="module")
def setup():
    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    scene = PlaneScene(cam, z0=2.0, extent=3.0, seed=11)
    kf_img = scene.render()
    kf = build_frame_pyramids(jnp.asarray(kf_img))
    occ = jnp.zeros((-(-480 // 32), -(-640 // 32)), bool)
    det = detect_features(
        kf["pyr"][:3], kf["sobel_x"], kf["sobel_y"], kf["grad_mean"], occ, n_out=256
    )
    f_det = cam.cam2world(np.asarray(det["px"])).astype(np.float32)
    seeds = empty_seeds(S_MAX)
    # prior: mean depth 3.0 (true ~2.0-2.6), depth_min 1.0
    seeds = init_seeds(
        seeds, det, kf["pyr"], jnp.asarray(f_det), 0, 1, 3.0, 1.0, 150.0
    )
    return dict(cam=cam, scene=scene, kf=kf, det=det, seeds=seeds)


def test_init_seeds_allocates(setup):
    seeds = setup["seeds"]
    n_det = int(np.asarray(setup["det"]["valid"]).sum())
    assert int(np.asarray(seeds["valid"]).sum()) == n_det
    mu = np.asarray(seeds["mu"])[np.asarray(seeds["valid"])]
    np.testing.assert_allclose(mu, 1.0 / 3.0, atol=1e-6)


def test_seeds_converge_to_true_depth(setup):
    cam, scene = setup["cam"], setup["scene"]
    seeds = setup["seeds"]
    host_T = jnp.asarray(
        np.stack([se3np.identity()] * 4).astype(np.float32)
    )
    host_exp = jnp.ones((4,), jnp.float32)
    px_err_angle = float(np.arctan(1.0 / (2.0 * cam.focal_mean)) * 2.0)

    rng = np.random.default_rng(0)
    n_upd_total = 0
    for k in range(1, 7):
        # sideways translation (good parallax for depth)
        xi = np.r_[0.06 * k, 0.02 * k, 0.01 * k, 0.0, 0.0, 0.0]
        T_cur_w = se3np.exp(xi)
        img = scene.render(T_cur_w)
        cur = build_frame_pyramids(jnp.asarray(img))
        seeds, stats = update_seeds(
            seeds, host_T, host_exp, cur["pyr"], cur["sobel_x"], cur["sobel_y"],
            jnp.asarray(T_cur_w, jnp.float32), 1.0, px_err_angle, cam,
        )
        n_upd_total += int(stats["n_updated"])

    valid = np.asarray(seeds["valid"])
    assert n_upd_total > valid.sum() * 2, n_upd_total

    upd_mask = valid & (np.asarray(seeds["n_updates"]) >= 3)
    assert upd_mask.sum() > 0.4 * valid.sum()
    px = np.asarray(seeds["px"])[upd_mask]
    mu = np.asarray(seeds["mu"])[upd_mask]
    d_gt = scene.depth_along_ray(px.astype(np.float64))
    rel_err = np.abs(1.0 / mu - d_gt) / d_gt
    assert np.median(rel_err) < 0.02, np.median(rel_err)

    # uncertainty must have contracted
    sig = np.sqrt(np.asarray(seeds["sigma2"])[upd_mask])
    zr = np.asarray(seeds["z_range"])[upd_mask]
    assert np.median(sig / zr) < 0.05

    # harvest with activation refinement: some should be converged now
    # (bundle columns: 0=converged, 1=stale, 12=mu — depth_filter.harvest_and_prune)
    seeds2, bundle = harvest_and_prune(seeds, 2, host_T)
    b = np.asarray(bundle)
    conv_np = b[:, 0] > 0.5
    assert int(conv_np.sum()) > 10
    # converged removed from live set
    assert int(np.asarray(seeds2["valid"]).sum()) == valid.sum() - int(conv_np.sum())
    # refined inverse distances stay accurate
    mu_ref = b[conv_np, 12]
    d_gt2 = scene.depth_along_ray(np.asarray(seeds["px"])[conv_np].astype(np.float64))
    rel2 = np.abs(1.0 / mu_ref - d_gt2) / d_gt2
    assert np.median(rel2) < 0.02


def test_prune_stale(setup):
    seeds = setup["seeds"]
    # batch counter far in the future: all seeds stale
    seeds2, bundle = harvest_and_prune(seeds, 100)
    stale = np.asarray(bundle)[:, 1] > 0.5
    assert int(stale.sum()) == int(np.asarray(seeds["valid"]).sum())
    assert int(np.asarray(seeds2["valid"]).sum()) == 0


def test_long_epipolar_range(setup):
    """Search-range parity with the reference's 100 px cap (matcher.cpp:
    875-879): a wide-baseline frame projects the fresh seeds' ±2σ range to a
    ~90 px segment at level 0 — far beyond one 48 px search window.  The
    level-bump must keep the WHOLE range searchable (coarser level) instead
    of cropping the true depth away, and the fused estimates must land near
    ground truth in a single observation."""
    cam, scene = setup["cam"], setup["scene"]
    seeds = setup["seeds"]
    host_T = jnp.asarray(np.stack([se3np.identity()] * 4).astype(np.float32))
    host_exp = jnp.ones((4,), jnp.float32)
    px_err_angle = float(np.arctan(1.0 / (2.0 * cam.focal_mean)) * 2.0)

    # prior mu=1/3, sigma=z_range/6=1/6 → ±2σ inverse-depth range ≈ 0.67;
    # 0.35 m sideways ⇒ epl ≈ f·tx·Δρ ≈ 94 px at level 0
    T_cur_w = se3np.exp(np.r_[0.35, 0.0, 0.0, 0.0, 0.0, 0.0])
    img = scene.render(T_cur_w)
    cur = build_frame_pyramids(jnp.asarray(img))
    seeds2, stats = update_seeds(
        seeds, host_T, host_exp, cur["pyr"], cur["sobel_x"], cur["sobel_y"],
        jnp.asarray(T_cur_w, jnp.float32), 1.0, px_err_angle, cam,
    )
    valid = np.asarray(seeds["valid"])
    n_upd = int(stats["n_updated"])
    # with the old 36 px crop toward the far (deep) end the true depths
    # (~2-2.6 m, ≳70 px along the segment) were unreachable
    assert n_upd > 0.25 * valid.sum(), (n_upd, valid.sum())

    upd = np.asarray(seeds2["n_updates"]) > np.asarray(seeds["n_updates"])
    px = np.asarray(seeds["px"])[upd]
    mu1 = np.asarray(seeds2["mu"])[upd]
    d_gt = scene.depth_along_ray(px.astype(np.float64))
    rel = np.abs(1.0 / mu1 - d_gt) / d_gt
    assert np.median(rel) < 0.10, np.median(rel)


def test_no_update_without_parallax(setup):
    """Pure rotation gives no depth information: seeds should survive but
    gain nothing (epl degenerates to a point)."""
    cam, scene = setup["cam"], setup["scene"]
    seeds = setup["seeds"]
    host_T = jnp.asarray(np.stack([se3np.identity()] * 4).astype(np.float32))
    host_exp = jnp.ones((4,), jnp.float32)
    T_cur_w = se3np.exp(np.r_[0, 0, 0, 0.0, 0.02, 0.0])
    img = scene.render(T_cur_w)
    cur = build_frame_pyramids(jnp.asarray(img))
    seeds2, stats = update_seeds(
        seeds, host_T, host_exp, cur["pyr"], cur["sobel_x"], cur["sobel_y"],
        jnp.asarray(T_cur_w, jnp.float32), 1.0, 0.004, cam,
    )
    mu0 = np.asarray(seeds["mu"])
    mu1 = np.asarray(seeds2["mu"])
    valid = np.asarray(seeds["valid"])
    # variance can only shrink slightly; mean must not run away
    assert np.abs(mu1[valid] - mu0[valid]).max() < 0.2


def test_activation_rejects_inconsistent_seeds():
    """Mean-shift re-verification at harvest (activatePoint's distMean gate,
    depth_filter.cpp:820-835): converged seeds whose stored matches disagree
    with the converged depth (repetitive-texture mismatches) must be REJECTED
    — erased without becoming landmarks — while consistent seeds activate."""
    cam_f = 400.0
    s = empty_seeds(64)
    n = 16
    rng = np.random.default_rng(3)
    f = np.concatenate([rng.normal(0, 0.15, (n, 2)), np.ones((n, 1))], -1)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    mu = np.full(n, 0.5, np.float32)

    host_T = jnp.asarray(np.stack([se3np.identity()] * 4).astype(np.float32))
    views = [se3np.exp(np.r_[0.15 * (k + 1), 0.05 * k, 0.0, 0, 0, 0])
             for k in range(4)]
    p_world = f / mu[:, None]

    obs_uv = np.zeros((n, 8, 2), np.float32)
    obs_T = np.zeros((n, 8, 3, 4), np.float32)
    obs_valid = np.zeros((n, 8), bool)
    for k, T in enumerate(views):
        p_v = se3np.apply(T, p_world)
        uv = p_v[:, :2] / p_v[:, 2:3]
        # rows 8..15: corrupt the matches by ~6 px (repetitive texture lock)
        uv[8:] += rng.normal(0, 6.0 / cam_f, uv[8:].shape)
        obs_uv[:, k] = uv
        obs_T[:, k] = T
        obs_valid[:, k] = True

    upd = dict(s)
    idx = jnp.arange(n)
    for key, val in (
        ("valid", np.ones(n, bool)), ("host", np.zeros(n, np.int32)),
        ("f", f.astype(np.float32)), ("mu", mu),
        ("sigma2", np.full(n, 1e-6, np.float32)),
        ("z_range", np.ones(n, np.float32)),
        ("converge_thresh", np.full(n, 100.0, np.float32)),
        ("batch_id", np.ones(n, np.int32)),
        ("obs_uv", obs_uv), ("obs_T", obs_T), ("obs_valid", obs_valid),
        ("obs_count", np.full(n, 4, np.int32)),
    ):
        upd[key] = s[key].at[idx].set(jnp.asarray(val))

    out, bundle = harvest_and_prune(
        upd, 1, host_T, 3, 3.0, cam_f)
    b = np.asarray(bundle)
    conv = (b[:, 0] > 0.5)[:n]
    stale = (b[:, 1] > 0.5)[:n]
    assert conv[:8].all(), conv
    assert not conv[8:].any(), conv
    assert stale[8:].all(), stale  # rejected → folded into stale (temp dies)
