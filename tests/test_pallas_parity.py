"""Pallas ↔ XLA parity: run the five TPU kernels under the Pallas
interpreter on the CPU backend and assert agreement with their XLA twins.

The production call sites gate on ``window_pallas.on_tpu()`` so the CPU
suite normally never executes the kernels; ``force_interpret(True)`` makes
``on_tpu()`` report True and routes every ``pallas_call`` through the
interpreter, so these tests exercise the *identical* kernel code that runs
on hardware (modulo Mosaic lowering) against the XLA formulations that
remain the CPU path.  Covers randomized + adversarial inputs (empty masks,
border anchors, degenerate epipolar lines, far-off initializations).

Kernels under test (VERDICT r4 weak #3):
  * ops/window_pallas.py   extract_windows_tpu / pack_level_windows_tpu
  * ops/align_pallas.py    align_match_tpu        vs ops/align.align_mixed(+ncc,+grad)
  * ops/epipolar_pallas.py zmncc_line_scores_tpu  vs ops/epipolar XLA branch
  * track/coarse_pallas.py coarse_level_ic_tpu    vs track/coarse_tracker XLA LM loop
  * track/pose_pallas.py   pose_lm_tpu            vs track/pose_optimizer XLA LM loop
"""

import contextlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hso_tpu.cameras import PinholeCamera
from hso_tpu.image.pyramid import build_frame_pyramids
from hso_tpu.math import se3np
from hso_tpu.ops import window_pallas
from hso_tpu.ops.gatherless import bilinear_grid, clip_anchor, extract_windows_xla
from hso_tpu.utils.synthetic import PlaneScene


@contextlib.contextmanager
def forced_interpret():
    """Route all Pallas call sites through the interpreter; the flag is
    read at trace time, so caches are cleared on both edges."""
    from hso_tpu.track.coarse_tracker import make_coarse_tracker

    window_pallas.force_interpret(True)
    jax.clear_caches()
    make_coarse_tracker.cache_clear()
    try:
        yield
    finally:
        window_pallas.force_interpret(False)
        jax.clear_caches()
        make_coarse_tracker.cache_clear()


@pytest.fixture(scope="module")
def scene():
    cam = PinholeCamera(640, 480, 400.0, 400.0, 320.0, 240.0)
    return PlaneScene(cam, z0=2.0, extent=2.5, seed=3)


@pytest.fixture(scope="module")
def pyr(scene):
    return build_frame_pyramids(
        jnp.asarray(scene.render()), n_pyr_levels=3, n_total_levels=5)["pyr"]


# ---------------------------------------------------------------- windows


def test_extract_windows_parity(pyr):
    img = pyr[0]
    h, w = img.shape
    win = 24
    rs = np.random.RandomState(0)
    # adversarial corners + random interior anchors
    au = np.concatenate([[0, w - win, 0, w - win],
                         rs.randint(0, w - win, 60)]).astype(np.int32)
    av = np.concatenate([[0, 0, h - win, h - win],
                         rs.randint(0, h - win, 60)]).astype(np.int32)
    ref = extract_windows_xla(img, jnp.asarray(au), jnp.asarray(av), win)
    with forced_interpret():
        out = window_pallas.extract_windows_tpu(
            img, jnp.asarray(au), jnp.asarray(av), win)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pack_level_windows_parity(pyr):
    from hso_tpu.ops.epipolar import pack_level_windows

    win, n_levels = 48, 3
    rs = np.random.RandomState(1)
    s = 70
    level = rs.randint(0, n_levels, s).astype(np.int32)
    # centres in each seed's own level coordinates (incl. border-clipped)
    cu = np.empty(s, np.float32)
    cv = np.empty(s, np.float32)
    for k in range(s):
        h, w = pyr[level[k]].shape
        cu[k] = rs.uniform(-5, w + 5)     # some outside: clip_anchor clips
        cv[k] = rs.uniform(-5, h + 5)
    args = (pyr, jnp.asarray(level), jnp.asarray(cu), jnp.asarray(cv),
            win, n_levels)
    ref_w, ref_a, ref_hw = pack_level_windows(*args)
    with forced_interpret():
        out_w, out_a, out_hw = pack_level_windows(*args)
    np.testing.assert_allclose(np.asarray(out_w), np.asarray(ref_w), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_a[0]), np.asarray(ref_a[0]))
    np.testing.assert_array_equal(np.asarray(out_a[1]), np.asarray(ref_a[1]))
    np.testing.assert_array_equal(np.asarray(out_hw[0]), np.asarray(ref_hw[0]))


# ---------------------------------------------------------------- align


_ALIGN_CACHE: dict = {}


def _align_problem_cached(pyr, s=64, seed=2):
    """One problem instance per (s, seed): the empty-mask test reuses the
    parity test's shapes so its align/kernel traces hit the jit cache
    instead of recompiling (~60 s saved on a contended suite run)."""
    key = (s, seed)
    if key not in _ALIGN_CACHE:
        _ALIGN_CACHE[key] = _align_problem(pyr, s=s, seed=seed)
    return _ALIGN_CACHE[key]


def _align_problem(pyr, s=64, seed=2):
    """Candidates mixing corners/edgelets, border/far/invalid rows, on mixed
    pyramid levels — the exact input contract of the matcher glue."""
    from hso_tpu.ops.epipolar import pack_level_windows

    rs = np.random.RandomState(seed)
    n_levels = 3
    level = rs.randint(0, n_levels, s).astype(np.int32)
    px_true = np.empty((s, 2), np.float32)
    for k in range(s):
        h, w = pyr[level[k]].shape
        px_true[k] = [rs.uniform(16, w - 16), rs.uniform(16, h - 16)]
    # adversarial rows
    px_true[0] = [8.2, 8.7]          # near the image border
    px_true[1] = [2.0, 2.0]          # patch outside the image => must fail
    is_edge = (rs.rand(s) < 0.3)
    theta = rs.uniform(0, 2 * np.pi, s).astype(np.float32)
    direction = np.stack([np.cos(theta), np.sin(theta)], -1).astype(np.float32)
    valid = np.ones(s, bool)
    valid[2] = False                  # dead slot
    offset = rs.uniform(-1.2, 1.2, (s, 2)).astype(np.float32)
    offset[3] = [30.0, -28.0]         # hopeless init: must not converge
    px_init = (px_true + offset).astype(np.float32)

    # template: 10x10 bordered patch sampled around px_true at its level
    ref_border = np.empty((s, 10, 10), np.float32)
    for lvl in range(n_levels):
        sel = level == lvl
        if not sel.any():
            continue
        img = pyr[lvl]
        h, w = img.shape
        cu = jnp.asarray(px_true[sel, 0])
        cv = jnp.asarray(px_true[sel, 1])
        au, av = clip_anchor(cu, cv, 24, 10, h, w)
        wins = extract_windows_xla(img, au, av, 24)
        rb = bilinear_grid(wins, cu - 5.0 - au, cv - 5.0 - av, 10)
        ref_border[sel] = np.asarray(rb)

    windows, anchors, img_hw = pack_level_windows(
        pyr, jnp.asarray(level), jnp.asarray(px_init[:, 0]),
        jnp.asarray(px_init[:, 1]), 24, n_levels)
    return dict(
        is_edge=jnp.asarray(is_edge), direction=jnp.asarray(direction),
        ref_border=jnp.asarray(ref_border), px_init=jnp.asarray(px_init),
        valid=jnp.asarray(valid), windows=windows, anchors=anchors,
        img_hw=img_hw)


def test_align_match_parity(pyr):
    from hso_tpu.ops.align import align_mixed, ncc
    from hso_tpu.ops.align_pallas import align_match_tpu
    from hso_tpu.ops.gatherless import sample_gradient_in_windows

    p = _align_problem_cached(pyr)
    # XLA twin (the matcher's CPU branch, track/matcher.py:104-115)
    rm = align_mixed(p["is_edge"], p["direction"], p["ref_border"],
                     p["px_init"], n_iter=10, valid=p["valid"],
                     windows=p["windows"], anchors=p["anchors"],
                     img_hw=p["img_hw"])
    score_ref = ncc(p["ref_border"][:, 1:9, 1:9], rm["cur_patch"])
    gx_ref, gy_ref = sample_gradient_in_windows(
        p["windows"], p["anchors"][0], p["anchors"][1],
        rm["px"][:, 0], rm["px"][:, 1])
    with forced_interpret():
        out8 = align_match_tpu(
            p["is_edge"], p["direction"], p["ref_border"], p["px_init"],
            p["valid"], p["windows"], p["anchors"][0], p["anchors"][1],
            p["img_hw"][0], p["img_hw"][1], win=24, n_iter=10)
    out8 = np.asarray(out8)
    conv_ref = np.asarray(rm["converged"])
    np.testing.assert_array_equal(out8[2] > 0.5, conv_ref)
    assert conv_ref.sum() > 40           # the problem is genuinely solvable
    assert not conv_ref[[1, 2, 3]].any() # adversarial rows must fail
    px_ref = np.asarray(rm["px"])
    np.testing.assert_allclose(out8[0], px_ref[:, 0], atol=5e-3)
    np.testing.assert_allclose(out8[1], px_ref[:, 1], atol=5e-3)
    m = conv_ref
    np.testing.assert_allclose(out8[3][m], np.asarray(score_ref)[m], atol=1e-3)
    np.testing.assert_allclose(out8[4][m], np.asarray(gx_ref)[m], atol=2e-2)
    np.testing.assert_allclose(out8[5][m], np.asarray(gy_ref)[m], atol=2e-2)
    np.testing.assert_allclose(out8[6][m], np.asarray(rm["chi2"])[m],
                               rtol=1e-2, atol=1e-2)


def test_align_match_empty_mask(pyr):
    from hso_tpu.ops.align import align_mixed
    from hso_tpu.ops.align_pallas import align_match_tpu

    p = _align_problem_cached(pyr)
    dead = jnp.zeros_like(p["valid"])
    rm = align_mixed(p["is_edge"], p["direction"], p["ref_border"],
                     p["px_init"], n_iter=10, valid=dead,
                     windows=p["windows"], anchors=p["anchors"],
                     img_hw=p["img_hw"])
    with forced_interpret():
        out8 = align_match_tpu(
            p["is_edge"], p["direction"], p["ref_border"], p["px_init"],
            dead, p["windows"], p["anchors"][0], p["anchors"][1],
            p["img_hw"][0], p["img_hw"][1], win=24, n_iter=10)
    assert not np.asarray(rm["converged"]).any()
    assert not (np.asarray(out8)[2] > 0.5).any()
    np.testing.assert_allclose(np.asarray(out8)[0],
                               np.asarray(p["px_init"])[:, 0], atol=1e-6)


# ---------------------------------------------------------------- epipolar


def test_zmncc_line_search_parity(pyr):
    from hso_tpu.ops.epipolar import epipolar_zmncc_search, pack_level_windows

    rs = np.random.RandomState(7)
    s, n_levels = 48, 3
    level = rs.randint(0, n_levels, s).astype(np.int32)
    center = np.empty((s, 2), np.float32)
    for k in range(s):
        h, w = pyr[level[k]].shape
        center[k] = [rs.uniform(30, w - 30), rs.uniform(30, h - 30)]
    center[0] = [6.0, 6.0]            # window clipped at the image corner
    theta = rs.uniform(0, 2 * np.pi, s)
    d = np.stack([np.cos(theta), np.sin(theta)], -1).astype(np.float32)
    half = rs.uniform(0.0, 16.0, s).astype(np.float32)
    half[1] = 0.0                     # degenerate: zero-length epl
    px_far = (center - d * half[:, None]).astype(np.float32)
    px_close = (center + d * half[:, None]).astype(np.float32)
    valid = np.ones(s, bool)
    valid[2] = False

    windows, anchors, img_hw = pack_level_windows(
        pyr, jnp.asarray(level), jnp.asarray(center[:, 0]),
        jnp.asarray(center[:, 1]), 48, n_levels)
    # templates: true 8x8 patches at the centre => a real correlation peak
    au, av = anchors
    ref_patch = bilinear_grid(
        windows, jnp.asarray(center[:, 0]) - 4.0 - au,
        jnp.asarray(center[:, 1]) - 4.0 - av, 8)

    args = (windows, anchors, img_hw, ref_patch, jnp.asarray(px_far),
            jnp.asarray(px_close), jnp.asarray(valid))
    ref = epipolar_zmncc_search(*args, n_steps=40)
    with forced_interpret():
        out = epipolar_zmncc_search(*args, n_steps=40)

    np.testing.assert_array_equal(np.asarray(out["n_line"]),
                                  np.asarray(ref["n_line"]))
    sb_ref = np.asarray(ref["score_best"])
    sb_out = np.asarray(out["score_best"])
    finite = np.isfinite(sb_ref)
    np.testing.assert_array_equal(np.isfinite(sb_out), finite)
    np.testing.assert_allclose(sb_out[finite], sb_ref[finite], atol=2e-4)
    # identical step index (ties broken the same way) => identical px
    np.testing.assert_array_equal(np.asarray(out["ok"]), np.asarray(ref["ok"]))
    okm = np.asarray(ref["ok"])
    assert okm.sum() > 30
    np.testing.assert_allclose(np.asarray(out["px_best"])[okm],
                               np.asarray(ref["px_best"])[okm], atol=1e-4)
    ss_ref = np.asarray(ref["score_second"])
    ss_out = np.asarray(out["score_second"])
    f2 = np.isfinite(ss_ref)
    np.testing.assert_allclose(ss_out[f2], ss_ref[f2], atol=2e-4)


# ---------------------------------------------------------------- coarse LM


def test_coarse_tracker_ic_parity(scene):
    from hso_tpu.track.coarse_tracker import make_coarse_tracker

    T_gt = se3np.exp(np.array([0.04, -0.03, 0.02, 0.01, -0.015, 0.008]))
    ref_pyr = build_frame_pyramids(jnp.asarray(scene.render()),
                                   n_pyr_levels=3, n_total_levels=5)["pyr"]
    cur_pyr = build_frame_pyramids(jnp.asarray(scene.render(T_gt)),
                                   n_pyr_levels=3, n_total_levels=5)["pyr"]
    px, f, dist = scene.grid_features(step=32, border=32)
    n_max = 256
    px_p = np.zeros((n_max, 2), np.float32)
    f_p = np.zeros((n_max, 3), np.float32)
    f_p[:, 2] = 1.0
    d_p = np.full((n_max,), -1.0, np.float32)
    px_p[: len(px)] = px
    f_p[: len(px)] = f
    d_p[: len(px)] = dist
    T0 = se3np.identity().astype(np.float32)

    def run():
        track = make_coarse_tracker(scene.cam, inverse=True)
        out = track(ref_pyr, cur_pyr, px_p, f_p, d_p, T0, 1.0)
        return jax.tree.map(np.asarray, out)

    ref = run()
    with forced_interpret():
        out = run()

    # both paths must solve the problem and agree on the solution; LM
    # accept/reject trajectories may differ by f32 reduction order, so the
    # contract is agreement of the *converged state*, not the iterate path
    for r in (ref, out):
        err = se3np.log(se3np.mul(np.asarray(r["T_cur_ref"], np.float64),
                                  se3np.inv(T_gt)))
        assert np.linalg.norm(err) < 4e-3, err
    d_T = se3np.log(se3np.mul(np.asarray(out["T_cur_ref"], np.float64),
                              se3np.inv(np.asarray(ref["T_cur_ref"],
                                                   np.float64))))
    assert np.linalg.norm(d_T) < 1e-3, d_T
    assert abs(float(out["exposure_ratio"]) - float(ref["exposure_ratio"])) < 1e-3
    assert int(out["n_tracked"]) == int(ref["n_tracked"])
    np.testing.assert_allclose(out["energy"], ref["energy"], rtol=0.05)


# ---------------------------------------------------------------- pose LM


def test_pose_lm_parity():
    from hso_tpu.track.pose_optimizer import optimize_pose

    rs = np.random.RandomState(11)
    n = 256
    n_live = 180
    p_world = np.stack([rs.uniform(-2, 2, n), rs.uniform(-1.5, 1.5, n),
                        rs.uniform(1.5, 4.0, n)], -1).astype(np.float32)
    T_true = se3np.exp(np.array([0.05, -0.02, 0.03, 0.01, 0.02, -0.015]))
    T0 = se3np.identity().astype(np.float32)
    p_c = (T_true[:3, :3] @ p_world.T).T + T_true[:3, 3]
    f_obs = p_c / np.linalg.norm(p_c, axis=-1, keepdims=True)
    f_obs += rs.normal(0, 5e-4, f_obs.shape)
    f_obs[n_live - 3, 0] += 0.1        # gross outlier (~40 px at f=400)
    f_obs /= np.linalg.norm(f_obs, axis=-1, keepdims=True)
    level = rs.randint(0, 3, n).astype(np.int32)
    theta = rs.uniform(0, 2 * np.pi, n)
    grad = np.stack([np.cos(theta), np.sin(theta)], -1).astype(np.float32)
    is_edge = rs.rand(n) < 0.3
    is_temp = rs.rand(n) < 0.1
    valid = np.arange(n) < n_live

    args = (jnp.asarray(T0), jnp.asarray(p_world),
            jnp.asarray(f_obs.astype(np.float32)), jnp.asarray(level),
            jnp.asarray(grad), jnp.asarray(is_edge), jnp.asarray(is_temp),
            jnp.asarray(valid))
    ref = jax.tree.map(np.asarray, optimize_pose(*args, focal=400.0))
    with forced_interpret():
        out = jax.tree.map(np.asarray, optimize_pose(*args, focal=400.0))

    for r in (ref, out):
        err = se3np.log(se3np.mul(np.asarray(r["T_f_w"], np.float64),
                                  se3np.inv(T_true)))
        assert np.linalg.norm(err) < 6e-3, err
    d_T = se3np.log(se3np.mul(np.asarray(out["T_f_w"], np.float64),
                              se3np.inv(np.asarray(ref["T_f_w"], np.float64))))
    assert np.linalg.norm(d_T) < 5e-4, d_T
    # inlier classification may flip only on residuals at the threshold
    agree = (out["inlier"] == ref["inlier"]).mean()
    assert agree > 0.98, agree
    assert not out["inlier"][n_live - 3] and not ref["inlier"][n_live - 3]
    np.testing.assert_allclose(out["err_final_px"], ref["err_final_px"],
                               rtol=0.05, atol=1e-3)


def test_pose_lm_empty_mask():
    from hso_tpu.track.pose_optimizer import optimize_pose

    n = 128
    T0 = se3np.identity().astype(np.float32)
    z = np.zeros((n,), np.float32)
    args = (jnp.asarray(T0), jnp.zeros((n, 3), jnp.float32),
            jnp.asarray(np.tile([0.0, 0.0, 1.0], (n, 1)).astype(np.float32)),
            jnp.zeros((n,), jnp.int32), jnp.zeros((n, 2), jnp.float32),
            jnp.asarray(z > 1), jnp.asarray(z > 1), jnp.asarray(z > 1))
    ref = jax.tree.map(np.asarray, optimize_pose(*args, focal=400.0))
    with forced_interpret():
        out = jax.tree.map(np.asarray, optimize_pose(*args, focal=400.0))
    # no observations: the pose must come back unchanged on both paths
    np.testing.assert_allclose(ref["T_f_w"], T0, atol=1e-6)
    np.testing.assert_allclose(out["T_f_w"], T0, atol=1e-6)
    assert int(out["n_inliers"]) == 0 and int(ref["n_inliers"]) == 0
