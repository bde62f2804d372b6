import cv2
import numpy as np
import jax.numpy as jnp
from scipy.ndimage import map_coordinates

from hso_tpu.cameras import PinholeCamera
from hso_tpu.math import se3np
from hso_tpu.ops.align import align1d, align2d, ncc
from hso_tpu.ops.warp import (
    best_search_level,
    warp_from_stored_windows,
    warp_matrices,
)
from hso_tpu.utils.synthetic import PlaneScene


def textured_image(h=160, w=200, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w)).astype(np.float32)
    return cv2.GaussianBlur(img, (0, 0), 1.5)


def ref_border_patches(img, px):
    """Extract 10x10 bordered templates at integer-ish centers."""
    out = []
    for u, v in px:
        gy, gx = np.mgrid[0:10, 0:10].astype(np.float64)
        out.append(map_coordinates(img, [v - 4 + gy - 1, u - 4 + gx - 1], order=1))
    return np.stack(out).astype(np.float32)


def test_align2d_recovers_shift():
    img = textured_image()
    rng = np.random.default_rng(1)
    n = 32
    px_true = np.stack(
        [rng.uniform(30, 170, n), rng.uniform(30, 130, n)], axis=-1
    )
    templates = ref_border_patches(img, px_true)
    # start up to 2.5px away
    px_init = px_true + rng.uniform(-2.5, 2.5, (n, 2))
    out = align2d(jnp.asarray(img), jnp.asarray(templates), jnp.asarray(px_init))
    conv = np.asarray(out["converged"])
    px = np.asarray(out["px"])
    assert conv.sum() > n * 0.8
    err = np.linalg.norm(px[conv] - px_true[conv], axis=-1)
    assert np.median(err) < 0.05, np.median(err)


def test_align2d_with_brightness_offset():
    img = textured_image()
    rng = np.random.default_rng(2)
    n = 16
    px_true = np.stack([rng.uniform(30, 170, n), rng.uniform(30, 130, n)], axis=-1)
    templates = ref_border_patches(img, px_true) + 25.0  # mean shift
    px_init = px_true + rng.uniform(-2, 2, (n, 2))
    out = align2d(jnp.asarray(img), jnp.asarray(templates), jnp.asarray(px_init))
    conv = np.asarray(out["converged"])
    assert conv.sum() > n * 0.7
    md = np.asarray(out["mean_diff"])[conv]
    assert np.median(np.abs(md - 25.0)) < 3.0  # res = cur - ref + mean_diff → md ≈ +25
    err = np.linalg.norm(np.asarray(out["px"])[conv] - px_true[conv], axis=-1)
    assert np.median(err) < 0.1


def test_align1d_moves_only_along_direction():
    img = textured_image()
    rng = np.random.default_rng(3)
    n = 16
    px_true = np.stack([rng.uniform(30, 170, n), rng.uniform(30, 130, n)], axis=-1)
    templates = ref_border_patches(img, px_true)
    d = np.tile(np.array([[1.0, 0.0]]), (n, 1))
    shift = rng.uniform(-2, 2, (n, 1)) * d  # displace along x only
    px_init = px_true + shift
    out = align1d(jnp.asarray(img), jnp.asarray(d), jnp.asarray(templates), jnp.asarray(px_init))
    conv = np.asarray(out["converged"])
    px = np.asarray(out["px"])
    assert conv.sum() > n * 0.7
    # y must be unchanged from the init (motion constrained to x)
    np.testing.assert_allclose(px[conv, 1], px_init[conv, 1], atol=1e-5)
    err = np.abs(px[conv, 0] - px_true[conv, 0])
    assert np.median(err) < 0.1


def test_align2d_rejects_garbage():
    img = textured_image()
    templates = np.random.default_rng(4).uniform(0, 255, (8, 10, 10)).astype(np.float32)
    px_init = np.tile(np.array([[100.0, 80.0]]), (8, 1))
    out = align2d(jnp.asarray(img), jnp.asarray(templates), jnp.asarray(px_init))
    # random templates shouldn't converge to sub-threshold chi2 everywhere
    scores = ncc(out["cur_patch"], jnp.asarray(templates[:, 1:9, 1:9]))
    assert np.asarray(scores).max() < 0.7


def test_ncc_basics():
    rng = np.random.default_rng(5)
    a = rng.normal(size=(4, 8, 8)).astype(np.float32)
    same = ncc(jnp.asarray(a), jnp.asarray(a * 2.0 + 7.0))  # affine invariance
    np.testing.assert_allclose(np.asarray(same), 1.0, atol=1e-5)
    b = rng.normal(size=(4, 8, 8)).astype(np.float32)
    cross = np.asarray(ncc(jnp.asarray(a), jnp.asarray(b)))
    assert np.all(np.abs(cross) < 0.6)


def test_warp_identity_recovers_patch():
    """Zero motion → A=I, search level 0, warped patch == direct patch."""
    cam = PinholeCamera(200, 160, 120.0, 120.0, 100.0, 80.0)
    img = textured_image()
    n = 8
    rng = np.random.default_rng(6)
    px = np.stack([rng.uniform(40, 160, n), rng.uniform(40, 120, n)], axis=-1)
    f = cam.cam2world(px)
    depth = np.full(n, 2.0)
    T = np.tile(se3np.identity()[None], (n, 1, 1)).astype(np.float32)
    A, px_cur = warp_matrices(cam, cam, jnp.asarray(px, jnp.float32), jnp.asarray(f, jnp.float32),
                              jnp.asarray(depth, jnp.float32), jnp.asarray(T), 0)
    np.testing.assert_allclose(np.asarray(A), np.tile(np.eye(2), (n, 1, 1)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(px_cur), px, atol=1e-3)
    lvl = best_search_level(A, 2)
    assert np.all(np.asarray(lvl) == 0)
    # production path: memoized host window → warped bordered patch
    from hso_tpu.math.linalg_small import inv2x2
    from hso_tpu.ops.gatherless import clip_anchor, extract_windows

    au, av = clip_anchor(
        jnp.asarray(px[:, 0], jnp.float32), jnp.asarray(px[:, 1], jnp.float32),
        24, 0, img.shape[0], img.shape[1],
    )
    wins = extract_windows(jnp.asarray(img), au, av, 24)
    patches = warp_from_stored_windows(
        wins, jnp.stack([au, av], -1), jnp.asarray(px, jnp.float32),
        jnp.zeros(n, jnp.int32), inv2x2(A), lvl,
    )
    ref = ref_border_patches(img, px)
    np.testing.assert_allclose(np.asarray(patches), ref, atol=0.1)


def test_warp_scale_change():
    """Camera twice as close → warp determinant ≈ 4 → search level 1."""
    cam = PinholeCamera(200, 160, 120.0, 120.0, 100.0, 80.0)
    n = 4
    px = np.tile(np.array([[100.0, 80.0]]), (n, 1))
    f = cam.cam2world(px)
    depth = np.full(n, 2.0)
    # camera moves 1m toward the scene: ref depth 2 becomes 1 in cur
    T = np.tile(se3np.exp(np.r_[0, 0, -1.0, 0, 0, 0])[None], (n, 1, 1)).astype(np.float32)
    A, _ = warp_matrices(cam, cam, jnp.asarray(px, jnp.float32), jnp.asarray(f, jnp.float32),
                         jnp.asarray(depth, jnp.float32), jnp.asarray(T), 0)
    D = np.linalg.det(np.asarray(A))
    assert np.all(np.abs(D - 4.0) < 0.3), D
    lvl = best_search_level(A, 2)
    assert np.all(np.asarray(lvl) == 1)
