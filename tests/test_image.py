import cv2
import numpy as np
import jax.numpy as jnp
from scipy.ndimage import map_coordinates

from hso_tpu.image.interp import bilinear, bilinear_with_grad, patch_values
from hso_tpu.image.pyramid import build_frame_pyramids, half_sample, remap_bilinear, sobel5


def checker_image(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    img = cv2.GaussianBlur(img, (5, 5), 1.5)
    return img


def test_half_sample_matches_box_mean():
    img = checker_image().astype(np.float32)
    out = np.asarray(half_sample(jnp.asarray(img)))
    ref = img.reshape(48, 2, 64, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_sobel5_matches_opencv():
    img = checker_image().astype(np.float32)
    gx, gy = sobel5(jnp.asarray(img))
    gx_cv = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=5, borderType=cv2.BORDER_REPLICATE)
    gy_cv = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=5, borderType=cv2.BORDER_REPLICATE)
    np.testing.assert_allclose(np.asarray(gx), gx_cv, atol=1e-2)
    np.testing.assert_allclose(np.asarray(gy), gy_cv, atol=1e-2)


def test_build_frame_pyramids_shapes_and_stats():
    img = checker_image(480, 752)
    out = build_frame_pyramids(jnp.asarray(img), n_pyr_levels=3, n_total_levels=5)
    assert len(out["pyr"]) == 5
    assert out["pyr"][0].shape == (480, 752)
    assert out["pyr"][4].shape == (30, 47)
    assert len(out["sobel_x"]) == 3
    gm = float(out["grad_mean"])
    assert 7.0 <= gm <= 20.0
    im = float(out["intensity_mean"])
    assert 0.0 < im < 255.0


def test_bilinear_matches_scipy():
    img = checker_image().astype(np.float32)
    rng = np.random.default_rng(1)
    u = rng.uniform(2, 125, 300).astype(np.float32)
    v = rng.uniform(2, 93, 300).astype(np.float32)
    out = np.asarray(bilinear(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v)))
    ref = map_coordinates(img, [v, u], order=1)
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_bilinear_grad_is_central_difference():
    img = checker_image().astype(np.float32)
    u = jnp.asarray([30.3, 64.7])
    v = jnp.asarray([40.1, 20.9])
    _, dx, dy = bilinear_with_grad(jnp.asarray(img), u, v)
    ref_dx = 0.5 * (
        map_coordinates(img, [np.asarray(v), np.asarray(u) + 1], order=1)
        - map_coordinates(img, [np.asarray(v), np.asarray(u) - 1], order=1)
    )
    np.testing.assert_allclose(np.asarray(dx), ref_dx, atol=1e-3)
    assert np.all(np.isfinite(np.asarray(dy)))


def test_patch_values_layout():
    img = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
    offsets = jnp.asarray([[0, 0], [1, 0], [0, 1]], dtype=jnp.int32)
    vals = patch_values(img, jnp.asarray([3.0]), jnp.asarray([2.0]), offsets)
    # I(u=3,v=2) = 23; offset x+1 -> 24; offset y+1 -> 33
    np.testing.assert_allclose(np.asarray(vals)[0], [23.0, 24.0, 33.0])


def test_remap_matches_opencv():
    img = checker_image().astype(np.float32)
    h, w = img.shape
    rng = np.random.default_rng(2)
    map_x = (np.tile(np.arange(w, dtype=np.float32), (h, 1)) + rng.uniform(-1, 1, (h, w))).astype(np.float32)
    map_y = (np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w)) + rng.uniform(-1, 1, (h, w))).astype(np.float32)
    out = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(map_x), jnp.asarray(map_y)))
    ref = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR, borderMode=cv2.BORDER_REPLICATE)
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(out[interior], ref[interior], atol=1e-2)
