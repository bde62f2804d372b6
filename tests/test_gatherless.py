import numpy as np
import jax.numpy as jnp
from scipy.ndimage import map_coordinates

from hso_tpu.ops.gatherless import (
    bilinear_grid,
    clip_anchor,
    extract_windows,
    grid_in_window,
    sample_points,
)


def image(h=120, w=160, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w)).astype(np.float32)


def test_extract_windows_exact():
    img = image()
    rng = np.random.default_rng(1)
    au = rng.integers(0, 160 - 24, 64).astype(np.int32)
    av = rng.integers(0, 120 - 24, 64).astype(np.int32)
    out = np.asarray(extract_windows(jnp.asarray(img), jnp.asarray(au), jnp.asarray(av), 24))
    ref = np.stack([img[v : v + 24, u : u + 24] for u, v in zip(au, av)])
    np.testing.assert_array_equal(out, ref)


def test_bilinear_grid_matches_mapcoords():
    img = image()
    rng = np.random.default_rng(2)
    au = rng.integers(0, 160 - 24, 32).astype(np.int32)
    av = rng.integers(0, 120 - 24, 32).astype(np.int32)
    wins = extract_windows(jnp.asarray(img), jnp.asarray(au), jnp.asarray(av), 24)
    ru = rng.uniform(1.0, 12.0, 32).astype(np.float32)
    rv = rng.uniform(1.0, 12.0, 32).astype(np.float32)
    G = 7
    out = np.asarray(bilinear_grid(wins, jnp.asarray(ru), jnp.asarray(rv), G))
    for n in range(32):
        gy, gx = np.mgrid[0:G, 0:G].astype(np.float64)
        ref = map_coordinates(
            np.asarray(wins)[n], [rv[n] + gy, ru[n] + gx], order=1
        )
        np.testing.assert_allclose(out[n], ref, atol=1e-3)


def test_grid_in_window_bounds():
    assert bool(grid_in_window(jnp.float32(0.0), jnp.float32(0.0), 7, 24))
    assert bool(grid_in_window(jnp.float32(17.0), jnp.float32(17.0), 7, 24))
    assert not bool(grid_in_window(jnp.float32(17.5), jnp.float32(2.0), 7, 24))
    assert not bool(grid_in_window(jnp.float32(-0.5), jnp.float32(2.0), 7, 24))


def test_clip_anchor_keeps_window_inside():
    u = jnp.asarray([0.0, 159.0, 80.0])
    v = jnp.asarray([0.0, 119.0, 60.0])
    au, av = clip_anchor(u, v, 24, 7, 120, 160)
    assert np.all(np.asarray(au) >= 0) and np.all(np.asarray(au) <= 160 - 24)
    assert np.all(np.asarray(av) >= 0) and np.all(np.asarray(av) <= 120 - 24)


def test_sample_points_matches_mapcoords():
    img = image()
    rng = np.random.default_rng(3)
    u = rng.uniform(1, 158, 200).astype(np.float32)
    v = rng.uniform(1, 118, 200).astype(np.float32)
    out = np.asarray(sample_points(jnp.asarray(img), jnp.asarray(u), jnp.asarray(v)))
    ref = map_coordinates(img, [v, u], order=1)
    np.testing.assert_allclose(out, ref, atol=1e-3)
