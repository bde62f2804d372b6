import cv2
import numpy as np
import jax.numpy as jnp

from hso_tpu.image.pyramid import build_frame_pyramids
from hso_tpu.ops.detect import (
    CORNER,
    EDGELET,
    FAST_RING,
    detect_features,
    edgelet_map,
    fast9_mask,
    occupancy_grid,
    shi_tomasi_map,
)


def fast9_oracle(img, t):
    """Straightforward per-pixel FAST-9 segment test."""
    h, w = img.shape
    out = np.zeros((h, w), bool)
    for v in range(3, h - 3):
        for u in range(3, w - 3):
            c = img[v, u]
            ring = np.array([img[v + dy, u + dx] for dx, dy in FAST_RING], np.float64)
            for mask in (ring > c + t, ring < c - t):
                m2 = np.concatenate([mask, mask])
                run = best = 0
                for b in m2:
                    run = run + 1 if b else 0
                    best = max(best, run)
                if best >= 9:
                    out[v, u] = True
    return out


def shi_tomasi_oracle(img, u, v):
    """Transcription of vikit/vision.cpp:111-152."""
    dxx = dyy = dxy = 0.0
    for y in range(v - 4, v + 4):
        for x in range(u - 4, u + 4):
            dx = float(img[y, x + 1]) - float(img[y, x - 1])
            dy = float(img[y + 1, x]) - float(img[y - 1, x])
            dxx += dx * dx
            dyy += dy * dy
            dxy += dx * dy
    n = 1.0 / (2.0 * 64.0)
    dxx, dyy, dxy = dxx * n, dyy * n, dxy * n
    return 0.5 * (dxx + dyy - np.sqrt((dxx + dyy) ** 2 - 4 * (dxx * dyy - dxy * dxy)))


def test_fast9_matches_oracle():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (48, 64)).astype(np.float32)
    out = np.asarray(fast9_mask(jnp.asarray(img), 20.0))
    ref = fast9_oracle(img, 20.0)
    np.testing.assert_array_equal(out, ref)


def test_shi_tomasi_matches_oracle():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (40, 50)).astype(np.float32)
    st = np.asarray(shi_tomasi_map(jnp.asarray(img)))
    for u, v in [(10, 10), (25, 20), (40, 30)]:
        assert abs(st[v, u] - shi_tomasi_oracle(img, u, v)) < 1e-2


def test_edgelet_on_step_edge():
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 200.0
    gx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=5, borderType=cv2.BORDER_REPLICATE)
    gy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=5, borderType=cv2.BORDER_REPLICATE)
    strength, _, _ = edgelet_map(jnp.asarray(gx), jnp.asarray(gy), 7.0)
    s = np.asarray(strength)
    # the vertical edge column should be detected, flat regions not
    assert s[32, 31:33].max() > 0
    assert s[:, :20].max() == 0 and s[:, 44:].max() == 0


def corner_test_image(h=240, w=320, step=40):
    """Bright rectangles on dark: strong unambiguous corners."""
    img = np.full((h, w), 30, np.float32)
    for y in range(20, h - step, step):
        for x in range(20, w - step, step):
            img[y : y + step // 2, x : x + step // 2] = 220.0
    return img


def test_detect_finds_rectangle_corners():
    img = corner_test_image()
    out = build_frame_pyramids(jnp.asarray(img.astype(np.uint8)))
    occ = jnp.zeros((-(-240 // 32), -(-320 // 32)), bool)
    # single level: check corner localization precisely
    det = detect_features(
        out["pyr"][:3], out["sobel_x"], out["sobel_y"], out["grad_mean"], occ,
        n_levels=1, n_out=128,
    )
    valid = np.asarray(det["valid"])
    assert valid.sum() > 20
    px = np.asarray(det["px"])[valid]
    species = np.asarray(det["species"])[valid]
    assert (species == CORNER).sum() > 10
    corners_gt = []
    for y in range(20, 200, 40):
        for x in range(20, 280, 40):
            corners_gt += [(x, y), (x + 19, y), (x, y + 19), (x + 19, y + 19)]
    corners_gt = np.array(corners_gt, np.float64)
    cpx = px[species == CORNER]
    d = np.linalg.norm(cpx[:, None, :] - corners_gt[None, :, :], axis=-1).min(axis=1)
    assert np.median(d) < 3.0, d

    # multi-level: still yields a healthy feature set (levels may compete)
    det3 = detect_features(
        out["pyr"][:3], out["sobel_x"], out["sobel_y"], out["grad_mean"], occ,
        n_levels=3, n_out=128,
    )
    assert np.asarray(det3["valid"]).sum() > 20


def test_detect_respects_occupancy():
    img = corner_test_image()
    out = build_frame_pyramids(jnp.asarray(img.astype(np.uint8)))
    cy, cx = -(-240 // 32), -(-320 // 32)
    det0 = detect_features(
        out["pyr"][:3], out["sobel_x"], out["sobel_y"], out["grad_mean"],
        jnp.zeros((cy, cx), bool), n_out=128,
    )
    # occupy every cell: nothing should be detected
    det1 = detect_features(
        out["pyr"][:3], out["sobel_x"], out["sobel_y"], out["grad_mean"],
        jnp.ones((cy, cx), bool), n_out=128,
    )
    assert np.asarray(det0["valid"]).sum() > 0
    assert np.asarray(det1["valid"]).sum() == 0


def test_occupancy_grid():
    px = jnp.asarray([[10.0, 10.0], [100.0, 50.0], [0.0, 0.0]])
    valid = jnp.asarray([True, True, False])
    grid = occupancy_grid(px, valid, 240, 320, 32)
    g = np.asarray(grid)
    assert g[0, 0] and g[1, 3]
    assert g.sum() == 2


def test_edgelets_on_texture():
    """A diagonal stripe pattern: expect edgelets with sensible normals."""
    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w]
    img = (127 + 120 * np.sign(np.sin((xx + yy) * 2 * np.pi / 24))).astype(np.uint8)
    out = build_frame_pyramids(jnp.asarray(img))
    cy, cx = -(-h // 32), -(-w // 32)
    det = detect_features(
        out["pyr"][:3], out["sobel_x"], out["sobel_y"], out["grad_mean"],
        jnp.zeros((cy, cx), bool), n_out=256,
    )
    valid = np.asarray(det["valid"])
    species = np.asarray(det["species"])[valid]
    grad = np.asarray(det["grad"])[valid]
    edg = grad[species == EDGELET]
    assert len(edg) > 5
    # normals should be along ±(1,1)/sqrt2
    dots = np.abs(edg @ (np.ones(2) / np.sqrt(2)))
    assert np.median(dots) > 0.95


def _low_texture_scene():
    """Smooth sinusoidal shading: no FAST corner anywhere, Sobel magnitude
    below the edgelet Canny-high threshold (70·minThresh) at every level,
    but above the gradient-species floor (20·minThresh) — only gradDetectST
    semantics (feature_detection.cpp:609-664) can populate this scene."""
    from hso_tpu.cameras import PinholeCamera
    from hso_tpu.utils.synthetic import PlaneScene

    ts = 1024
    yy, xx = np.mgrid[0:ts, 0:ts]
    tex = 127 + 8.0 * np.sin(2 * np.pi * xx / 300) * np.sin(2 * np.pi * yy / 300)
    cam = PinholeCamera(320, 240, 200.0, 200.0, 160.0, 120.0)
    return PlaneScene(cam, z0=2.0, extent=2.0, tex=tex)


def test_gradient_species_low_texture():
    from hso_tpu.ops.detect import GRADIENT

    scene = _low_texture_scene()
    out = build_frame_pyramids(jnp.asarray(scene.render()))
    cy, cx = -(-240 // 32), -(-320 // 32)
    occ = jnp.zeros((cy, cx), bool)
    args = (out["pyr"][:3], out["sobel_x"], out["sobel_y"], out["grad_mean"], occ)

    det_off = detect_features(*args, n_out=256, with_gradient=False)
    assert int(np.asarray(det_off["valid"]).sum()) == 0

    det_on = detect_features(*args, n_out=256, with_gradient=True)
    valid = np.asarray(det_on["valid"])
    species = np.asarray(det_on["species"])[valid]
    assert valid.sum() > 30
    assert (species == GRADIENT).all()
    # gradient normals are unit and meaningful (the shading is smooth)
    grad = np.asarray(det_on["grad"])[valid]
    np.testing.assert_allclose(np.linalg.norm(grad, axis=-1), 1.0, atol=1e-3)


def test_gradient_species_never_displaces_other_species():
    """On textured input the gradient pass only fills otherwise-empty cells:
    the corner/edgelet feature set must be identical with it on or off."""
    img = corner_test_image()
    out = build_frame_pyramids(jnp.asarray(img.astype(np.uint8)))
    cy, cx = -(-240 // 32), -(-320 // 32)
    occ = jnp.zeros((cy, cx), bool)
    args = (out["pyr"][:3], out["sobel_x"], out["sobel_y"], out["grad_mean"], occ)
    det_on = detect_features(*args, n_out=256, with_gradient=True)
    det_off = detect_features(*args, n_out=256, with_gradient=False)
    from hso_tpu.ops.detect import GRADIENT

    sp_on = np.asarray(det_on["species"])
    keep = np.asarray(det_on["valid"]) & (sp_on != GRADIENT)
    px_on = {tuple(p) for p in np.asarray(det_on["px"])[keep].tolist()}
    v_off = np.asarray(det_off["valid"])
    px_off = {tuple(p) for p in np.asarray(det_off["px"])[v_off].tolist()}
    assert px_off == px_on


def test_gradient_species_carries_tracking():
    """The VERDICT-r4 scenario: a texture-poor scene is trackable only when
    gradient features are on (without them detection returns zero features,
    so there is nothing to track at all)."""
    from hso_tpu.math import se3np
    from hso_tpu.track.coarse_tracker import make_coarse_tracker

    scene = _low_texture_scene()
    img_ref = scene.render()
    T_gt = se3np.exp(np.array([0.02, -0.015, 0.01, 0.004, -0.006, 0.003]))
    img_cur = scene.render(T_gt)

    ref = build_frame_pyramids(jnp.asarray(img_ref), n_pyr_levels=3,
                               n_total_levels=5)
    cur = build_frame_pyramids(jnp.asarray(img_cur), n_pyr_levels=3,
                               n_total_levels=5)
    cy, cx = -(-240 // 32), -(-320 // 32)
    det = detect_features(
        ref["pyr"][:3], ref["sobel_x"], ref["sobel_y"], ref["grad_mean"],
        jnp.zeros((cy, cx), bool), n_out=256, with_gradient=True)
    valid = np.asarray(det["valid"])
    px = np.asarray(det["px"], np.float64)

    n_max = 256
    px_p = np.zeros((n_max, 2), np.float32)
    f_p = np.zeros((n_max, 3), np.float32)
    f_p[:, 2] = 1.0
    d_p = np.full((n_max,), -1.0, np.float32)
    n = int(valid.sum())
    px_p[:n] = px[valid]
    f_p[:n] = scene.cam.cam2world(px[valid])
    d_p[:n] = scene.depth_along_ray(px[valid])

    track = make_coarse_tracker(scene.cam, inverse=False)
    out = track(ref["pyr"], cur["pyr"], px_p, f_p, d_p,
                se3np.identity().astype(np.float32), 1.0)
    assert int(out["n_tracked"]) > 30
    err = se3np.log(se3np.mul(np.asarray(out["T_cur_ref"], np.float64),
                              se3np.inv(T_gt)))
    assert np.linalg.norm(err) < 5e-3, err
