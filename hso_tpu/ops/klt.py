"""Batched pyramidal KLT tracking (bootstrap feature tracking).

Replaces the reference's ``cv::calcOpticalFlowPyrLK`` call in the two-frame
initializer (/root/reference/src/initialization.cpp:225-299, 30×30 window,
4 levels): coarse-to-fine template alignment of all features at once using
the batched align2D kernel (8×8 patches, two refinement sweeps per level).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hso_tpu.ops.align import align2d, ncc
from hso_tpu.ops.gatherless import bilinear_grid, clip_anchor, extract_windows


def _templates(img, px_lvl):
    """10×10 bordered templates centred at px (one pyramid level)."""
    h, w = img.shape
    au, av = clip_anchor(px_lvl[:, 0], px_lvl[:, 1], 16, 10, h, w)
    wins = extract_windows(img, au, av, 16)
    rel_u = (px_lvl[:, 0] - 5.0) - au
    rel_v = (px_lvl[:, 1] - 5.0) - av
    return bilinear_grid(wins, rel_u, rel_v, 10)


@functools.partial(jax.jit, static_argnames=("n_levels", "n_sweeps"))
def track_klt(ref_pyr, cur_pyr, px_ref, valid, px_prior=None,
              n_levels: int = 4, n_sweeps: int = 2):
    """Track px_ref (N,2) from ref to cur, optionally starting from a motion
    prior (e.g. last frame's tracked positions). Returns dict(px_cur, ok, ncc)."""
    px_cur = px_ref if px_prior is None else px_prior
    for lvl in range(n_levels - 1, -1, -1):
        scale = 1.0 / (1 << lvl)
        tmpl = _templates(ref_pyr[lvl], px_ref * scale)
        for _ in range(n_sweeps):
            out = align2d(cur_pyr[lvl], tmpl, px_cur * scale, valid=valid)
            px_cur = jnp.where(
                out["converged"][:, None], out["px"] * float(1 << lvl), px_cur
            )
    # final verification at level 0
    tmpl0 = _templates(ref_pyr[0], px_ref)
    out0 = align2d(cur_pyr[0], tmpl0, px_cur, valid=valid)
    px_fin = jnp.where(out0["converged"][:, None], out0["px"], px_cur)
    score = ncc(tmpl0[:, 1:9, 1:9], out0["cur_patch"])
    ok = valid & out0["converged"] & (score > 0.6)
    return {"px_cur": px_fin, "ok": ok, "ncc": score}
