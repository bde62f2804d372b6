"""Sliding-window bundle adjustment: a purpose-built Schur-complement LM
solver replacing the reference's g2o stack.

Re-designs ``ba::LocalBundleAdjustment`` + the custom g2o types
(/root/reference/src/bundle_adjustment.cpp:556-897,
/root/reference/include/hso/bundle_adjustment.h:185-404):

  * landmarks are 1-DoF inverse distances anchored at a host feature
    (``VertexSBAPointID``); residuals are unit-plane reprojections in the
    target frame, scalar along-normal for edgelets
    (``EdgeProjectID2UV(EdgeLet)``) with information 1/4^level,
  * keyframes older than the fixation horizon (or KF 0) are held fixed,
  * Huber deltas per class from the median of initial residuals
    (×1.4826; fallbacks 1.0/f and 0.5/f when a class is empty),
  * Levenberg-Marquardt with the landmark block eliminated analytically —
    H_pp is *scalar* per point, so the Schur reduction is a single
    (6K, P)·(P, 6K) MXU matmul, not a sparse factorization,
  * after the solve, observations are re-tested and stripped at 2.0 px
    (corners) / 1.2 px (edgelets).

Shapes are static: K keyframe slots, P point slots, E observation slots with
validity masks.  The per-iteration reduced-system build
(:func:`build_reduced_system`) is a pure function of the observation arrays —
the multi-host distributed BA shards points/observations across devices and
``psum``s its outputs (see ba/distributed.py).

Jacobians use this module's own convention (tangent [rho, phi], update
T ← exp(δ)·T) and are verified against ``jax.jacfwd`` in the tests rather
than transcribed from g2o.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hso_tpu.math import se3
from hso_tpu.math.robust import MAD_NORMALIZER, masked_median


def _project2d(p):
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
    return p[..., :2] / z[..., None]


def _dproj(p):
    """d project2d / d p: (..., 2, 3)."""
    x, y = p[..., 0], p[..., 1]
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-12, 1e-12, p[..., 2])
    zi = 1.0 / z
    zi2 = zi * zi
    zero = jnp.zeros_like(x)
    r0 = jnp.stack([zi, zero, -x * zi2], axis=-1)
    r1 = jnp.stack([zero, zi, -y * zi2], axis=-1)
    return jnp.stack([r0, r1], axis=-2)


def _hat(v):
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def residuals_and_jacobians(T_kf, idist, obs):
    """Per-observation residuals and analytic Jacobians.

    T_kf  : (K, 3, 4) world→kf poses
    idist : (P,) inverse distances
    obs   : dict with (E,) arrays — point, target, host, f_host (E,3),
            meas (E,2), grad (E,2), is_edgelet, level, valid

    Returns r (E,2) (edgelet residual in [:,0], [:,1]=0), J_rho (E,2),
    J_host (E,2,6), J_target (E,2,6), sqrt_info (E,).
    (Edgelet rows are pre-projected onto the normal.)
    """
    p_idx = obs["point"]
    t_idx = obs["target"]
    h_idx = obs["host"]
    fH = obs["f_host"]
    rho = idist[p_idx]
    rho_safe = jnp.where(jnp.abs(rho) < 1e-10, 1e-10, rho)

    T_t = T_kf[t_idx]
    T_h = T_kf[h_idx]
    T_th = se3.mul(T_t, se3.inv(T_h))
    q = fH / rho_safe[:, None]                       # host-frame point
    pT = se3.apply(T_th, q)                          # target-frame point
    proj = _project2d(pT)

    A = _dproj(pT)                                   # (E,2,3)
    R_th = T_th[..., :3, :3]
    # d pT / d rho = R_th · (-q / rho)
    dpT_drho = jnp.einsum("eij,ej->ei", R_th, -q / rho_safe[:, None])
    # d pT / d delta_target = [I | -pT^]
    dT_t = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), pT.shape[:-1] + (3, 3)), -_hat(pT)], axis=-1
    )
    # d pT / d delta_host = -R_th · [I | -q^]
    dT_h = -jnp.einsum(
        "eij,ejk->eik",
        R_th,
        jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), q.shape[:-1] + (3, 3)), -_hat(q)], axis=-1
        ),
    )

    # residual r = meas - proj ; d r/d x = -A · d pT/d x
    r2 = obs["meas"] - proj                          # (E,2)
    J_rho2 = -jnp.einsum("eij,ej->ei", A, dpT_drho)  # (E,2)
    J_h2 = -jnp.einsum("eij,ejk->eik", A, dT_h)      # (E,2,6)
    J_t2 = -jnp.einsum("eij,ejk->eik", A, dT_t)

    # edgelets: project residual & Jacobians onto the normal, scalar row 0
    g = obs["grad"]
    is_e = obs["is_edgelet"][:, None]
    r_e = jnp.sum(g * r2, axis=-1, keepdims=True)
    r = jnp.where(is_e, jnp.concatenate([r_e, jnp.zeros_like(r_e)], -1), r2)
    Je_rho = jnp.sum(g * J_rho2, axis=-1, keepdims=True)
    J_rho = jnp.where(is_e, jnp.concatenate([Je_rho, jnp.zeros_like(Je_rho)], -1), J_rho2)
    Je_h = jnp.einsum("ei,eik->ek", g, J_h2)[:, None, :]
    J_h = jnp.where(is_e[..., None], jnp.concatenate([Je_h, jnp.zeros_like(Je_h)], 1), J_h2)
    Je_t = jnp.einsum("ei,eik->ek", g, J_t2)[:, None, :]
    J_t = jnp.where(is_e[..., None], jnp.concatenate([Je_t, jnp.zeros_like(Je_t)], 1), J_t2)

    sqrt_info = 1.0 / (1 << obs["level"]).astype(jnp.float32)
    return r, J_rho, J_h, J_t, sqrt_info


def robust_weights(r, is_edgelet, valid, sqrt_info, delta_corner, delta_edge):
    """Huber IRLS weights on the information-scaled residual norm."""
    rn = jnp.where(
        is_edgelet, jnp.abs(r[:, 0]), jnp.linalg.norm(r, axis=-1)
    ) * sqrt_info
    delta = jnp.where(is_edgelet, delta_edge, delta_corner)
    w = jnp.where(rn <= delta, 1.0, delta / jnp.maximum(rn, 1e-12))
    return jnp.where(valid, w, 0.0), rn


def huber_chi2(rn, is_edgelet, valid, delta_corner, delta_edge):
    delta = jnp.where(is_edgelet, delta_edge, delta_corner)
    chi = jnp.where(
        rn <= delta, rn * rn, 2.0 * delta * rn - delta * delta
    )
    return jnp.sum(jnp.where(valid, chi, 0.0))


def build_reduced_system(T_kf, idist, obs, deltas, n_kf: int, n_pts: int):
    """One Gauss-Newton linearization with analytic landmark elimination.

    Returns (H_red (6K,6K), g_red (6K,), H_pp (P,), g_p (P,), W (P,6K), chi2).
    All outputs are *sums over observations* — in the distributed solver each
    shard computes them on its slice of points/obs and they are psum-reduced.
    """
    K = n_kf
    P = n_pts
    r, J_rho, J_h, J_t, sqrt_info = residuals_and_jacobians(T_kf, idist, obs)
    w, rn = robust_weights(r, obs["is_edgelet"], obs["valid"], sqrt_info, *deltas)
    chi2 = huber_chi2(rn, obs["is_edgelet"], obs["valid"], *deltas)

    info_w = w * sqrt_info * sqrt_info                # information × robust wgt

    p_idx = obs["point"]
    t_idx = obs["target"]
    h_idx = obs["host"]

    # ---- landmark blocks (scalar) ----
    Hpp_e = info_w * jnp.sum(J_rho * J_rho, axis=-1)
    gp_e = -info_w * jnp.sum(J_rho * r, axis=-1)
    H_pp = jax.ops.segment_sum(Hpp_e, p_idx, num_segments=P)
    g_p = jax.ops.segment_sum(gp_e, p_idx, num_segments=P)

    # ---- camera blocks ----
    # per-obs 6x6 contributions for (t,t), (h,h), (t,h), (h,t)
    def blk(Ja, Jb):
        return jnp.einsum("eri,erj,e->eij", Ja, Jb, info_w)

    pair_tt = t_idx * K + t_idx
    pair_hh = h_idx * K + h_idx
    pair_th = t_idx * K + h_idx
    pair_ht = h_idx * K + t_idx
    blocks = jnp.concatenate([blk(J_t, J_t), blk(J_h, J_h), blk(J_t, J_h), blk(J_h, J_t)])
    pairs = jnp.concatenate([pair_tt, pair_hh, pair_th, pair_ht])
    H_cc = jax.ops.segment_sum(blocks, pairs, num_segments=K * K)
    H_cc = H_cc.reshape(K, K, 6, 6).transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)

    g_t = -jnp.einsum("eri,er,e->ei", J_t, r, info_w)
    g_h = -jnp.einsum("eri,er,e->ei", J_h, r, info_w)
    g_c = jax.ops.segment_sum(
        jnp.concatenate([g_t, g_h]), jnp.concatenate([t_idx, h_idx]), num_segments=K
    ).reshape(6 * K)

    # ---- point-camera coupling W[p] ∈ R^{6K} ----
    Wt = jnp.einsum("eri,er,e->ei", J_t, J_rho, info_w)   # (E,6)
    Wh = jnp.einsum("eri,er,e->ei", J_h, J_rho, info_w)
    W = jax.ops.segment_sum(
        jnp.concatenate([Wt, Wh]),
        jnp.concatenate([p_idx * K + t_idx, p_idx * K + h_idx]),
        num_segments=P * K,
    ).reshape(P, 6 * K)

    return {"H_cc": H_cc, "g_c": g_c, "H_pp": H_pp, "g_p": g_p, "W": W, "chi2": chi2}


def _schur_solve(sys, free_kf_mask, lam, n_kf: int):
    """Damped solve of the reduced camera system + back-substitution factors.

    Returns (delta_c (6K,), solve-ready pieces for delta_p)."""
    K = n_kf
    H_pp_d = sys["H_pp"] * (1.0 + lam) + 1e-12
    Hpp_inv = 1.0 / H_pp_d
    W = sys["W"]
    H_red = sys["H_cc"] - (W * Hpp_inv[:, None]).T @ W
    g_red = sys["g_c"] - W.T @ (Hpp_inv * sys["g_p"])

    # damping + gauge fixing: zero rows/cols of fixed cameras, unit diagonal
    diag = jnp.diag(H_red)
    H_red = H_red + jnp.diag(diag * lam)
    free6 = jnp.repeat(free_kf_mask, 6)
    m = free6.astype(jnp.float32)
    H_red = H_red * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
    g_red = g_red * m

    delta_c = jnp.linalg.solve(H_red, g_red)
    delta_c = jnp.where(jnp.isfinite(delta_c), delta_c, 0.0) * m
    delta_p = Hpp_inv * (sys["g_p"] - W @ delta_c)
    return delta_c, delta_p


def _apply(T_kf, idist, delta_c, delta_p, point_valid, n_kf: int):
    d = delta_c.reshape(n_kf, 6)
    T_new = se3.mul(se3.exp(d), T_kf)
    idist_new = jnp.where(point_valid, idist + delta_p, idist)
    return T_new, idist_new


@functools.partial(
    jax.jit, static_argnames=("n_kf", "n_pts", "n_iter", "focal", "strip_px")
)
def local_bundle_adjustment(
    T_kf,              # (K,3,4)
    free_kf,           # (K,) bool — False = held fixed
    idist,             # (P,)
    point_valid,       # (P,) bool
    obs,               # dict of (E,) arrays (see residuals_and_jacobians)
    n_kf: int,
    n_pts: int,
    n_iter: int = 10,
    focal: float = 450.0,
    strip_px: float = 2.0,   # corner strip threshold (Config::lobaThresh);
                             # edgelets strip at 0.6× (ref 2.0/1.2 px)
):
    """Run windowed BA; returns dict(T_kf, idist, obs_inlier, chi2_init,
    chi2_final, deltas)."""
    T_kf = jnp.asarray(T_kf, jnp.float32)
    idist = jnp.asarray(idist, jnp.float32)

    # ---- Huber deltas from initial residuals (bundle_adjustment.cpp:661-680) ----
    r0, _, _, _, sqrt_info = residuals_and_jacobians(T_kf, idist, obs)
    rn0 = jnp.where(
        obs["is_edgelet"], jnp.abs(r0[:, 0]), jnp.linalg.norm(r0, axis=-1)
    ) * sqrt_info
    m_c = obs["valid"] & ~obs["is_edgelet"]
    m_e = obs["valid"] & obs["is_edgelet"]
    med_c = masked_median(jnp.where(m_c, rn0, jnp.inf), m_c)
    med_e = masked_median(jnp.where(m_e, rn0, jnp.inf), m_e)
    n_c = jnp.sum(m_c.astype(jnp.int32))
    n_e = jnp.sum(m_e.astype(jnp.int32))
    delta_c = jnp.where(n_c > 0, MAD_NORMALIZER * med_c, 1.0 / focal)
    delta_e = jnp.where(n_e > 0, MAD_NORMALIZER * med_e, 0.5 / focal)
    delta_c = jnp.maximum(delta_c, 1e-7)
    delta_e = jnp.maximum(delta_e, 1e-7)
    deltas = (delta_c, delta_e)

    sys0 = build_reduced_system(T_kf, idist, obs, deltas, n_kf, n_pts)
    chi2_init = sys0["chi2"]
    lam0 = 1e-5 * jnp.maximum(jnp.max(jnp.diag(sys0["H_cc"])), 1.0)

    def body(i, carry):
        T_c, id_c, lam, nu, chi2_c = carry
        sys = build_reduced_system(T_c, id_c, obs, deltas, n_kf, n_pts)
        dc, dp = _schur_solve(sys, free_kf, lam, n_kf)
        T_new, id_new = _apply(T_c, id_c, dc, dp, point_valid, n_kf)
        sys_new = build_reduced_system(T_new, id_new, obs, deltas, n_kf, n_pts)
        chi2_new = sys_new["chi2"]
        accept = chi2_new < sys["chi2"]
        T_c = jnp.where(accept, T_new, T_c)
        id_c = jnp.where(accept, id_new, id_c)
        lam = jnp.where(accept, lam * 0.5, jnp.minimum(lam * nu, 1e7))
        nu = jnp.where(accept, 2.0, nu * 2.0)
        chi2_c = jnp.where(accept, chi2_new, chi2_c)
        return T_c, id_c, lam, nu, chi2_c

    T_kf, idist, _, _, chi2_final = jax.lax.fori_loop(
        0, n_iter, body, (T_kf, idist, lam0, jnp.float32(2.0), chi2_init)
    )

    # ---- outlier stripping (bundle_adjustment.cpp:843-892) ----
    r_f, _, _, _, sqrt_info = residuals_and_jacobians(T_kf, idist, obs)
    rn_f = jnp.where(
        obs["is_edgelet"], jnp.abs(r_f[:, 0]), jnp.linalg.norm(r_f, axis=-1)
    ) * sqrt_info
    thresh = jnp.where(
        obs["is_edgelet"], 0.6 * strip_px / focal, strip_px / focal
    )
    obs_inlier = obs["valid"] & (rn_f <= thresh)

    return {
        "T_kf": T_kf,
        "idist": idist,
        "obs_inlier": obs_inlier,
        "chi2_init": chi2_init,
        "chi2_final": chi2_final,
        "deltas": deltas,
    }
