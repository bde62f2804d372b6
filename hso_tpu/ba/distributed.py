"""Multi-device sliding-window BA: point-block-sharded Schur reduction.

The BASELINE.json north-star config: keyframe and map-point blocks
partitioned across a TPU mesh, distributed BA via Schur-complement reduction
with ICI ``psum`` of the camera-camera Hessian blocks.  The reference has no
analogue (single process, g2o, shared memory — SURVEY.md §2.3): this is
where the TPU build's data-parallel axis lives.

Scheme (v2 — point blocks sharded, cameras replicated):
  * map points are assigned to devices in contiguous blocks; every
    observation row lives on the device that owns its point (the host glue
    groups rows by owner, ``hso_tpu/pipeline/ba_glue.py``),
  * each device linearizes only its own observation slice —
    :func:`hso_tpu.ba.local_ba.build_reduced_system` is a pure
    sum-over-observations — so the landmark blocks ``H_pp``/``g_p`` and the
    point-camera coupling ``W`` are (P/n,)- and (P/n, 6K)-shaped and stay
    LOCAL; per-device memory scales as P/n,
  * the Schur reduction needs only the (6K, 6K) reduced camera system
    globally: each device computes ``Wᵀ·H_pp⁻¹·W`` and ``Wᵀ·H_pp⁻¹·g_p``
    over its point block and the small results are ``psum``-reduced over
    ICI together with its partial ``H_cc``/``g_c``/chi²,
  * the damped solve of the reduced camera system runs replicated (6K ≤ 96
    unknowns); landmark back-substitution is local per point block,
  * the whole LM loop lives inside one ``shard_map`` call — one dispatch per
    solve, collectives inside.

Robust deltas are passed in (compute them with :func:`compute_deltas`)
since medians don't distribute as sums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hso_tpu.ba.local_ba import (
    _apply,
    build_reduced_system,
    residuals_and_jacobians,
)
from hso_tpu.math.robust import MAD_NORMALIZER, masked_median


def compute_deltas(T_kf, idist, obs, focal: float):
    """Huber deltas per class from initial residuals (replicated, cheap)."""
    r0, _, _, _, sqrt_info = residuals_and_jacobians(T_kf, idist, obs)
    rn0 = jnp.where(
        obs["is_edgelet"], jnp.abs(r0[:, 0]), jnp.linalg.norm(r0, axis=-1)
    ) * sqrt_info
    m_c = obs["valid"] & ~obs["is_edgelet"]
    m_e = obs["valid"] & obs["is_edgelet"]
    med_c = masked_median(jnp.where(m_c, rn0, jnp.inf), m_c)
    med_e = masked_median(jnp.where(m_e, rn0, jnp.inf), m_e)
    d_c = jnp.where(jnp.sum(m_c) > 0, MAD_NORMALIZER * med_c, 1.0 / focal)
    d_e = jnp.where(jnp.sum(m_e) > 0, MAD_NORMALIZER * med_e, 0.5 / focal)
    return jnp.maximum(d_c, 1e-7), jnp.maximum(d_e, 1e-7)


OBS_KEYS = ("point", "target", "host", "f_host", "meas", "grad",
            "is_edgelet", "level", "valid")


def make_distributed_ba(mesh: Mesh, n_kf: int, n_pts_local: int,
                        n_iter: int = 10, axis: str = "obs"):
    """Build the jitted distributed BA step for a fixed mesh/shape config.

    The returned function takes
      (T_kf (K,3,4) replicated, free_kf (K,) replicated,
       idist (n_dev·P_l,) point-sharded, point_valid point-sharded,
       obs dict (n_dev·E_l,) rows sharded with LOCAL point indices,
       delta_corner, delta_edge)
    and returns (T_kf', idist' (point-sharded), chi2_final).
    """
    K = n_kf

    def shard_fn(T_kf, free_kf, idist, point_valid, obs, delta_c_, delta_e_):
        deltas = (delta_c_, delta_e_)

        def build(T_c, id_c):
            sys = build_reduced_system(T_c, id_c, obs, deltas, K, n_pts_local)
            # only the camera system and the scalar energy are global;
            # H_pp/g_p/W stay local to this point block
            for k in ("H_cc", "g_c", "chi2"):
                sys[k] = jax.lax.psum(sys[k], axis)
            return sys

        def schur_solve(sys, lam):
            H_pp_d = sys["H_pp"] * (1.0 + lam) + 1e-12
            Hpp_inv = 1.0 / H_pp_d
            W = sys["W"]                                     # (P_l, 6K) local
            H_red = sys["H_cc"] - jax.lax.psum(
                (W * Hpp_inv[:, None]).T @ W, axis)
            g_red = sys["g_c"] - jax.lax.psum(
                W.T @ (Hpp_inv * sys["g_p"]), axis)

            diag = jnp.diag(H_red)
            H_red = H_red + jnp.diag(diag * lam)
            free6 = jnp.repeat(free_kf, 6)
            m = free6.astype(jnp.float32)
            H_red = H_red * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
            g_red = g_red * m
            delta_c = jnp.linalg.solve(H_red, g_red)
            delta_c = jnp.where(jnp.isfinite(delta_c), delta_c, 0.0) * m
            delta_p = Hpp_inv * (sys["g_p"] - W @ delta_c)   # local
            return delta_c, delta_p

        def body(i, carry):
            T_c, id_c, lam, nu, chi2_c = carry
            sys = build(T_c, id_c)
            dc, dp = schur_solve(sys, lam)
            T_new, id_new = _apply(T_c, id_c, dc, dp, point_valid, K)
            chi2_new = build(T_new, id_new)["chi2"]
            accept = chi2_new < sys["chi2"]
            T_c = jnp.where(accept, T_new, T_c)
            id_c = jnp.where(accept, id_new, id_c)
            lam = jnp.where(accept, lam * 0.5, jnp.minimum(lam * nu, 1e7))
            nu = jnp.where(accept, 2.0, nu * 2.0)
            chi2_c = jnp.where(accept, chi2_new, chi2_c)
            return T_c, id_c, lam, nu, chi2_c

        sys0 = build(T_kf, idist)
        lam0 = 1e-5 * jnp.maximum(jnp.max(jnp.diag(sys0["H_cc"])), 1.0)
        T_f, id_f, _, _, chi2 = jax.lax.fori_loop(
            0, n_iter, body, (T_kf, idist, lam0, jnp.float32(2.0), sys0["chi2"])
        )
        return T_f, id_f, chi2

    obs_spec = {k: P(axis) for k in OBS_KEYS}
    rep = P()
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep, rep, P(axis), P(axis), obs_spec, rep, rep),
        out_specs=(rep, P(axis), rep),
        check_vma=False,
    )
    return jax.jit(fn)


_DBA_CACHE: dict = {}


def distributed_bundle_adjustment(
    T_kf, free_kf, idist, point_valid, obs,
    n_kf: int, n_pts: int, n_iter: int = 10, focal: float = 450.0,
    strip_px: float = 2.0, n_devices: int = 0,
):
    """Drop-in replacement for :func:`hso_tpu.ba.local_ba.
    local_bundle_adjustment` that runs the LM loop point-block-sharded over
    the available device mesh (``Config.distributed_ba`` routes the live
    pipeline here, ba_glue.run_local_ba).

    Same inputs/outputs as the single-device solver; ``n_devices`` 0 means
    all devices of the default backend.  The host-side repartition
    (:func:`shard_problem`) and the post-solve inlier test add one extra
    linearization — outlier stripping semantics match local_ba
    (/root/reference/src/bundle_adjustment.cpp:843-892).
    """
    import numpy as np
    from hso_tpu.ba.local_ba import huber_chi2, residuals_and_jacobians

    devs = jax.devices()
    nd = n_devices or len(devs)
    nd = min(nd, len(devs))

    obs_j = {k: jnp.asarray(v) for k, v in obs.items()}
    T_kf = jnp.asarray(T_kf, jnp.float32)
    idist = jnp.asarray(idist, jnp.float32)
    deltas = compute_deltas(T_kf, idist, obs_j, focal)

    obs_s, idist_s, pv_s, p_local, _dropped = shard_problem(
        obs_j, idist, point_valid, nd)

    key = (nd, n_kf, p_local, n_iter)
    if key not in _DBA_CACHE:
        mesh = Mesh(np.array(devs[:nd]), axis_names=("obs",))
        _DBA_CACHE[key] = (mesh, make_distributed_ba(
            mesh, n_kf=n_kf, n_pts_local=p_local, n_iter=n_iter))
    mesh, step = _DBA_CACHE[key]

    T_f, idist_f, chi2_final = step(
        T_kf, jnp.asarray(free_kf), jnp.asarray(idist_s), jnp.asarray(pv_s),
        shard_obs({k: jnp.asarray(v) for k, v in obs_s.items()}, mesh),
        *deltas,
    )
    idist_out = jnp.asarray(np.asarray(idist_f)[:n_pts])

    # chi2_init + final inlier test on the original (global-index) obs
    r0, _, _, _, sqrt_info = residuals_and_jacobians(T_kf, idist, obs_j)
    rn0 = jnp.where(
        obs_j["is_edgelet"], jnp.abs(r0[:, 0]), jnp.linalg.norm(r0, axis=-1)
    ) * sqrt_info
    chi2_init = huber_chi2(rn0, obs_j["is_edgelet"], obs_j["valid"], *deltas)
    r_f, _, _, _, sqrt_info = residuals_and_jacobians(T_f, idist_out, obs_j)
    rn_f = jnp.where(
        obs_j["is_edgelet"], jnp.abs(r_f[:, 0]), jnp.linalg.norm(r_f, axis=-1)
    ) * sqrt_info
    thresh = jnp.where(
        obs_j["is_edgelet"], 0.6 * strip_px / focal, strip_px / focal
    )
    obs_inlier = obs_j["valid"] & (rn_f <= thresh)

    return {
        "T_kf": T_f,
        "idist": idist_out,
        "obs_inlier": obs_inlier,
        "chi2_init": chi2_init,
        "chi2_final": chi2_final,
        "deltas": deltas,
    }


def shard_obs(obs: dict, mesh: Mesh, axis: str = "obs") -> dict:
    """Place observation arrays sharded over the mesh axis."""
    out = {}
    for k, v in obs.items():
        out[k] = jax.device_put(v, NamedSharding(mesh, P(axis)))
    return out


def shard_problem(obs, idist, point_valid, n_dev: int, slack: float = 1.5):
    """Host-side repartitioner: global problem → v2 point-block layout.

    Point slots are block-assigned to devices (owner of slot s =
    ``s // p_local``), so the sharded ``idist``/``point_valid`` are simply
    the global arrays padded to ``n_dev · p_local``.  Observation rows move
    to their point's owner with the point index rebased to the local block;
    per-device row capacity is ``ceil(E/n_dev · slack)`` (imbalanced
    problems drop overflow rows — reported, never silent).

    Returns (obs_sharded, idist_sharded, point_valid_sharded, p_local,
    n_dropped); arrays are numpy, ready for ``shard_obs``/``device_put``.
    """
    import numpy as np

    obs = {k: np.asarray(v) for k, v in obs.items()}
    idist = np.asarray(idist)
    point_valid = np.asarray(point_valid)
    p_total = idist.shape[0]
    e_total = obs["point"].shape[0]
    p_local = -(-p_total // n_dev)
    e_local = int(np.ceil(e_total / n_dev * slack))

    pad_p = n_dev * p_local - p_total
    idist_s = np.pad(idist, (0, pad_p))
    pv_s = np.pad(point_valid, (0, pad_p))

    out = {k: np.zeros((n_dev * e_local,) + v.shape[1:], v.dtype)
           for k, v in obs.items()}
    fill = np.zeros(n_dev, np.int64)
    n_dropped = 0
    valid_rows = np.nonzero(obs["valid"])[0]
    owners = np.minimum(obs["point"][valid_rows] // p_local, n_dev - 1)
    for e, d in zip(valid_rows, owners):
        if fill[d] >= e_local:
            n_dropped += 1
            continue
        dst = d * e_local + fill[d]
        fill[d] += 1
        for k in OBS_KEYS:
            out[k][dst] = obs[k][e]
        out["point"][dst] = obs["point"][e] - d * p_local
    return out, idist_s, pv_s, p_local, n_dropped
