"""Multi-device sliding-window BA: observation-sharded Schur reduction.

The BASELINE.json north-star config: keyframe/map-point blocks partitioned
across a TPU mesh, distributed BA via Schur-complement reduction with ICI
``psum`` of the camera-camera Hessian blocks.  The reference has no analogue
(single process, g2o, shared memory — SURVEY.md §2.3): this is where the TPU
build's "data parallelism" axis lives.

Scheme (v1):
  * observations (and the per-point partial sums they induce) are sharded
    over the mesh's ``obs`` axis via ``shard_map``; camera poses and the
    inverse-distance vector are replicated,
  * each device linearizes its observation slice —
    :func:`hso_tpu.ba.local_ba.build_reduced_system` is already a pure
    sum-over-observations — and the partial (H_cc, g_c, H_pp, g_p, W, chi2)
    are ``psum``-reduced over ICI,
  * the damped Schur solve of the small reduced camera system runs
    replicated on every device; landmark back-substitution is local,
  * the whole LM loop lives inside one ``shard_map`` call — one dispatch per
    solve, collectives inside.

Robust deltas are passed in (compute them with
:func:`hso_tpu.ba.local_ba.local_bundle_adjustment`'s initial-residual rule
or :func:`compute_deltas` below) since medians don't distribute as sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hso_tpu.ba.local_ba import (
    _apply,
    _schur_solve,
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


def make_distributed_ba(mesh: Mesh, n_kf: int, n_pts: int, n_iter: int = 10,
                        axis: str = "obs"):
    """Build the jitted distributed BA step for a fixed mesh/shape config.

    The returned function takes (T_kf, free_kf, idist, point_valid, obs,
    deltas) with ``obs`` arrays sharded along their leading axis and returns
    (T_kf', idist', chi2_final).
    """

    def shard_fn(T_kf, free_kf, idist, point_valid, obs, delta_c, delta_e):
        deltas = (delta_c, delta_e)

        def psum_sys(sys):
            return {k: jax.lax.psum(v, axis) for k, v in sys.items()}

        def body(i, carry):
            T_c, id_c, lam, nu, chi2_c = carry
            sys = psum_sys(build_reduced_system(T_c, id_c, obs, deltas, n_kf, n_pts))
            dc, dp = _schur_solve(sys, free_kf, lam, n_kf)
            T_new, id_new = _apply(T_c, id_c, dc, dp, point_valid, n_kf)
            sys_new = psum_sys(
                build_reduced_system(T_new, id_new, obs, deltas, n_kf, n_pts)
            )
            accept = sys_new["chi2"] < sys["chi2"]
            T_c = jnp.where(accept, T_new, T_c)
            id_c = jnp.where(accept, id_new, id_c)
            lam = jnp.where(accept, lam * 0.5, jnp.minimum(lam * nu, 1e7))
            nu = jnp.where(accept, 2.0, nu * 2.0)
            chi2_c = jnp.where(accept, sys_new["chi2"], chi2_c)
            return T_c, id_c, lam, nu, chi2_c

        sys0 = psum_sys(build_reduced_system(T_kf, idist, obs, deltas, n_kf, n_pts))
        lam0 = 1e-5 * jnp.maximum(jnp.max(jnp.diag(sys0["H_cc"])), 1.0)
        T_f, id_f, _, _, chi2 = jax.lax.fori_loop(
            0, n_iter, body, (T_kf, idist, lam0, jnp.float32(2.0), sys0["chi2"])
        )
        return T_f, id_f, chi2

    obs_spec = {
        k: P(axis)
        for k in ("point", "target", "host", "f_host", "meas", "grad",
                  "is_edgelet", "level", "valid")
    }
    rep = P()
    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, obs_spec, rep, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_obs(obs: dict, mesh: Mesh, axis: str = "obs") -> dict:
    """Place observation arrays sharded over the mesh axis."""
    out = {}
    for k, v in obs.items():
        out[k] = jax.device_put(v, NamedSharding(mesh, P(axis)))
    return out
