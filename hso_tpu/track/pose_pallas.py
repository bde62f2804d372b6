"""Pallas TPU kernel for the motion-only pose LM loop.

Same rationale as track/coarse_pallas.py: the reprojection LM runs 12
Nielsen iterations × ≤5 trials of ~30 small XLA ops each — per-op overhead
bound.  This kernel runs the whole trial loop in one pallas_call:
observations on lanes, residuals/weights vectorized, the 6-DoF normal
equations as 21+6 cross-lane reductions, and the scalar bookkeeping
(damped 6×6 Cholesky, SE3 exp, Nielsen mu/nu updates, early stop) inline.
Robust-scale setup (MAD medians) and the post-solve stripping/statistics
stay in XLA.  Validated against track/pose_optimizer.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hso_tpu.ops.window_pallas import interpret_mode
from hso_tpu.track.coarse_pallas import _se3_exp

_LB = 128
EPS = 1e-10


def _chol6_solve(Hm, bv):
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = Hm[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.where(s <= 0, jnp.nan, jnp.maximum(s, 1e-12)))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = Hm[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = bv[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


@functools.partial(jax.jit, static_argnames=("n_iter",))
def pose_lm_tpu(T0, p_world, obs_uv, grad, sqrt_inv_cov, is_edgelet,
                is_temporary, valid, scale_pt, scale_ls, n_iter: int = 12):
    """LM trial loop of optimize_pose.  Returns (T (3,4), A_last (6,6),
    chi2_final)."""
    n = p_world.shape[0]
    n_pad = -(-n // _LB) * _LB

    def padN(x):
        pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x.astype(jnp.float32), pad)

    par = jnp.stack([
        padN(p_world[:, 0]), padN(p_world[:, 1]), padN(p_world[:, 2]),
        padN(obs_uv[:, 0]), padN(obs_uv[:, 1]),
        padN(grad[:, 0]), padN(grad[:, 1]), padN(sqrt_inv_cov),
        padN(is_edgelet.astype(jnp.float32)),
        padN(is_temporary.astype(jnp.float32)),
        padN(valid.astype(jnp.float32)),
        jnp.zeros((n_pad,), jnp.float32),
    ])                                                    # (12, N)
    sc = jnp.stack([scale_pt.astype(jnp.float32),
                    scale_ls.astype(jnp.float32),
                    jnp.float32(0.0), jnp.float32(0.0)]).reshape(1, 4)
    T0f = T0.reshape(1, 12).astype(jnp.float32)

    def kernel(par_ref, sc_ref, T_ref, out_ref):
        X = par_ref[0]
        Y = par_ref[1]
        Z = par_ref[2]
        ou = par_ref[3]
        ov = par_ref[4]
        gu = par_ref[5]
        gv = par_ref[6]
        sic = par_ref[7]
        edge = par_ref[8] > 0.5
        temp = par_ref[9] > 0.5
        vm = par_ref[10] > 0.5
        s_pt = sc_ref[0, 0]
        s_ls = sc_ref[0, 1]
        HUB = 1.345

        def residuals(Tv):
            px = Tv[0] * X + Tv[1] * Y + Tv[2] * Z + Tv[3]
            py = Tv[4] * X + Tv[5] * Y + Tv[6] * Z + Tv[7]
            pz = Tv[8] * X + Tv[9] * Y + Tv[10] * Z + Tv[11]
            zi = 1.0 / jnp.where(jnp.abs(pz) < 1e-12, 1e-12, pz)
            eu = (ou - px * zi) * sic
            ev = (ov - py * zi) * sic
            r_edge = gu * eu + gv * ev
            r_corner = jnp.sqrt(eu * eu + ev * ev)
            r_abs = jnp.where(edge, jnp.abs(r_edge), r_corner)
            return px, py, pz, eu, ev, r_edge, r_abs

        def hub_w(x):
            return jnp.where(x < HUB, 1.0, HUB / jnp.maximum(x, 1e-12))

        def weights(r_edge, r_abs):
            wgt = jnp.where(edge, hub_w(jnp.abs(r_edge) / s_ls),
                            hub_w(r_abs / s_pt))
            wgt = jnp.where(temp, wgt * 0.5, wgt)
            return jnp.where(vm, wgt, 0.0)

        def chi2_of(Tv):
            _, _, _, _, _, r_edge, r_abs = residuals(Tv)
            wgt = weights(r_edge, r_abs)
            return jnp.sum(jnp.where(vm, r_abs * r_abs * wgt, 0.0))

        def system(Tv):
            px, py, pz, eu, ev, r_edge, r_abs = residuals(Tv)
            wgt = weights(r_edge, r_abs)
            zi = 1.0 / jnp.where(jnp.abs(pz) < 1e-8, 1e-8, pz)
            zi2 = zi * zi
            # J rows (2,6) per obs, scaled by sqrt_inv_cov
            j0 = [-zi, jnp.zeros_like(X), px * zi2, px * py * zi2,
                  -(1.0 + px * px * zi2), py * zi]
            j1 = [jnp.zeros_like(X), -zi, py * zi2, 1.0 + py * py * zi2,
                  -px * py * zi2, -px * zi]
            j0 = [a * sic for a in j0]
            j1 = [a * sic for a in j1]
            je = [gu * j0[k] + gv * j1[k] for k in range(6)]
            w_e = jnp.where(edge, wgt, 0.0)
            w_c = jnp.where(edge, 0.0, wgt)
            Hm = [[None] * 6 for _ in range(6)]
            bv = [None] * 6
            for i in range(6):
                bv[i] = -(jnp.sum(je[i] * r_edge * w_e)
                          + jnp.sum((j0[i] * eu + j1[i] * ev) * w_c))
                for j in range(i + 1):
                    Hm[i][j] = (jnp.sum(je[i] * je[j] * w_e)
                                + jnp.sum((j0[i] * j0[j] + j1[i] * j1[j]) * w_c))
                    Hm[j][i] = Hm[i][j]
            return Hm, bv

        T0v = [T_ref[0, k] for k in range(12)]
        chi2_0 = chi2_of(T0v)

        def flat(Hm):
            return jnp.stack([Hm[i][j] for i in range(6) for j in range(6)])

        def trial_body(tc):
            Tv, chi2_t, mu_t, nu_t, accepted, stop_t, A_l, jtr = tc
            Hm, bv = system(Tv)
            Hl = [[Hm[i][j] * (1.0 + (mu_t if i == j else 0.0))
                   for j in range(6)] for i in range(6)]
            dT = _chol6_solve(Hl, bv)
            ok = jnp.float32(1.0)
            for s in dT:
                ok = ok * jnp.isfinite(s).astype(jnp.float32)
            dT_s = [jnp.where(ok > 0.5, s, 0.0) for s in dT]
            R, tv = _se3_exp(dT_s)
            # T_new = exp(dT) · T
            Tn = []
            for i in range(3):
                Ri = R[i]
                for j in range(4):
                    col = [Tv[j + 0], Tv[j + 4], Tv[j + 8]]
                    v = Ri[0] * col[0] + Ri[1] * col[1] + Ri[2] * col[2]
                    if j == 3:
                        v = v + tv[i]
                    Tn.append(v)
            chi2_new = chi2_of(Tn)
            rho = jnp.where(ok > 0.5, chi2_t - chi2_new, -1.0)
            do = (~accepted) & (~stop_t)
            acc = do & (rho > 0)
            af = acc.astype(jnp.float32)
            Tv = [af * Tn[k] + (1 - af) * Tv[k] for k in range(12)]
            chi2_t = jnp.where(acc, chi2_new, chi2_t)
            A_l = jnp.where(acc, flat(Hm), A_l)
            mu_t = jnp.where(
                acc,
                mu_t * jnp.maximum(1.0 / 3.0, jnp.minimum(
                    1.0 - (2.0 * rho - 1.0) ** 3, 2.0 / 3.0)),
                jnp.where(do, jnp.maximum(mu_t * nu_t, 1e-4), mu_t))
            nu_t = jnp.where(acc, 2.0, jnp.where(do, nu_t * 2.0, nu_t))
            mx = jnp.float32(0.0)
            for s in dT_s:
                mx = jnp.maximum(mx, jnp.abs(s))
            stop_t = stop_t | (acc & (mx <= EPS))
            accepted = accepted | acc
            return (Tv, chi2_t, mu_t, nu_t, accepted, stop_t, A_l, jtr + 1)

        def outer_body(i, carry):
            Tv, chi2_c, mu, nu, stop, A_last = carry
            tc = jax.lax.while_loop(
                lambda tc: (~tc[4]) & (~tc[5]) & (tc[7] < 5),
                trial_body,
                (Tv, chi2_c, mu, nu, jnp.bool_(False), stop, A_last,
                 jnp.int32(0)))
            Tv, chi2_c, mu, nu, accepted, stop, A_last, _ = tc
            stop = stop | ~accepted
            return (Tv, chi2_c, mu, nu, stop, A_last)

        init = (T0v, chi2_0, jnp.float32(0.1), jnp.float32(2.0),
                jnp.bool_(False), jnp.zeros((36,), jnp.float32))
        Tv, chi2_f, _, _, _, A_last = jax.lax.fori_loop(
            0, n_iter, outer_body, init)

        out = jnp.concatenate([
            jnp.stack(Tv), A_last, jnp.stack([chi2_f]),
            jnp.zeros((15,), jnp.float32)])
        out_ref[...] = jnp.broadcast_to(out[:, None], (64, _LB))

    gs = pl.GridSpec(
        grid=(1,),
        in_specs=[
            pl.BlockSpec((12, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((64, _LB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=gs, interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((64, _LB), jnp.float32),
    )(par, sc, T0f)
    col = out[:, 0]
    return col[:12].reshape(3, 4), col[12:48].reshape(6, 6), col[48]
