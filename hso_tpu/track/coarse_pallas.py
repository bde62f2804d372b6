"""Pallas TPU kernel for the coarse tracker's per-level LM loop
(inverse-compositional variant).

Each LM iteration of the XLA formulation is ~40 small ops (projection,
banded-matmul patch sampling, pattern selection matmuls, masked residual
reductions, the 7×7 system build) executed 10–50× per level — per-op
overhead dominates (ablation: +1.6 ms/frame of a ~4 ms step).  This kernel
runs the WHOLE level loop in one pallas_call: features on lanes, the G×G
sample grid built by two-stage separable bilinear accumulation, pattern
values picked by static indices, residuals/weights/energy and all 28+7
entries of the 7-DoF normal equations as cross-lane reductions, and the
scalar LM bookkeeping (7×7 Cholesky solve, Rodrigues exp, accept/reject,
early stop) inline.

IC only (the default branch: the template Jacobian is fixed, so each
iteration needs pattern VALUES only); the forward-compositional variant
and non-pinhole cameras stay on the XLA path.  Semantics mirror
track/coarse_tracker.py exactly and are validated against it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hso_tpu.ops.window_pallas import interpret_mode

WIN = 24
_LB = 128


def _chol7_solve(Hm, bv):
    """Unrolled scalar 7×7 Cholesky solve (solve_spd_small semantics:
    non-positive pivots propagate NaN so the caller's finite gate rejects)."""
    n = 7
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


def _so3_exp_rodrigues(p0, p1, p2):
    """3×3 rotation from a rotation vector (scalar Rodrigues)."""
    t2 = p0 * p0 + p1 * p1 + p2 * p2
    t = jnp.sqrt(t2 + 1e-32)
    small = t2 < 1e-12
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    R = [[1.0 - b * (p1 * p1 + p2 * p2), b * p0 * p1 - a * p2, b * p0 * p2 + a * p1],
         [b * p0 * p1 + a * p2, 1.0 - b * (p0 * p0 + p2 * p2), b * p1 * p2 - a * p0],
         [b * p0 * p2 - a * p1, b * p1 * p2 + a * p0, 1.0 - b * (p0 * p0 + p1 * p1)]]
    return R, a, b, t2


def _se3_exp(step):
    """SE3 exp of tangent [rho(3), phi(3)] → (R 3×3 lists, t 3 list).
    Mirrors math/_se3_impl.exp (V-matrix via closed form)."""
    rho = step[0:3]
    phi = step[3:6]
    R, a, b, t2 = _so3_exp_rodrigues(phi[0], phi[1], phi[2])
    t = jnp.sqrt(t2 + 1e-32)
    small = t2 < 1e-12
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (1.0 - a) / t2)
    # V = I + b·hat(phi) + c·hat(phi)²
    p0, p1, p2 = phi
    hat = [[0.0, -p2, p1], [p2, 0.0, -p0], [-p1, p0, 0.0]]
    hat2 = [[sum(hat[i][k] * hat[k][j] for k in range(3)) for j in range(3)]
            for i in range(3)]
    V = [[(1.0 if i == j else 0.0) + b * hat[i][j] + c * hat2[i][j]
          for j in range(3)] for i in range(3)]
    tvec = [sum(V[i][j] * rho[j] for j in range(3)) for i in range(3)]
    return R, tvec


@functools.partial(
    jax.jit,
    static_argnames=("g", "center", "pattern", "n_iter", "is_top", "border",
                     "h_img", "w_img"))
def coarse_level_ic_tpu(w_cur, ref_patch, j_ic, xyz_ref, au_c, av_c, vis,
                        T0, a0, huber, cutoff, fxl, fyl, cxl, cyl,
                        g: int, center: int, pattern: tuple, n_iter: int,
                        is_top: bool, border: int, h_img: int, w_img: int):
    """One coarse-tracker level (IC): returns (T (3,4), a, E_norm, n_terms,
    iters) — semantics of coarse_tracker.level_step's LM loop."""
    n = ref_patch.shape[0]
    P = ref_patch.shape[1]
    n_pad = -(-n // _LB) * _LB

    def padN(x):
        pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x.astype(jnp.float32), pad)

    wt = jnp.transpose(padN(w_cur), (1, 2, 0))            # (24, 24, N)
    rt = jnp.transpose(padN(ref_patch))                   # (P, N)
    jt = jnp.transpose(padN(j_ic), (1, 2, 0))             # (P, 6, N)
    par = jnp.stack([
        padN(xyz_ref[:, 0]), padN(xyz_ref[:, 1]), padN(xyz_ref[:, 2]),
        padN(au_c.astype(jnp.float32)), padN(av_c.astype(jnp.float32)),
        padN(vis.astype(jnp.float32)),
        jnp.zeros((n_pad,), jnp.float32), jnp.zeros((n_pad,), jnp.float32),
    ])                                                    # (8, N)
    sc = jnp.stack([
        a0.astype(jnp.float32), huber.astype(jnp.float32),
        cutoff.astype(jnp.float32),
        jnp.float32(fxl), jnp.float32(fyl), jnp.float32(cxl),
        jnp.float32(cyl), jnp.float32(0.0),
    ]).reshape(1, 8)
    T0f = T0.reshape(1, 12).astype(jnp.float32)

    def kernel(wt_ref, rt_ref, jt_ref, par_ref, sc_ref, T_ref, out_ref):
        w = wt_ref[...]
        ref = rt_ref[...]                                 # (P, N)
        jic = jt_ref[...]                                 # (P, 6, N)
        X = par_ref[0]
        Y = par_ref[1]
        Z = par_ref[2]
        au = par_ref[3]
        av = par_ref[4]
        vism = par_ref[5] > 0.5
        a0_ = sc_ref[0, 0]
        huber_ = sc_ref[0, 1]
        cutoff_ = sc_ref[0, 2]
        fx = sc_ref[0, 3]
        fy = sc_ref[0, 4]
        cx = sc_ref[0, 5]
        cy = sc_ref[0, 6]

        gi = jax.lax.broadcasted_iota(jnp.int32, (g, n_pad), 0).astype(
            jnp.float32)

        def evaluate(Tv, a_e):
            # project (pinhole, level coords)
            xc = Tv[0] * X + Tv[1] * Y + Tv[2] * Z + Tv[3]
            yc = Tv[4] * X + Tv[5] * Y + Tv[6] * Z + Tv[7]
            zc = Tv[8] * X + Tv[9] * Y + Tv[10] * Z + Tv[11]
            zi = 1.0 / jnp.where(jnp.abs(zc) < 1e-9, 1e-9, zc)
            u = fx * xc * zi + cx
            v = fy * yc * zi + cy
            rel_u = u - center - au
            rel_v = v - center - av
            uf = jnp.floor(u)
            vf = jnp.floor(v)
            valid = (vism & (zc > 0.0)
                     & (rel_u >= 0.0) & (rel_u + g - 1 <= WIN - 1.0)
                     & (rel_v >= 0.0) & (rel_v + g - 1 <= WIN - 1.0)
                     & (uf - border >= 0) & (vf - border >= 0)
                     & (uf + border < w_img) & (vf + border < h_img))
            # G×G grid by two-stage separable bilinear accumulation
            tmp = jnp.zeros((g, WIN, n_pad), jnp.float32)
            for y in range(WIN):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_v[None, :] + gi - y))
                tmp = tmp + wy[:, None, :] * w[y][None, :, :]
            grid = jnp.zeros((g, g, n_pad), jnp.float32)
            for x in range(WIN):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_u[None, :] + gi - x))
                grid = grid + wx[None, :, :] * tmp[:, x, :][:, None, :]
            # pattern values by static indexing
            cur = jnp.concatenate(
                [grid[center + dy, center + dx][None]
                 for (dx, dy) in pattern], axis=0)        # (P, N)

            r = cur - a_e * ref
            abs_r = jnp.abs(r)
            hw = jnp.where(abs_r < huber_, 1.0,
                           huber_ / jnp.maximum(abs_r, 1e-12))
            vm = jnp.broadcast_to(valid[None, :], r.shape)
            if is_top:
                sat = jnp.zeros_like(vm)
                e_terms = hw * r * r
            else:
                sat = (abs_r > cutoff_) & vm
                max_energy = 2.0 * huber_ * cutoff_ - huber_ * huber_
                e_terms = jnp.where(sat, max_energy, hw * r * r * (2.0 - hw))
            E = jnp.sum(jnp.where(vm, e_terms, 0.0))
            n_terms = jnp.sum(vm.astype(jnp.float32))
            wgt = jnp.where(vm & ~sat, hw, 0.0)
            # J7 = [-ref, a_e * jic]; build H (28 uniques) + b (7)
            J = [-ref] + [a_e * jic[:, k, :] for k in range(6)]
            Hm = [[None] * 7 for _ in range(7)]
            bv = [None] * 7
            for i in range(7):
                bv[i] = -jnp.sum(wgt * J[i] * r)
                for j in range(i + 1):
                    Hm[i][j] = jnp.sum(wgt * J[i] * J[j])
                    Hm[j][i] = Hm[i][j]
            E_norm = E / jnp.maximum(n_terms, 1.0)
            return E_norm, Hm, bv, n_terms

        T0v = [T_ref[0, k] for k in range(12)]
        E0, H0, b0, nt0 = evaluate(T0v, a0_)

        def flatH(Hm, bv):
            return jnp.stack([Hm[i][j] for i in range(7) for j in range(7)]
                             + bv)

        def unflatH(f):
            Hm = [[f[i * 7 + j] for j in range(7)] for i in range(7)]
            bv = [f[49 + i] for i in range(7)]
            return Hm, bv

        def body(carry):
            Tv, a_c, lam, E_c, Hb, nt_c, it, stop = carry
            Hm, bv = unflatH(Hb)
            Hl = [[Hm[i][j] * (1.0 + (lam if i == j else 0.0))
                   for j in range(7)] for i in range(7)]
            step = _chol7_solve(Hl, bv)
            extrap = jnp.where(lam < 1e-3, jnp.sqrt(jnp.sqrt(1e-3 / lam)), 1.0)
            step = [s * extrap for s in step]
            finite = jnp.float32(1.0)
            for s in step:
                finite = finite * jnp.isfinite(s).astype(jnp.float32)
            step = [jnp.where(finite > 0.5, s, 0.0) for s in step]

            a_new = a_c + step[0]
            R, tv = _se3_exp([-step[k] for k in range(1, 7)])
            # IC update: T_new = T · dT
            Told = [[Tv[0], Tv[1], Tv[2], Tv[3]],
                    [Tv[4], Tv[5], Tv[6], Tv[7]],
                    [Tv[8], Tv[9], Tv[10], Tv[11]]]
            Tn = []
            for i in range(3):
                for j in range(3):
                    Tn.append(sum(Told[i][k] * R[k][j] for k in range(3)))
                Tn.append(sum(Told[i][k] * tv[k] for k in range(3))
                          + Told[i][3])
            # reorder: built as rows of [r0c0,r0c1,r0c2,t0,...] already
            E_new, H_new, b_new, nt_new = evaluate(Tn, a_new)
            accept = E_new < E_c
            af = accept.astype(jnp.float32)
            Tv = [af * Tn[k] + (1 - af) * Tv[k] for k in range(12)]
            a_c = af * a_new + (1 - af) * a_c
            E_c = jnp.where(accept, E_new, E_c)
            Hb_new = flatH(H_new, b_new)
            Hb = jnp.where(accept, Hb_new, Hb)
            nt_c = jnp.where(accept, nt_new, nt_c)
            lam = jnp.where(accept, lam * 0.5, jnp.maximum(lam * 4.0, 1e-3))
            sn = jnp.float32(0.0)
            for s in step:
                sn = sn + s * s
            stop = jnp.sqrt(sn) <= 1e-4
            return (Tv, a_c, lam, E_c, Hb, nt_c, it + 1, stop)

        def cond(carry):
            *_, it, stop = carry
            return (it < n_iter) & ~stop

        carry0 = (T0v, a0_, jnp.float32(0.1), E0, flatH(H0, b0), nt0,
                  jnp.int32(0), jnp.bool_(False))
        Tv, a_f, _, E_f, _, nt_f, iters, _ = jax.lax.while_loop(
            cond, body, carry0)

        out = jnp.stack([Tv[0], Tv[1], Tv[2], Tv[3], Tv[4], Tv[5], Tv[6],
                         Tv[7], Tv[8], Tv[9], Tv[10], Tv[11], a_f, E_f,
                         nt_f, iters.astype(jnp.float32)])
        out_ref[...] = jnp.broadcast_to(out[:, None], (16, _LB))

    gs = pl.GridSpec(
        grid=(1,),
        in_specs=[
            pl.BlockSpec((WIN, WIN, n_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 6, n_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, _LB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=gs, interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((16, _LB), jnp.float32),
    )(wt, rt, jt, par, sc, T0f)
    col = out[:, 0]
    T = col[:12].reshape(3, 4)
    return T, col[12], col[13], col[14].astype(jnp.int32), col[15].astype(jnp.int32)
