"""Pallas TPU kernel fusing the feature-alignment LM loop with its
post-gates (NCC score + gradient direction sample).

``align_mixed`` + ``ncc`` + ``sample_gradient_in_windows`` dominate
``match_points`` and the depth filter's subpixel refinement: each LM
iteration is a banded-matmul patch sample plus a dozen small reductions —
per-op overhead swamps the arithmetic at these sizes (the whole fused
frame step's floor is measured at ~0.14 ms; these stages contribute ~2 ms
through op count, not FLOPs).

This kernel runs the ENTIRE per-candidate pipeline in one pallas_call with
candidates on the lane dimension (the layout rule from
ops/epipolar_pallas.py): template gradients + 2/3-DoF inverse-compositional
Hessians, ``n_iter`` unrolled LM iterations with two-stage separable
bilinear patch sampling, the final-patch NCC against the template, and the
central-difference gradient direction at the converged position.  One HBM
read of the windows; a (8, S) packed result out.

Semantics mirror ops/align.py exactly (same DSO gradient weights, 1.001
diagonal inflation, convergence/bounds gates); validated against the XLA
implementation which remains the CPU-backend path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hso_tpu.ops.window_pallas import interpret_mode

_SB = 128
PATCH = 8
BORD = 10
_HALF = 4


@functools.partial(jax.jit, static_argnames=("win", "n_iter"))
def align_match_tpu(is_edge, direction, ref_border, px_init, valid,
                    windows, au, av, hs, ws, win: int, n_iter: int = 10):
    """Returns packed (8, S) float32:
    rows [u, v, converged, ncc, gx, gy, chi2, mean_diff]."""
    s = windows.shape[0]
    s_pad = -(-s // _SB) * _SB
    W = win

    def padS(a):
        return jnp.pad(a.astype(jnp.float32), (0, s_pad - s))

    wt = jnp.transpose(
        jnp.pad(windows.astype(jnp.float32),
                ((0, s_pad - s), (0, 0), (0, 0))), (1, 2, 0))
    rt = jnp.transpose(
        jnp.pad(ref_border.astype(jnp.float32),
                ((0, s_pad - s), (0, 0), (0, 0))), (1, 2, 0))
    par = jnp.stack([
        padS(is_edge.astype(jnp.float32)), padS(direction[:, 0]),
        padS(direction[:, 1]), padS(px_init[:, 0]), padS(px_init[:, 1]),
        padS(valid.astype(jnp.float32)), padS(au.astype(jnp.float32)),
        padS(av.astype(jnp.float32)), padS(hs.astype(jnp.float32)),
        padS(ws.astype(jnp.float32)),
    ] + [jnp.zeros((s_pad,), jnp.float32)] * 6)

    def kernel(wt_ref, rt_ref, par_ref, out_ref):
        w = wt_ref[...]                                  # (W, W, 128)
        t = rt_ref[...]                                  # (10, 10, 128)
        edge = par_ref[0] > 0.5
        d_u = par_ref[1]
        d_v = par_ref[2]
        u0 = par_ref[3]
        v0 = par_ref[4]
        valid_ = par_ref[5] > 0.5
        au_ = par_ref[6]
        av_ = par_ref[7]
        hf = par_ref[8]
        wf = par_ref[9]

        val = t[1:9, 1:9, :]                             # (8, 8, 128)
        dx = 0.5 * (t[1:9, 2:10, :] - t[1:9, 0:8, :])
        dy = 0.5 * (t[2:10, 1:9, :] - t[0:8, 1:9, :])
        wgt2 = jnp.sqrt(250.0 / (250.0 + dx * dx + dy * dy))
        jd = dx * d_u + dy * d_v
        wgt1 = jnp.sqrt(250.0 / (250.0 + jd * jd))
        wgt = jnp.where(edge, wgt1, wgt2)

        # 3-DoF corner Hessian (j3 = [dx, dy, 1]) with 1.001 diagonal
        h00 = jnp.sum(wgt2 * dx * dx, (0, 1)) * 1.001
        h01 = jnp.sum(wgt2 * dx * dy, (0, 1))
        h02 = jnp.sum(wgt2 * dx, (0, 1))
        h11 = jnp.sum(wgt2 * dy * dy, (0, 1)) * 1.001
        h12 = jnp.sum(wgt2 * dy, (0, 1))
        h22 = jnp.sum(wgt2, (0, 1)) * 1.001
        c00 = h11 * h22 - h12 * h12
        c01 = h02 * h12 - h01 * h22
        c02 = h01 * h12 - h02 * h11
        c11 = h00 * h22 - h02 * h02
        c12 = h01 * h02 - h00 * h12
        c22 = h00 * h11 - h01 * h01
        det3 = h00 * c00 + h01 * c01 + h02 * c02
        det3 = jnp.where(jnp.abs(det3) < 1e-12, 1e-12, det3)
        i3 = 1.0 / det3

        # 2-DoF edgelet Hessian (j2 = [jd, 1]) with 1.001 diagonal
        a2 = jnp.sum(wgt1 * jd * jd, (0, 1)) * 1.001
        b2 = jnp.sum(wgt1 * jd, (0, 1))
        c2 = jnp.sum(wgt1, (0, 1)) * 1.001
        det2 = a2 * c2 - b2 * b2
        det2 = jnp.where(jnp.abs(det2) < 1e-12, 1e-12, det2)
        i2 = 1.0 / det2

        iv = jax.lax.broadcasted_iota(jnp.int32, (PATCH, _SB), 0).astype(
            jnp.float32)

        def sample(uc, vc):
            rel_u = (uc - _HALF) - au_
            rel_v = (vc - _HALF) - av_
            tmp = jnp.zeros((PATCH, W, _SB), jnp.float32)
            for y in range(W):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel_v[None, :] + iv - y))
                tmp = tmp + wy[:, None, :] * w[y][None, :, :]
            patch = jnp.zeros((PATCH, PATCH, _SB), jnp.float32)
            for x in range(W):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel_u[None, :] + iv - x))
                patch = patch + wx[None, :, :] * tmp[:, x, :][:, None, :]
            return patch, rel_u, rel_v

        u = u0
        v = v0
        mean = jnp.zeros((_SB,), jnp.float32)
        chi2 = jnp.zeros((_SB,), jnp.float32)
        active = valid_
        conv = jnp.zeros((_SB,), bool)

        for _ in range(n_iter):
            patch, rel_u, rel_v = sample(u, v)
            ur = jnp.floor(u)
            vr = jnp.floor(v)
            inb = ((ur >= _HALF) & (vr >= _HALF)
                   & (ur < wf - _HALF) & (vr < hf - _HALF)
                   & (rel_u >= 0.0) & (rel_u + PATCH - 1 <= W - 1.0)
                   & (rel_v >= 0.0) & (rel_v + PATCH - 1 <= W - 1.0))
            active = active & inb & jnp.isfinite(u) & jnp.isfinite(v)

            res = patch - val + mean
            new_chi2 = jnp.sum(res * res * wgt, (0, 1))
            g0 = -jnp.sum(res * wgt2 * dx, (0, 1))
            g1 = -jnp.sum(res * wgt2 * dy, (0, 1))
            g2 = -jnp.sum(res * wgt2, (0, 1))
            upd3_0 = i3 * (c00 * g0 + c01 * g1 + c02 * g2)
            upd3_1 = i3 * (c01 * g0 + c11 * g1 + c12 * g2)
            upd3_2 = i3 * (c02 * g0 + c12 * g1 + c22 * g2)
            e0 = -jnp.sum(res * wgt1 * jd, (0, 1))
            e1 = -jnp.sum(res * wgt1, (0, 1))
            upd2_0 = i2 * (c2 * e0 - b2 * e1)
            upd2_1 = i2 * (-b2 * e0 + a2 * e1)

            du = jnp.where(edge, upd2_0 * d_u, upd3_0)
            dv = jnp.where(edge, upd2_0 * d_v, upd3_1)
            dm = jnp.where(edge, upd2_1, upd3_2)
            u = jnp.where(active, u + du, u)
            v = jnp.where(active, v + dv, v)
            mean = jnp.where(active, mean + dm, mean)
            chi2 = jnp.where(active, new_chi2, chi2)
            # (select over i1 vectors is unsupported in Mosaic — use algebra)
            small2 = upd2_0 * upd2_0 < 0.01 * 0.01
            small3 = upd3_0 * upd3_0 + upd3_1 * upd3_1 < 0.03 * 0.03
            small = (edge & small2) | (~edge & small3)
            conv = conv | (active & small)
            active = active & ~small

        conv = conv & (chi2 <= 1000.0 * PATCH * PATCH) & valid_

        # final patch → NCC against the template interior
        patch, _, _ = sample(u, v)
        pm = jnp.mean(patch, (0, 1))
        vm = jnp.mean(val, (0, 1))
        pa = patch - pm
        vb = val - vm
        num = jnp.sum(pa * vb, (0, 1))
        den = jnp.sqrt(jnp.sum(pa * pa, (0, 1)) * jnp.sum(vb * vb, (0, 1))) + 1e-12
        score = num / den

        # central-difference gradient direction at the converged position
        # (sample_gradient_in_windows semantics: point coords u - anchor)
        ru = u - au_
        rv = v - av_

        def point2(pu, pv):
            # separable single-point bilinear: collapse y, then x
            rowvals = jnp.zeros((W, _SB), jnp.float32)
            for y in range(W):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(pv - y))
                rowvals = rowvals + wy[None, :] * w[y]
            out = jnp.zeros((_SB,), jnp.float32)
            for x in range(W):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(pu - x))
                out = out + wx * rowvals[x]
            return out

        vx1 = point2(ru + 1.0, rv)
        vx0 = point2(ru - 1.0, rv)
        vy1 = point2(ru, rv + 1.0)
        vy0 = point2(ru, rv - 1.0)
        gx = 0.5 * (vx1 - vx0)
        gy = 0.5 * (vy1 - vy0)

        out_ref[...] = jnp.concatenate([
            u[None], v[None], conv.astype(jnp.float32)[None], score[None],
            gx[None], gy[None], chi2[None], mean[None],
        ], axis=0)

    gs = pl.GridSpec(
        grid=(s_pad // _SB,),
        in_specs=[
            pl.BlockSpec((W, W, _SB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BORD, BORD, _SB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, _SB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _SB), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=gs, interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((8, s_pad), jnp.float32),
    )(wt, rt, par)
    return out[:, :s]
