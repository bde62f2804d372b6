"""Pallas TPU kernel for the dense epipolar ZMNCC line search.

The XLA formulations of ``ops.epipolar.epipolar_zmncc_search``'s scoring
stage are all HBM-bandwidth-bound at S≈1–1.5k seeds: the (S,48,48) layout
either serializes in a ``feature_group_count=S`` grouped conv (~0.9 ms) or
pays a lane-misaligned vector rotate per patch shift (~5 ms); the
seeds-last (48,48,S) layout makes every shift aligned but streams the
whole ~14 MB window array from HBM 64 times (~5 ms).

This kernel blocks 128 seeds onto the LANE dimension and keeps the entire
per-block working set in VMEM (~6 MB): windows (48,48,128), box sums,
correlation map, zero-mean normalization, the two-tap line sampling, the
validity mask, and the best/second-best reduction — one pass, one HBM read
of the windows, three small vectors out.  Everything the scoring needs
after the (XLA-computed) epipolar geometry happens in-kernel.

Layout notes (v5e):
  * lanes = seeds (128/block), sublanes = window rows — every patch shift
    then indexes MAJOR dims, which Mosaic compiles to aligned slices;
  * f32 min tile (8, 128): the (8, S) output block and the (16, S) packed
    per-seed parameter block respect it;
  * best-k extraction avoids argmax: k_best = min k with score == max
    (matches jnp.argmax's first-hit tie rule used by the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hso_tpu.ops.window_pallas import interpret_mode

_SB = 128           #: seeds per grid program (one lane tile)
PATCH = 8


@functools.partial(jax.jit, static_argnames=("n_steps",))
def zmncc_line_scores_tpu(windows, ref_patch, su0, sv0, dir_u, dir_v,
                          n_line, au, av, hs, ws, n_steps: int):
    """Best/second/k-best of the ZMNCC score along each seed's epipolar
    segment.  ``su0/sv0`` are the line start in SCORE-MAP coordinates
    (start - 4 - anchor); bounds use the level image dims (hs, ws).

    Returns (score_best (S,), score_second (S,), k_best (S,) int32)."""
    s = windows.shape[0]
    ew = windows.shape[-1]
    ow = ew - PATCH + 1
    s_pad = -(-s // _SB) * _SB

    def padS(a):
        return jnp.pad(a.astype(jnp.float32), (0, s_pad - s))

    wt = jnp.transpose(
        jnp.pad(windows.astype(jnp.float32), ((0, s_pad - s), (0, 0), (0, 0))),
        (1, 2, 0))                                           # (EW, EW, S)
    rt = jnp.transpose(
        jnp.pad(ref_patch.astype(jnp.float32), ((0, s_pad - s), (0, 0), (0, 0))),
        (1, 2, 0))                                           # (8, 8, S)
    par = jnp.stack([
        padS(su0), padS(sv0), padS(dir_u), padS(dir_v),
        padS(n_line.astype(jnp.float32)), padS(au.astype(jnp.float32)),
        padS(av.astype(jnp.float32)), padS(hs.astype(jnp.float32)),
        padS(ws.astype(jnp.float32)),
    ] + [jnp.zeros((s_pad,), jnp.float32)] * 7)              # (16, S)

    K = n_steps
    NEG = -3.0e38

    def kernel(wt_ref, rt_ref, par_ref, out_ref):
        w = wt_ref[...]                                      # (EW, EW, 128)
        r = rt_ref[...]                                      # (8, 8, 128)

        def box(x):
            acc = x[:, 0:ow, :]
            for dx in range(1, PATCH):
                acc = acc + x[:, dx:dx + ow, :]
            acc2 = acc[0:ow]
            for dy in range(1, PATCH):
                acc2 = acc2 + acc[dy:dy + ow]
            return acc2

        sum_t = box(w)                                       # (ow, ow, 128)
        sum_t2 = box(w * w)
        corr = w[0:ow, 0:ow, :] * r[0, 0, :]
        for i in range(PATCH):
            for j in range(PATCH):
                if i == 0 and j == 0:
                    continue
                corr = corr + w[i:i + ow, j:j + ow, :] * r[i, j, :]
        area = jnp.float32(PATCH * PATCH)
        ref_mean = jnp.mean(r, axis=(0, 1))                  # (128,)
        ref_den = jnp.sum((r - ref_mean) ** 2, axis=(0, 1))
        var_t = jnp.maximum(sum_t2 - sum_t * sum_t / area, 0.0)
        zm = (corr - ref_mean * sum_t) / (
            jnp.sqrt(ref_den * var_t) + 1e-12)               # (ow, ow, 128)

        su0_ = par_ref[0]
        sv0_ = par_ref[1]
        du = par_ref[2]
        dv = par_ref[3]
        nl = par_ref[4]
        au_ = par_ref[5]
        av_ = par_ref[6]
        hf = par_ref[7]
        wf = par_ref[8]

        kf = jax.lax.broadcasted_iota(jnp.int32, (K, _SB), 0).astype(jnp.float32)
        su = su0_[None, :] + du[None, :] * kf                # (K, 128)
        sv = sv0_[None, :] + dv[None, :] * kf

        rows = jnp.zeros((K, ow, _SB), jnp.float32)
        for y in range(ow):
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(sv - float(y)))
            rows = rows + wy[:, None, :] * zm[y][None, :, :]
        scores = jnp.zeros((K, _SB), jnp.float32)
        for x in range(ow):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(su - float(x)))
            scores = scores + wx * rows[:, x, :]

        pu = su + 4.0 + au_[None, :]
        pv = sv + 4.0 + av_[None, :]
        mask = ((kf <= nl[None, :])
                & (su >= 0.0) & (su <= float(ow - 1))
                & (sv >= 0.0) & (sv <= float(ow - 1))
                & (pu - 4.0 >= 0.0) & (pu + 4.0 <= wf[None, :] - 1.0)
                & (pv - 4.0 >= 0.0) & (pv + 4.0 <= hf[None, :] - 1.0))
        scores = jnp.where(mask, scores, NEG)

        best = jnp.max(scores, axis=0)                       # (128,)
        kb = jnp.min(jnp.where(scores >= best[None, :], kf, jnp.float32(K)),
                     axis=0)
        far = jnp.abs(kf - kb[None, :]) > 1.0
        second = jnp.max(jnp.where(far, scores, NEG), axis=0)

        out_ref[...] = jnp.concatenate([
            best[None, :], second[None, :], kb[None, :],
            jnp.zeros((5, _SB), jnp.float32),
        ], axis=0)

    gs = pl.GridSpec(
        grid=(s_pad // _SB,),
        in_specs=[
            pl.BlockSpec((ew, ew, _SB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PATCH, PATCH, _SB), lambda i: (0, 0, i),
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
    neg_inf = jnp.float32(-jnp.inf)
    best = jnp.where(out[0, :s] <= -1.0e38, neg_inf, out[0, :s])
    second = jnp.where(out[1, :s] <= -1.0e38, neg_inf, out[1, :s])
    k_best = jnp.clip(out[2, :s].astype(jnp.int32), 0, n_steps - 1)
    return best, second, k_best
