"""Pallas TPU kernels for per-feature window extraction.

The framework's single most reused data movement is "pull an aligned
(win × win) window around each of N features out of a pyramid level"
(coarse tracker reference/current patches, matcher search windows, epipolar
windows, seed host windows — SURVEY.md §3.5).  The XLA formulation
(one-hot matmuls, ops/gatherless.py) costs ~1.9 ms per 3-level pack at
S=1536 inside the per-frame scan; this Pallas kernel does it in ~0.4 ms.

Kernel shape (Mosaic constraints drive the design):
  * VMEM vector loads need dim-0 offsets ≡ 0 (mod 8) and dim-1 offsets
    ≡ 0 (mod 128) — the kernel loads an aligned (ROWS, 256) block at the
    floored anchor and realigns in-register with two dynamic
    ``pltpu.roll``s, then writes the exact (win, win) window.
  * dynamic-shift rolls along the sublane axis miscompile for some
    non-power-of-two row counts (verified wrong at 56, correct at 16/32/64
    on v5e) — ROWS is always a power of two.
  * images are pre-padded so every aligned block stays in bounds; anchors
    are pre-clipped by the caller (ops/gatherless.clip_anchor semantics).

The multi-level variant fuses the per-level extraction + select of
``ops.epipolar.pack_level_windows`` into one kernel pass: each seed's level
index picks which pyramid ref to slice.  Falls back to the XLA path off-TPU
(CPU tests run the identical gatherless formulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK = 64          #: seeds per grid program
_COLS = 256          #: aligned block width (covers dc<=127 + win<=128)


def _rows_for(win: int) -> int:
    r = 16
    while r < win + 8:
        r *= 2
    return r


def _pad_img(img, rows: int):
    h, w = img.shape
    hp = -(-(h + rows) // 8) * 8
    wp = -(-(w + _COLS) // 128) * 128
    return jnp.pad(img, ((0, hp - h), (0, wp - w)))


#: Testing hook (tests/test_pallas_parity.py): when True, every Pallas call
#: site in the package runs its kernel under the Pallas interpreter on the
#: current backend, and :func:`on_tpu` reports True so production branches
#: take the kernel path on CPU.  Toggling requires ``jax.clear_caches()`` —
#: the flag is read at trace time.
_FORCE_INTERPRET = False


def force_interpret(enable: bool) -> None:
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(enable)


def interpret_mode() -> bool:
    """Value for ``pallas_call(interpret=...)`` — read at trace time."""
    return _FORCE_INTERPRET


def on_tpu() -> bool:
    if _FORCE_INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


@functools.partial(jax.jit, static_argnames=("win",))
def extract_windows_tpu(img, au, av, win: int):
    """(N, win, win) windows at integer anchors — Pallas path.

    Anchors must already be clipped to [0, dim - win].  N is padded to the
    block size internally; the padded rows read anchor (0, 0) harmlessly.
    """
    rows = _rows_for(win)
    n = au.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    au_p = jnp.pad(au.astype(jnp.int32), (0, n_pad - n))
    av_p = jnp.pad(av.astype(jnp.int32), (0, n_pad - n))
    imgp = _pad_img(img.astype(jnp.float32), rows)

    def kernel(au_ref, av_ref, img_ref, out_ref):
        i = pl.program_id(0)

        def body(j, _):
            s = i * _BLOCK + j
            u = au_ref[s]
            v = av_ref[s]
            u128 = pl.multiple_of((u // 128) * 128, 128)
            v8 = pl.multiple_of((v // 8) * 8, 8)
            blk = img_ref[pl.ds(v8, rows), pl.ds(u128, _COLS)]
            blk = pltpu.roll(blk, -(v - v8), 0)
            blk = pltpu.roll(blk, -(u - u128), 1)
            out_ref[j] = blk[:win, :win]
            return 0

        jax.lax.fori_loop(0, _BLOCK, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // _BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BLOCK, win, win), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=gs, interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((n_pad, win, win), jnp.float32),
    )(au_p, av_p, imgp)
    return out[:n]


@functools.partial(jax.jit, static_argnames=("win", "n_levels"))
def pack_level_windows_tpu(pyr, level, au, av, win: int, n_levels: int):
    """Fused multi-level window extraction: seed s reads its (win × win)
    window from ``pyr[level[s]]`` at anchors (au[s], av[s]) — one kernel
    pass instead of one extraction per level.

    Anchors are in each seed's OWN level coordinates, pre-clipped.
    """
    rows = _rows_for(win)
    n = au.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    au_p = jnp.pad(au.astype(jnp.int32), (0, n_pad - n))
    av_p = jnp.pad(av.astype(jnp.int32), (0, n_pad - n))
    lv_p = jnp.pad(level.astype(jnp.int32), (0, n_pad - n))
    imgs = [_pad_img(pyr[l].astype(jnp.float32), rows) for l in range(n_levels)]

    def kernel(lv_ref, au_ref, av_ref, *refs):
        img_refs = refs[:n_levels]
        out_ref = refs[n_levels]
        i = pl.program_id(0)

        def body(j, _):
            s = i * _BLOCK + j
            u = au_ref[s]
            v = av_ref[s]
            lv = lv_ref[s]
            u128 = pl.multiple_of((u // 128) * 128, 128)
            v8 = pl.multiple_of((v // 8) * 8, 8)

            def load(l):
                return lambda: img_refs[l][pl.ds(v8, rows), pl.ds(u128, _COLS)]

            blk = jax.lax.switch(lv, [load(l) for l in range(n_levels)])
            blk = pltpu.roll(blk, -(v - v8), 0)
            blk = pltpu.roll(blk, -(u - u128), 1)
            out_ref[j] = blk[:win, :win]
            return 0

        jax.lax.fori_loop(0, _BLOCK, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // _BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_levels,
        out_specs=pl.BlockSpec((_BLOCK, win, win), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel, grid_spec=gs, interpret=interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((n_pad, win, win), jnp.float32),
    )(lv_p, au_p, av_p, *imgs)
    return out[:n]
