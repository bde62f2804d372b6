"""Prototype: Pallas aligned-block window extraction vs one-hot matmuls.

Mosaic constraint: VMEM vector loads need dim0 % 8 == 0 and dim1 % 128 == 0.
So the kernel loads (ROWS, COLS) blocks at floor-aligned anchors from a
padded image, and a batched one-hot einsum compacts each block to the exact
(win, win) window outside the kernel.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from hso_tpu.ops.gatherless import extract_windows

H, W, S, WIN, BLOCK = 480, 640, 1536, 48, 64
ROWS = ((WIN + 7) // 8) * 8 + 8          # 56
COLS = ((WIN + 127) // 128) * 128 + 128  # 256? no: 128 + ceil128(WIN)=128 -> 256
COLS = 128 + ((WIN + 127) // 128) * 128  # covers dc(<=127) + WIN
HP = ((H + ROWS + 7) // 8) * 8
WP = ((W + COLS + 127) // 128) * 128


def _kernel(au128_ref, av8_ref, img_ref, out_ref):
    i = pl.program_id(0)

    def body(j, _):
        s = i * BLOCK + j
        u = pl.multiple_of(au128_ref[s], 128)
        v = pl.multiple_of(av8_ref[s], 8)
        out_ref[j] = img_ref[pl.ds(v, ROWS), pl.ds(u, COLS)]
        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


@jax.jit
def extract_pallas(img, au, av):
    imgp = jnp.pad(img, ((0, HP - H), (0, WP - W)))
    au128 = (au // 128) * 128
    av8 = (av // 8) * 8
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(S // BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BLOCK, ROWS, COLS), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM))
    blocks = pl.pallas_call(
        _kernel, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((S, ROWS, COLS), jnp.float32),
    )(au128, av8, imgp)
    # compaction: one-hot row/col selection (exact)
    dr = (av - av8)[:, None, None]
    dc = (au - au128)[:, None, None]
    rr = jnp.arange(WIN)[None, :, None]
    yy = jnp.arange(ROWS)[None, None, :]
    row_sel = (yy == dr + rr).astype(jnp.float32)           # (S, WIN, ROWS)
    xx = jnp.arange(COLS)[None, :, None]
    cc = jnp.arange(WIN)[None, None, :]
    col_sel = (xx == dc + cc).astype(jnp.float32)           # (S, COLS, WIN)
    tmp = jnp.einsum("nry,nyx->nrx", row_sel, blocks,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("nrx,nxc->nrc", tmp, col_sel,
                      precision=jax.lax.Precision.HIGHEST)


@jax.jit
def extract_onehot(img, au, av):
    return extract_windows(img, au, av, WIN)


def bench(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((H, W)), jnp.float32)
au = jnp.asarray(rng.integers(0, W - WIN, S), jnp.int32)
av = jnp.asarray(rng.integers(0, H - WIN, S), jnp.int32)

ms_p, out_p = bench(extract_pallas, img, au, av)
ms_o, out_o = bench(extract_onehot, img, au, av)
err = float(jnp.max(jnp.abs(out_p - out_o)))
print(f"ROWS={ROWS} COLS={COLS}")
print(f"pallas+compact: {ms_p:.3f} ms   onehot: {ms_o:.3f} ms   "
      f"speedup {ms_o/ms_p:.1f}x   maxerr {err:.2e}")
