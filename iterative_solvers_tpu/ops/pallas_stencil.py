"""Pallas TPU kernels for the hot stencil path.

XLA already fuses the shifted-slice stencil pipelines in :mod:`.stencils`
well; these kernels exist for the cases where manual control wins:

- :func:`lap_periodic_pallas` — blocked 5-point periodic Laplacian.  Each
  grid step DMAs a row slab from HBM into VMEM (wrapped halo rows fetched
  explicitly, so no full-array roll ever materialises in HBM the way XLA's
  ``jnp.roll`` lowering can), applies the stencil with in-register lane
  rolls, and writes one ``(bm, n)`` output block.
- :func:`sh_operator_pallas` — the fused Swift–Hohenberg operator
  ``-Lap^2 - 2 Lap + (r-1) I``: one slab load per block feeds the double
  Laplacian, halving HBM traffic vs two separate Laplacian passes.

Mosaic constraint: DMA destinations in VMEM must be sublane-aligned, so the
halo strips are 8 rows wide (f32 tile height) regardless of the stencil's
1-2 row needs; the compute slices the loaded values at the exact offsets.

Both functions fall back to the jnp implementations off-TPU (CPU tests run
the fallback; the TPU bench exercises the kernels).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import stencils

_HALO = 8  # f32 sublane tile height — DMA-aligned halo strip


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def _roll_lanes(x, shift):
    """Circular shift along the last (lane) axis inside the kernel
    (pltpu.roll requires a non-negative shift)."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, shift=jnp.int32(shift % x.shape[1]), axis=1)


def _load_slab(u_hbm, slab, sem, i, bm, n_rows):
    """DMA rows [i*bm - 8, i*bm + bm + 8) of u (periodic wrap) into slab.

    All VMEM destination offsets are multiples of 8 (Mosaic sublane tiling);
    the periodic wrap only ever triggers on the first/last grid step because
    bm >= 8.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ng = pl.num_programs(0)
    start = pl.multiple_of(i * bm, _HALO)
    mid = pltpu.make_async_copy(
        u_hbm.at[pl.ds(start, bm), :], slab.at[pl.ds(_HALO, bm), :], sem.at[jnp.int32(0)]
    )
    mid.start()
    # NB: jnp.int32 constants — Python ints lower as i64 under x64 and
    # trigger an MLIR closed_call caching bug inside pallas kernels
    top_src = pl.multiple_of(
        jnp.where(i == 0, jnp.int32(n_rows - _HALO),
                  start - jnp.int32(_HALO)), _HALO
    )
    top = pltpu.make_async_copy(
        u_hbm.at[pl.ds(top_src, _HALO), :], slab.at[pl.ds(0, _HALO), :],
        sem.at[jnp.int32(1)],
    )
    top.start()
    bot_src = pl.multiple_of(
        jnp.where(i == ng - 1, jnp.int32(0), start + jnp.int32(bm)), _HALO
    )
    bot = pltpu.make_async_copy(
        u_hbm.at[pl.ds(bot_src, _HALO), :],
        slab.at[pl.ds(_HALO + bm, _HALO), :], sem.at[jnp.int32(2)],
    )
    bot.start()
    mid.wait()
    top.wait()
    bot.wait()


def _lap_rows(s, inv_h2, lo, hi):
    """5-point periodic Laplacian of rows [lo, hi) of the loaded slab value
    (columns periodic via lane rolls)."""
    core = s[lo:hi, :]
    left = _roll_lanes(core, 1)
    right = _roll_lanes(core, -1)
    return (s[lo - 1:hi - 1, :] + s[lo + 1:hi + 1, :] + left + right
            - 4.0 * core) * inv_h2


def lap_periodic_pallas(u, h: float, block_rows: int = 128):
    """Blocked periodic Laplacian.  Falls back to jnp off-TPU or when the
    grid is too small to block."""
    n_rows, n_cols = u.shape
    if not _on_tpu() or n_rows % block_rows or n_rows < 2 * block_rows:
        return stencils.lap_periodic(u, h)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm = block_rows
    inv_h2 = 1.0 / (h * h)

    def kernel(u_hbm, out_ref, slab, sem):
        i = pl.program_id(0)
        _load_slab(u_hbm, slab, sem, i, bm, n_rows)
        out_ref[:, :] = _lap_rows(slab[:, :], inv_h2, _HALO, _HALO + bm)

    return pl.pallas_call(
        kernel,
        grid=(n_rows // bm,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((bm, n_cols), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm + 2 * _HALO, n_cols), u.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(u)


def sh_operator_pallas(u, h: float, r: float, block_rows: int = 128):
    """Fused L = -Lap^2 - 2 Lap + (r-1) I with a single slab load per block
    (double-Laplacian halo folded into the 8-row aligned strips)."""
    n_rows, n_cols = u.shape
    if not _on_tpu() or n_rows % block_rows or n_rows < 2 * block_rows:
        return stencils.sh_linear_operator(u, h, r)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm = block_rows
    inv_h2 = 1.0 / (h * h)

    def kernel(u_hbm, out_ref, slab, sem):
        i = pl.program_id(0)
        _load_slab(u_hbm, slab, sem, i, bm, n_rows)
        s = slab[:, :]
        # first Laplacian on rows [H-1, H+bm+1) — one ghost ring for lap2
        lap1 = _lap_rows(s, inv_h2, _HALO - 1, _HALO + bm + 1)
        # second Laplacian on the core rows of lap1
        lap2 = _lap_rows(lap1, inv_h2, 1, bm + 1)
        core = s[_HALO:_HALO + bm, :]
        out_ref[:, :] = -lap2 - 2.0 * lap1[1:-1, :] + (r - 1.0) * core

    return pl.pallas_call(
        kernel,
        grid=(n_rows // bm,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((bm, n_cols), lambda i: (i, jnp.int32(0)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        scratch_shapes=[
            pltpu.VMEM((bm + 2 * _HALO, n_cols), u.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(u)
