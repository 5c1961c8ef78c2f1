"""Pallas TPU SpMV for the structured-grid DIA format (GridDIA).

BASELINE.json's metric line is "SpMV nnz/s + GB/s per chip".  The XLA
shift-pipeline form of :meth:`.sparse.GridDIA.matvec` reaches ~34% of the
HBM roofline at 1024² (13 pts/row); this kernel streams the coefficient
fields and the vector through the same double-buffered slab pipeline as
ops.pallas_stencil and closes most of the remaining gap.

Correctness hinges on a GridDIA invariant (guaranteed by
``GridDIA.from_scipy``): a coefficient field is zero wherever its shift
would read outside the grid.  The kernel therefore needs no masking at
all — halo rows beyond the domain edge are loaded as (finite) duplicates
and wrapped lane rolls read the cyclic neighbour, but both are multiplied
by structurally-zero coefficients.

Traffic per block: the (nterms, bm, n) coefficient chunk dominates; x is
read once with an 8-row halo and y written once, so the kernel is a pure
streaming workload — exactly what the double-buffered DMA pipeline hides.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .sparse import GridDIA
from .pallas_stencil import _on_tpu

_HALO = 8  # f32 sublane tile height; also the max supported |dy|


def grid_dia_matvec_pallas(a: GridDIA, x2, block_rows: int = 64):
    """``y = A @ x`` on the 2-D grid view; falls back to the XLA pipeline
    off-TPU, for non-f32 dtypes, for unaligned shapes, or |dy| > 8."""
    ny, nx = a.grid
    max_dy = max((abs(dy) for dy, _ in a.shifts), default=0)
    if (not _on_tpu() or x2.dtype != jnp.float32
            or a.data.dtype != jnp.float32
            or ny % block_rows or ny < 2 * block_rows or max_dy > _HALO):
        return a._apply(x2)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm = block_rows
    nchunks = ny // bm
    nterms = len(a.shifts)
    shifts = a.shifts

    def kernel(x_hbm, d_hbm, out_hbm, xs, ds, outs, x_sems, d_sems, out_sems):
        def x_copies(slot, idx):
            start = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            mid = pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, bm), :],
                xs.at[slot, pl.ds(_HALO, bm), :],
                x_sems.at[slot, jnp.int32(0)],
            )
            # clamped halo sources: beyond-edge rows are duplicates whose
            # products are killed by structurally-zero coefficients
            top_src = pl.multiple_of(
                jnp.where(idx == 0, jnp.int32(0), start - jnp.int32(_HALO)),
                _HALO)
            top = pltpu.make_async_copy(
                x_hbm.at[pl.ds(top_src, _HALO), :],
                xs.at[slot, pl.ds(0, _HALO), :],
                x_sems.at[slot, jnp.int32(1)],
            )
            bot_src = pl.multiple_of(
                jnp.where(idx == nchunks - 1, jnp.int32(ny - _HALO),
                          start + jnp.int32(bm)), _HALO)
            bot = pltpu.make_async_copy(
                x_hbm.at[pl.ds(bot_src, _HALO), :],
                xs.at[slot, pl.ds(_HALO + bm, _HALO), :],
                x_sems.at[slot, jnp.int32(2)],
            )
            return (mid, top, bot)

        def d_copy(slot, idx):
            start = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                d_hbm.at[:, pl.ds(start, bm), :],
                ds.at[slot],
                d_sems.at[slot],
            )

        def out_copy(slot, idx):
            dst = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(dst, bm), :],
                out_sems.at[slot],
            )

        for c in x_copies(jnp.int32(0), jnp.int32(0)):
            c.start()
        d_copy(jnp.int32(0), jnp.int32(0)).start()

        def body(idx, _):
            slot = lax.rem(idx, jnp.int32(2))
            nslot = lax.rem(idx + jnp.int32(1), jnp.int32(2))

            @pl.when(idx + 1 < nchunks)
            def _():
                for c in x_copies(nslot, idx + jnp.int32(1)):
                    c.start()
                d_copy(nslot, idx + jnp.int32(1)).start()

            for c in x_copies(slot, idx):
                c.wait()
            d_copy(slot, idx).wait()

            @pl.when(idx >= 2)
            def _():
                out_copy(slot, idx - jnp.int32(2)).wait()

            slab = xs[slot]
            dchunk = ds[slot]
            acc = jnp.zeros((bm, nx), jnp.float32)
            for k, (dy, dx) in enumerate(shifts):
                rows = slab[_HALO + dy:_HALO + dy + bm, :]
                if dx % nx:
                    rows = pltpu.roll(rows, shift=jnp.int32((-dx) % nx),
                                      axis=1)
                acc = acc + dchunk[k] * rows
            outs[slot] = acc
            out_copy(slot, idx).start()
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body, jnp.int32(0))

        @pl.when(jnp.int32(nchunks) >= 2)
        def _():
            out_copy(jnp.int32(nchunks % 2), jnp.int32(nchunks - 2)).wait()
        out_copy(jnp.int32((nchunks - 1) % 2), jnp.int32(nchunks - 1)).wait()

    itemsize = 4
    scratch_bytes = (2 * (bm + 2 * _HALO) + 2 * nterms * bm + 2 * bm) * nx * itemsize
    vmem_limit = int(1.4 * scratch_bytes) + 8 * 1024 * 1024

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ny, nx), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, bm + 2 * _HALO, nx), jnp.float32),
            pltpu.VMEM((2, nterms, bm, nx), jnp.float32),
            pltpu.VMEM((2, bm, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit,
        ),
    )(x2, a.data)
