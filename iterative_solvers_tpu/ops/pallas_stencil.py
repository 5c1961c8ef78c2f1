"""Pallas TPU kernels for the hot stencil path.

XLA already fuses the shifted-slice stencil pipelines in :mod:`.stencils`
well; these kernels exist for the cases where manual control wins:

- :func:`lap_periodic_pallas` — 5-point periodic Laplacian as a
  double-buffered slab pipeline.
- :func:`sh_operator_pallas` — the fused Swift–Hohenberg operator
  ``-Lap^2 - 2 Lap + (r-1) I``: one slab load per block feeds the double
  Laplacian, halving HBM traffic vs two separate Laplacian passes.

Both run as a SINGLE kernel invocation (``grid=()``) with an internal
``fori_loop`` over row chunks and two-slot input/output VMEM buffers:
while chunk *i* computes, the HBM->VMEM load of chunk *i+1* and the
VMEM->HBM store of chunk *i-1* are in flight.  Measured at 4096² f32 on
v5e (tools/tune_sh_kernel.py, round 2): lap 0.195 ms = 84% of the HBM
roofline (3.9x XLA); sh 0.267 ms = 61% in min-bytes terms (8.5x XLA).
The sh kernel is compute-bound, not pipeline-bound: a two-pass
implementation moves >= 4 n² dtype bytes = 0.33 ms minimum at roofline,
so the fused kernel already beats the best possible unfused schedule by
1.2x; block_rows=128 is optimal (256 within 5%, 512 loses pipelining to
VMEM pressure).  A grid-stepped variant with ``pl.when``-predicated
cross-step DMA stalled in Mosaic and was abandoned.

Mosaic constraints honoured here:
- DMA destinations in VMEM must be sublane-aligned, so the halo strips are
  8 rows (f32 tile height) regardless of the stencil's 1-2 row needs; the
  compute slices the loaded slab at the exact offsets.
- Python int literals become i64 under x64 and break Mosaic lowering
  (``tpu.memref_slice``/``dynamic_rotate`` want i32) — every kernel-side
  constant is wrapped in ``jnp.int32``.

Both functions fall back to the jnp implementations off-TPU (CPU tests run
the fallback; the TPU bench exercises the kernels).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import stencils

_HALO = 8  # f32 sublane tile height — DMA-aligned halo strip


def _on_tpu() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


def _roll_lanes(x, shift):
    """Circular shift along the last (lane) axis inside the kernel
    (pltpu.roll requires a non-negative shift)."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(x, shift=jnp.int32(shift % x.shape[1]), axis=1)


def _lap_rows(s, inv_h2, lo, hi):
    """5-point periodic Laplacian of rows [lo, hi) of the loaded slab value
    (columns periodic via lane rolls)."""
    core = s[lo:hi, :]
    left = _roll_lanes(core, 1)
    right = _roll_lanes(core, -1)
    return (s[lo - 1:hi - 1, :] + s[lo + 1:hi + 1, :] + left + right
            - 4.0 * core) * inv_h2


def _double_buffered_stencil(n_rows, n_cols, bm, compute, dtype,
                             slots: int = 2, streams: int = 1):
    """Slab pipeline: ``compute((bm + 2*HALO, n) slab) -> (bm, n) block``,
    ``slots``-deep buffered on both the input loads and the output stores
    (2 = classic double buffering; deeper keeps more DMAs in flight, which
    hides per-chunk DMA latency at HBM-streaming sizes where the 2-slot
    pipeline measured only ~320 GB/s of the ~670 achievable).

    ``streams`` processes that many grid sections concurrently — each body
    iteration loads/computes/stores one chunk of EVERY section, so the
    DMA engines see ``streams`` independent load streams and ``streams``
    store streams.  Motivation (r5 stream ladder, tools/stream_ladder.py):
    a single load stream pins at ~half the chip's aggregate bandwidth
    while the 14-stream SpMV pipeline and the read+write-overlapped copy
    kernel reach ~700+ GB/s — the few-stream kernels' gap is stream
    COUNT, not queue depth.

    The VMEM limit is derived from the actual scratch footprint rather than
    hardcoded, so larger ``block_rows``/``slots`` requests compile instead
    of tripping a fixed cap.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunks_total = n_rows // bm
    assert nchunks_total % streams == 0
    nchunks = nchunks_total // streams  # loop trip count (chunks per stream)
    slots = min(slots, nchunks)
    itemsize = jnp.dtype(dtype).itemsize
    scratch_bytes = (streams * (slots * (bm + 2 * _HALO) + slots * bm)
                     * n_cols * itemsize)
    # Mosaic's scoped-vmem accounting also charges the compute body's
    # intermediates (~4 block-sized temps for the fused double Laplacian),
    # so budget 2.5x the declared scratch plus fixed slack.
    vmem_limit = int(2.5 * scratch_bytes) + 8 * 1024 * 1024

    def kernel(u_hbm, out_hbm, slabs, outs, in_sems, out_sems):
        def in_copies(st, slot, idx):
            """Rows [gidx*bm - HALO, gidx*bm + bm + HALO) of u (periodic
            wrap) into slabs[st, slot], where gidx = st*nchunks + idx.
            Wrap only triggers at the global first/last chunk because
            bm >= HALO."""
            gidx = jnp.int32(st * nchunks) + idx
            st = jnp.int32(st)  # python int -> i64 under x64 breaks Mosaic
            start = pl.multiple_of(gidx * jnp.int32(bm), _HALO)
            mid = pltpu.make_async_copy(
                u_hbm.at[pl.ds(start, bm), :],
                slabs.at[st, slot, pl.ds(_HALO, bm), :],
                in_sems.at[st, slot, jnp.int32(0)],
            )
            top_src = pl.multiple_of(
                jnp.where(gidx == 0, jnp.int32(n_rows - _HALO),
                          start - jnp.int32(_HALO)), _HALO)
            top = pltpu.make_async_copy(
                u_hbm.at[pl.ds(top_src, _HALO), :],
                slabs.at[st, slot, pl.ds(0, _HALO), :],
                in_sems.at[st, slot, jnp.int32(1)],
            )
            bot_src = pl.multiple_of(
                jnp.where(gidx == nchunks_total - 1, jnp.int32(0),
                          start + jnp.int32(bm)), _HALO)
            bot = pltpu.make_async_copy(
                u_hbm.at[pl.ds(bot_src, _HALO), :],
                slabs.at[st, slot, pl.ds(_HALO + bm, _HALO), :],
                in_sems.at[st, slot, jnp.int32(2)],
            )
            return (mid, top, bot)

        def out_copy(st, slot, idx):
            gidx = jnp.int32(st * nchunks) + idx
            st = jnp.int32(st)
            dst = pl.multiple_of(gidx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                outs.at[st, slot], out_hbm.at[pl.ds(dst, bm), :],
                out_sems.at[st, slot],
            )

        for j in range(slots - 1):  # warm-up: slots-1 chunks in flight
            for st in range(streams):
                for c in in_copies(st, jnp.int32(j), jnp.int32(j)):
                    c.start()

        def body(idx, _):
            slot = lax.rem(idx, jnp.int32(slots))
            nslot = lax.rem(idx + jnp.int32(slots - 1), jnp.int32(slots))

            @pl.when(idx + (slots - 1) < nchunks)
            def _():
                for st in range(streams):
                    for c in in_copies(st, nslot, idx + jnp.int32(slots - 1)):
                        c.start()

            for st in range(streams):
                for c in in_copies(st, slot, idx):
                    c.wait()

            # outs[st, slot] still streaming to HBM from ``slots`` ago
            @pl.when(idx >= slots)
            def _():
                for st in range(streams):
                    out_copy(st, slot, idx - jnp.int32(slots)).wait()

            for st in range(streams):
                sti = jnp.int32(st)
                outs[sti, slot] = compute(slabs[sti, slot])
                out_copy(st, slot, idx).start()
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body, jnp.int32(0))

        for j in range(max(0, nchunks - slots), nchunks):  # drain stores
            for st in range(streams):
                out_copy(st, jnp.int32(j % slots), jnp.int32(j)).wait()

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        scratch_shapes=[
            pltpu.VMEM((streams, slots, bm + 2 * _HALO, n_cols), dtype),
            pltpu.VMEM((streams, slots, bm, n_cols), dtype),
            pltpu.SemaphoreType.DMA((streams, slots, 3)),
            pltpu.SemaphoreType.DMA((streams, slots)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=vmem_limit,
        ),
    )


def _pallas_eligible(u, block_rows: int) -> bool:
    """Static (trace-time) gate for the kernel path: TPU platform, f32 data
    (Mosaic lowering here is f32-only; f64 falls back to the XLA stencils),
    and a row count that blocks evenly."""
    return (
        _on_tpu()
        and u.dtype == jnp.float32
        and u.shape[0] % block_rows == 0
        and u.shape[0] >= 2 * block_rows
    )


def lap_periodic_pallas(u, h: float, block_rows: int = 128,
                        slots: int = 2, streams: int = 1):
    """Buffered blocked periodic Laplacian (0.77 useful-byte fraction at
    4096² f32 on v5e; ``slots`` deepens the DMA pipeline, ``streams``
    processes that many grid sections as concurrent load/store streams —
    see _double_buffered_stencil).  Falls back to jnp off-TPU, for non-f32
    dtypes, or when the grid is too small to block."""
    n_rows, n_cols = u.shape
    if (not _pallas_eligible(u, block_rows)
            or (n_rows // block_rows) % streams):
        return stencils.lap_periodic(u, h)

    bm = block_rows
    inv_h2 = 1.0 / (h * h)

    def compute(s):
        return _lap_rows(s, inv_h2, _HALO, _HALO + bm)

    return _double_buffered_stencil(n_rows, n_cols, bm, compute, u.dtype,
                                    slots=slots, streams=streams)(u)


def sh_operator_pallas(u, h: float, r: float, block_rows: int = 128):
    """Fused L = -Lap^2 - 2 Lap + (r-1) I with a single slab load per chunk
    (double-Laplacian halo folded into the 8-row aligned strips).  The
    fusion halves HBM traffic vs two Laplacian passes; the kernel is
    compute-bound (61% of roofline in min-bytes terms = 1.2x the bandwidth
    the best possible two-pass implementation could reach; 8.5x the XLA
    lowering — measured 0.267 ms at 4096² f32 v5e, tools/tune_sh_kernel.py)."""
    n_rows, n_cols = u.shape
    if not _pallas_eligible(u, block_rows):
        return stencils.sh_linear_operator(u, h, r)

    bm = block_rows
    inv_h2 = 1.0 / (h * h)

    def compute(s):
        # first Laplacian on rows [H-1, H+bm+1) — one ghost ring for lap2
        lap1 = _lap_rows(s, inv_h2, _HALO - 1, _HALO + bm + 1)
        lap2 = _lap_rows(lap1, inv_h2, 1, bm + 1)
        core = s[_HALO:_HALO + bm, :]
        return -lap2 - 2.0 * lap1[1:-1, :] + (r - 1.0) * core

    return _double_buffered_stencil(n_rows, n_cols, bm, compute, u.dtype)(u)
