"""Pallas TPU kernels for the hot stencil path.

XLA already fuses the shifted-slice stencil pipelines in :mod:`.stencils`
well; these kernels exist for the cases where manual control wins:

- :func:`lap_periodic_pallas` — 5-point periodic Laplacian.
- :func:`sh_operator_pallas` — the fused Swift–Hohenberg operator
  ``-Lap^2 - 2 Lap + (r-1) I``: one slab load per block feeds the double
  Laplacian, halving HBM traffic vs two separate Laplacian passes.

Both default to the r5b **monotonic-stream pipeline**
(:func:`_monotonic_stream_pipeline`): a SINGLE kernel invocation
(``grid=()``) with an internal ``fori_loop`` over row chunks, one
perfectly sequential contiguous load stream and one store stream per
grid section, zero halo DMAs (ghost rows via VMEM carry/look-ahead), a
roll/where compute body (sliced/offset VMEM reads cost 12.4 μs/chunk on
the VPU vs 2.2 for rolls — tools/vpu_rate.py), and optional
``inplace=True`` output aliasing for self-chained time-stepping (the
pipeline is race-free in place by construction).  Measured at 8192² f32
streaming on v5e (BENCH_SUITE_r05): lap 0.79-0.86 of the HBM roofline
and the fused sh operator 0.78-0.80 in min-bytes terms, out-of-place or
aliased in-place alike (~650-750 GB/s; the older halo'd pipeline and the
~330 GB/s self-chained figures are explained in PARITY.md's r5b section
— XLA's hidden carry copy, not the kernels).  The r2 halo'd
double-buffered pipeline (:func:`_double_buffered_stencil`) is kept for
A/B (``mode="halo"``); a grid-stepped variant with
``pl.when``-predicated cross-step DMA stalled in Mosaic and was
abandoned.

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
    # chunk 0 (the only top-wrap chunk) must be loaded by the static
    # warm-up, which requires at least one warm-up iteration per stream
    assert nchunks >= 2, "need >= 2 chunks per stream for the fused load"
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
            """Rows [gidx*bm - HALO, gidx*bm + bm + HALO) of u into
            slabs[st, slot], where gidx = st*nchunks + idx, as ONE fused
            contiguous (HALO+bm)-row DMA (top halo + mid) plus one HALO-row
            bottom-halo DMA (whose source wraps to row 0 at the global last
            chunk).  Valid for every chunk except global chunk 0, whose top
            halo wraps to the END of u — that chunk is only ever loaded in
            the static warm-up, which uses :func:`chunk0_copies` instead.

            The fused load is the r5 fix for the few-stream streaming
            ceiling: the 3-DMA halo split (mid + two 8-row strips) pinned
            the pipeline at ~320-340 GB/s at genuinely-streaming sizes
            while the ladder's no-halo copy kernel reached 400-470
            (tools/stream_ladder.py; PARITY.md r5 section)."""
            gidx = jnp.int32(st * nchunks) + idx
            st = jnp.int32(st)  # python int -> i64 under x64 breaks Mosaic
            start = pl.multiple_of(gidx * jnp.int32(bm), _HALO)
            top_start = pl.multiple_of(start - jnp.int32(_HALO), _HALO)
            main = pltpu.make_async_copy(
                u_hbm.at[pl.ds(top_start, _HALO + bm), :],
                slabs.at[st, slot, pl.ds(0, _HALO + bm), :],
                in_sems.at[st, slot, jnp.int32(0)],
            )
            bot_src = pl.multiple_of(
                jnp.where(gidx == nchunks_total - 1, jnp.int32(0),
                          start + jnp.int32(bm)), _HALO)
            bot = pltpu.make_async_copy(
                u_hbm.at[pl.ds(bot_src, _HALO), :],
                slabs.at[st, slot, pl.ds(_HALO + bm, _HALO), :],
                in_sems.at[st, slot, jnp.int32(1)],
            )
            return (main, bot)

        def chunk0_copies():
            """Global chunk 0 (stream 0, slot 0): its top halo wraps to the
            last HALO rows of u, so the fused load splits into wrap-top +
            mid; the bottom halo is the regular strip."""
            z = jnp.int32(0)
            top = pltpu.make_async_copy(
                u_hbm.at[pl.ds(jnp.int32(n_rows - _HALO), _HALO), :],
                slabs.at[z, z, pl.ds(0, _HALO), :],
                in_sems.at[z, z, jnp.int32(0)],
            )
            mid = pltpu.make_async_copy(
                u_hbm.at[pl.ds(0, bm), :],
                slabs.at[z, z, pl.ds(_HALO, bm), :],
                in_sems.at[z, z, jnp.int32(2)],
            )
            bot = pltpu.make_async_copy(
                u_hbm.at[pl.ds(jnp.int32(bm), _HALO), :],
                slabs.at[z, z, pl.ds(_HALO + bm, _HALO), :],
                in_sems.at[z, z, jnp.int32(1)],
            )
            return (top, mid, bot)

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
                copies = (chunk0_copies() if st == 0 and j == 0
                          else in_copies(st, jnp.int32(j), jnp.int32(j)))
                for c in copies:
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
                if st == 0:
                    # chunk 0 was loaded by the split warm-up copies; its
                    # waits must match those descriptors exactly
                    @pl.when(idx == jnp.int32(0))
                    def _():
                        for c in chunk0_copies():
                            c.wait()

                    @pl.when(idx != jnp.int32(0))
                    def _():
                        for c in in_copies(0, slot, idx):
                            c.wait()
                else:
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


def _monotonic_stream_pipeline(n_rows, n_cols, bm, compute, dtype,
                               slots: int = 3, streams: int = 1,
                               ghost: int = 1, inplace: bool = False):
    """r5 streaming pipeline: ONE perfectly monotonic contiguous load
    stream (zero halo DMAs) + one monotonic store stream per grid section.

    Ghost rows come from VMEM instead of HBM re-reads: the top ghost row
    is carried from the previous chunk's slab at compute time (tiny VMEM
    copy); the bottom ghost row is read from the NEXT chunk's
    already-loaded slab (the pipeline runs ``slots-1`` chunks ahead, so at
    compute time of chunk *i* the load of chunk *i+1* has been waited);
    the wrap rows at the global top/bottom of each section are fetched
    once into small persistent buffers at warm-up.

    Motivation (tools/stream_ladder.py + the r5 fused-load negative
    result): halo'd slab pipelines pin at ~320-340 GB/s at
    genuinely-streaming sizes regardless of block size, queue depth,
    stream count, DMA fusion, or compute, while the ladder's no-halo copy
    kernel — exactly this stream structure — sustains 400-470 GB/s.  The
    halo'd *read pattern* (overlapping re-reads + per-chunk address
    back-jumps), not the DMA count, is the constraint.

    ``compute(slab, top_ghost, bot_ghost) -> (bm, n_cols)`` where slab
    holds exactly rows [gidx*bm, gidx*bm + bm) and the ghosts are
    ``(ghost, n_cols)`` rows above/below (``ghost`` = stencil depth: 1
    for 5-point, 2 for the fused double Laplacian; must be <= _HALO and
    <= bm).

    ``inplace=True`` declares ``input_output_aliases={0: 0}`` so XLA may
    write the output over the (donated/dead) input buffer.  This pipeline
    is race-free in place BY CONSTRUCTION: per section the load stream is
    strictly monotonic and every chunk's load is waited before its own
    store starts; ghost rows come from VMEM (carry/look-ahead), never
    from HBM re-reads of possibly-written rows; the wrap strips are
    prefetched at warm-up before any store.  Use it for self-chained
    time-stepping (``v = op(v)`` under scan/fori): without it XLA's
    while-loop carry (fixed buffer per slot) inserts a full-field copy
    per iteration to restore the carry buffer — measured r5b: the copy
    halves apparent bandwidth, 330 GB/s vs 650-750 aliased/out-of-place,
    and an explicit two-buffer ping-pong carry does NOT avoid it (carry
    slots have fixed buffers, so swapping contents still copies).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchunks_total = n_rows // bm
    assert nchunks_total % streams == 0
    nchunks = nchunks_total // streams
    assert nchunks >= 2, "need >= 2 chunks per stream"
    slots = min(slots, nchunks)
    itemsize = jnp.dtype(dtype).itemsize
    scratch_bytes = (streams * (2 * slots * bm + 2 * _HALO)
                     * n_cols * itemsize)
    vmem_limit = int(2.5 * scratch_bytes) + 8 * 1024 * 1024

    def kernel(u_hbm, out_hbm, slabs, outs, carry, wrap,
               in_sems, out_sems, aux_sems):
        def load(st, slot, idx):
            gidx = jnp.int32(st * nchunks) + idx
            st = jnp.int32(st)  # python int -> i64 under x64 breaks Mosaic
            start = pl.multiple_of(gidx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(start, bm), :],
                slabs.at[st, slot],
                in_sems.at[st, slot],
            )

        def store(st, slot, idx):
            gidx = jnp.int32(st * nchunks) + idx
            st = jnp.int32(st)
            dst = pl.multiple_of(gidx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                outs.at[st, slot], out_hbm.at[pl.ds(dst, bm), :],
                out_sems.at[st, slot],
            )

        # one-time wrap fetches: rows [sec_start - HALO, sec_start) (top,
        # ghost row = last) and [sec_end, sec_end + HALO) (bottom, ghost
        # row = first), both mod n_rows — 8-row strips for DMA alignment
        aux = []
        for st in range(streams):
            sti = jnp.int32(st)
            top_src = (st * nchunks * bm - _HALO) % n_rows
            aux.append(pltpu.make_async_copy(
                u_hbm.at[pl.ds(jnp.int32(top_src), _HALO), :],
                carry.at[sti], aux_sems.at[sti, jnp.int32(0)]))
            bot_src = ((st + 1) * nchunks * bm) % n_rows
            aux.append(pltpu.make_async_copy(
                u_hbm.at[pl.ds(jnp.int32(bot_src), _HALO), :],
                wrap.at[sti], aux_sems.at[sti, jnp.int32(1)]))
        for c in aux:
            c.start()
        for j in range(slots - 1):  # warm-up: slots-1 chunks in flight
            for st in range(streams):
                load(st, jnp.int32(j), jnp.int32(j)).start()
        for c in aux:
            c.wait()
        for st in range(streams):  # chunk 0 waited here; j>=1 in the body
            load(st, jnp.int32(0), jnp.int32(0)).wait()

        def body(idx, _):
            slot = lax.rem(idx, jnp.int32(slots))
            nslot = lax.rem(idx + jnp.int32(1), jnp.int32(slots))
            lslot = lax.rem(idx + jnp.int32(slots - 1), jnp.int32(slots))

            @pl.when(idx + (slots - 1) < nchunks)
            def _():
                for st in range(streams):
                    load(st, lslot, idx + jnp.int32(slots - 1)).start()

            # each load is waited exactly once: chunk 0 at warm-up,
            # chunk i+1 at body(i)
            @pl.when(idx + 1 < nchunks)
            def _():
                for st in range(streams):
                    load(st, nslot, idx + jnp.int32(1)).wait()

            @pl.when(idx >= slots)
            def _():
                for st in range(streams):
                    store(st, slot, idx - jnp.int32(slots)).wait()

            last = idx == jnp.int32(nchunks - 1)
            g = ghost
            for st in range(streams):
                sti = jnp.int32(st)
                s = slabs[sti, slot]
                top_ghost = carry[sti, _HALO - g:_HALO, :]
                bot_ghost = jnp.where(
                    last, wrap[sti, 0:g, :], slabs[sti, nslot, 0:g, :])
                outs[sti, slot] = compute(s, top_ghost, bot_ghost)
                # carry this chunk's last rows for the next chunk's top
                # ghost (read above happens first — program order)
                carry[sti, _HALO - g:_HALO, :] = s[bm - g:bm, :]
                store(st, slot, idx).start()
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body, jnp.int32(0))

        for j in range(max(0, nchunks - slots), nchunks):  # drain stores
            for st in range(streams):
                store(st, jnp.int32(j % slots), jnp.int32(j)).wait()

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        input_output_aliases={0: 0} if inplace else {},
        scratch_shapes=[
            pltpu.VMEM((streams, slots, bm, n_cols), dtype),
            pltpu.VMEM((streams, slots, bm, n_cols), dtype),
            pltpu.VMEM((streams, _HALO, n_cols), dtype),
            pltpu.VMEM((streams, _HALO, n_cols), dtype),
            pltpu.SemaphoreType.DMA((streams, slots)),
            pltpu.SemaphoreType.DMA((streams, slots)),
            pltpu.SemaphoreType.DMA((streams, 2)),
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
                        slots: int = 2, streams: int = 1,
                        mode: str = "mono", inplace: bool = False):
    """Buffered blocked periodic Laplacian.  ``mode="mono"`` (default)
    runs the r5 monotonic-stream pipeline (no halo DMAs — ghost rows via
    VMEM carry/look-ahead, see _monotonic_stream_pipeline); ``"halo"``
    keeps the fused-halo slab pipeline for A/B.  ``slots`` deepens the
    DMA pipeline, ``streams`` processes that many grid sections as
    concurrent load/store streams.  Falls back to jnp off-TPU, for
    non-f32 dtypes, or when the grid is too small to block."""
    n_rows, n_cols = u.shape
    if (not _pallas_eligible(u, block_rows)
            or (n_rows // block_rows) % streams
            or (n_rows // block_rows) // streams < 2):
        return stencils.lap_periodic(u, h)

    bm = block_rows
    inv_h2 = 1.0 / (h * h)

    if mode == "mono":
        from jax import lax as _lax
        from jax.experimental.pallas import tpu as pltpu

        def compute(s, top_ghost, bot_ghost):
            rows = _lax.broadcasted_iota(jnp.int32, (bm, n_cols), 0)
            up = jnp.where(rows == jnp.int32(0),
                           jnp.broadcast_to(top_ghost, (bm, n_cols)),
                           pltpu.roll(s, shift=jnp.int32(1), axis=0))
            down = jnp.where(rows == jnp.int32(bm - 1),
                             jnp.broadcast_to(bot_ghost, (bm, n_cols)),
                             pltpu.roll(s, shift=jnp.int32(bm - 1), axis=0))
            left = _roll_lanes(s, 1)
            right = _roll_lanes(s, -1)
            return (up + down + left + right - 4.0 * s) * inv_h2

        return _monotonic_stream_pipeline(
            n_rows, n_cols, bm, compute, u.dtype,
            slots=max(slots, 3), streams=streams, inplace=inplace)(u)

    def compute(s):
        return _lap_rows(s, inv_h2, _HALO, _HALO + bm)

    return _double_buffered_stencil(n_rows, n_cols, bm, compute, u.dtype,
                                    slots=slots, streams=streams)(u)


def sh_operator_pallas(u, h: float, r: float, block_rows: int = 128,
                       mode: str = "mono", inplace: bool = False):
    """Fused L = -Lap^2 - 2 Lap + (r-1) I with a single slab load per
    chunk.  The fusion halves HBM traffic vs two Laplacian passes.
    ``mode="mono"`` (default) runs the r5 monotonic-stream pipeline with
    a roll/where compute body (the slice-form body costs 12.4 us/chunk
    on the VPU vs 2.2 for rolls — tools/vpu_rate.py); ``"halo"`` keeps
    the r2 fused-halo slab pipeline for A/B."""
    n_rows, n_cols = u.shape
    if not _pallas_eligible(u, block_rows):
        return stencils.sh_linear_operator(u, h, r)

    bm = block_rows
    inv_h2 = 1.0 / (h * h)

    if mode == "mono":
        from jax import lax as _lax
        from jax.experimental.pallas import tpu as pltpu

        def lap_ghosted(x, top1, bot1):
            """Periodic-in-lanes Laplacian of a (bm, n) block given its
            (1, n) ghost rows, roll/where form."""
            rows = _lax.broadcasted_iota(jnp.int32, (bm, n_cols), 0)
            up = jnp.where(rows == jnp.int32(0),
                           jnp.broadcast_to(top1, (bm, n_cols)),
                           pltpu.roll(x, shift=jnp.int32(1), axis=0))
            down = jnp.where(rows == jnp.int32(bm - 1),
                             jnp.broadcast_to(bot1, (bm, n_cols)),
                             pltpu.roll(x, shift=jnp.int32(bm - 1), axis=0))
            return (up + down + _roll_lanes(x, 1) + _roll_lanes(x, -1)
                    - 4.0 * x) * inv_h2

        def lap_row(above, mid, below):
            """Laplacian of one (1, n) row from its vertical neighbours."""
            return (above + below + _roll_lanes(mid, 1)
                    + _roll_lanes(mid, -1) - 4.0 * mid) * inv_h2

        def compute(s, top, bot):
            # top = u rows [start-2, start); bot = u rows [start+bm, +2)
            lap1 = lap_ghosted(s, top[1:2], bot[0:1])
            lap1_top = lap_row(top[0:1], top[1:2], s[0:1])      # row -1
            lap1_bot = lap_row(s[bm - 1:bm], bot[0:1], bot[1:2])  # row bm
            lap2 = lap_ghosted(lap1, lap1_top, lap1_bot)
            return -lap2 - 2.0 * lap1 + (r - 1.0) * s

        return _monotonic_stream_pipeline(
            n_rows, n_cols, bm, compute, u.dtype, ghost=2,
            inplace=inplace)(u)

    def compute(s):
        # first Laplacian on rows [H-1, H+bm+1) — one ghost ring for lap2
        lap1 = _lap_rows(s, inv_h2, _HALO - 1, _HALO + bm + 1)
        lap2 = _lap_rows(lap1, inv_h2, 1, bm + 1)
        core = s[_HALO:_HALO + bm, :]
        return -lap2 - 2.0 * lap1[1:-1, :] + (r - 1.0) * core

    return _double_buffered_stencil(n_rows, n_cols, bm, compute, u.dtype)(u)
