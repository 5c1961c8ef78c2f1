"""Isolating microbenchmark ladder for the few-stream stencil gap (VERDICT
r4 item 2).

RESOLVED r5b (tools/chain_topology_probe.py + PARITY.md): the lap-vs-copy
gap this ladder exposed was the benchmark CHAIN TOPOLOGY, not the kernels
— the lap rows self-chained v=op(v) (XLA inserts a hidden full-field
carry-restore copy around the opaque pallas_call, halving apparent
bandwidth) while this ladder's copy kernel was token-chained.  The same
stencil kernels measure 620-750 GB/s out-of-place or aliased in-place.
The ladder is kept as the diagnostic that localised the gap.

The lap kernel's 2-stream slab pipeline sustains only ~320-335 GB/s at
provably-streaming sizes (>= 6144²) while the 14-stream SpMV pipeline and
the XLA triad reach ~670-710 GB/s.  Candidate explanations: (a) HBM
read<->write turnaround on interleaved load/store streams, (b) per-stream
DMA throughput (one load stream cannot saturate HBM), (c) the 3-DMA halo
split per chunk.  This ladder pins it down with three synthetic kernels
through the SAME double-buffered slab structure as
ops.pallas_stencil._double_buffered_stencil:

  read   — load (bm, n) blocks, fold 8 rows into an accumulator, no big
           store: pure single-direction read stream.
  write  — store (bm, n) blocks from VMEM, no big load: pure write stream.
  copy   — load + store separate buffers: the lap kernel's stream structure
           without halos or compute.

Interpretation matrix:
  read ~ copy ~ lap        -> per-stream DMA bound (one in-flight direction
                              can't saturate; deeper slots should help)
  read fast, copy ~ lap    -> read<->write turnaround / write-stream cost
  read ~ write fast, copy slow -> interleaving penalty (turnaround proper)
  copy fast, lap slow      -> halo DMAs or compute are the gap

Timings use a token-chained fori_loop (one dispatch, marginal between
chain lengths) so the ~30 ms dispatch overhead and VMEM-residency effects
cancel; at 8192² f32 every buffer is 256 MB — nothing fits in VMEM.

Usage: python tools/stream_ladder.py [n] [reps]
Writes one JSON line per (kernel, bm, slots) config.
"""
import functools
import json
import pathlib
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

_HALO = 8


def _pallas_mods():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def read_kernel(n_rows, n_cols, bm, slots, dtype=jnp.float32):
    """(u, tok8) -> acc8: streams u once; only an (8, n) accumulator is
    written back."""
    pl, pltpu = _pallas_mods()
    nchunks = n_rows // bm

    def kernel(u_hbm, tok_hbm, out_hbm, slabs, acc, in_sems, io_sem):
        cp = pltpu.make_async_copy(tok_hbm, acc, io_sem)
        cp.start()
        cp.wait()

        def in_copy(slot, idx):
            start = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(start, bm), :], slabs.at[slot],
                in_sems.at[slot])

        for j in range(slots - 1):
            in_copy(jnp.int32(j), jnp.int32(j)).start()

        def body(idx, _):
            slot = lax.rem(idx, jnp.int32(slots))
            nslot = lax.rem(idx + jnp.int32(slots - 1), jnp.int32(slots))

            @pl.when(idx + (slots - 1) < nchunks)
            def _():
                in_copy(nslot, idx + jnp.int32(slots - 1)).start()

            in_copy(slot, idx).wait()
            acc[...] = acc[...] + slabs[slot, :_HALO, :]
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body, jnp.int32(0),
                      unroll=False)
        cp2 = pltpu.make_async_copy(acc, out_hbm, io_sem)
        cp2.start()
        cp2.wait()

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((_HALO, n_cols), dtype),
        scratch_shapes=[
            pltpu.VMEM((slots, bm, n_cols), dtype),
            pltpu.VMEM((_HALO, n_cols), dtype),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=int(2.5 * slots * bm * n_cols * 4) + (8 << 20),
        ),
    )


def write_kernel(n_rows, n_cols, bm, slots, dtype=jnp.float32):
    """tok8 -> out(n, n): streams out once from VMEM-computed blocks."""
    pl, pltpu = _pallas_mods()
    nchunks = n_rows // bm

    def kernel(tok_hbm, out_hbm, outs, tok, out_sems, io_sem):
        cp = pltpu.make_async_copy(tok_hbm, tok, io_sem)
        cp.start()
        cp.wait()

        def out_copy(slot, idx):
            dst = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                outs.at[slot], out_hbm.at[pl.ds(dst, bm), :],
                out_sems.at[slot])

        def body(idx, _):
            slot = lax.rem(idx, jnp.int32(slots))

            @pl.when(idx >= slots)
            def _():
                out_copy(slot, idx - jnp.int32(slots)).wait()

            row = tok[0:1, :] * 0.5 + idx.astype(dtype)
            outs[slot] = jnp.broadcast_to(row, (bm, n_cols))
            out_copy(slot, idx).start()
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body, jnp.int32(0),
                      unroll=False)
        for j in range(max(0, nchunks - slots), nchunks):
            out_copy(jnp.int32(j % slots), jnp.int32(j)).wait()

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        scratch_shapes=[
            pltpu.VMEM((slots, bm, n_cols), dtype),
            pltpu.VMEM((_HALO, n_cols), dtype),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=int(2.5 * slots * bm * n_cols * 4) + (8 << 20),
        ),
    )


def copy_kernel(n_rows, n_cols, bm, slots, dtype=jnp.float32):
    """(u, tok8) -> out(n, n): load + store, separate buffers — the lap
    pipeline's stream structure minus halos/compute."""
    pl, pltpu = _pallas_mods()
    nchunks = n_rows // bm

    def kernel(u_hbm, tok_hbm, out_hbm, slabs, tok, in_sems, out_sems,
               io_sem):
        cp = pltpu.make_async_copy(tok_hbm, tok, io_sem)
        cp.start()
        cp.wait()

        def in_copy(slot, idx):
            start = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                u_hbm.at[pl.ds(start, bm), :], slabs.at[slot],
                in_sems.at[slot])

        def out_copy(slot, idx):
            dst = pl.multiple_of(idx * jnp.int32(bm), _HALO)
            return pltpu.make_async_copy(
                slabs.at[slot], out_hbm.at[pl.ds(dst, bm), :],
                out_sems.at[slot])

        for j in range(slots - 1):
            in_copy(jnp.int32(j), jnp.int32(j)).start()

        def body(idx, _):
            slot = lax.rem(idx, jnp.int32(slots))
            nslot = lax.rem(idx + jnp.int32(slots - 1), jnp.int32(slots))

            @pl.when(idx + (slots - 1) < nchunks)
            def _():
                in_copy(nslot, idx + jnp.int32(slots - 1)).start()

            in_copy(slot, idx).wait()

            @pl.when(idx >= slots)
            def _():
                out_copy(slot, idx - jnp.int32(slots)).wait()

            # token folded into the first row so the chain is data-dependent
            slabs[slot, :_HALO, :] = slabs[slot, :_HALO, :] + tok[...] * 0.0
            out_copy(slot, idx).start()
            return jnp.int32(0)

        lax.fori_loop(jnp.int32(0), jnp.int32(nchunks), body, jnp.int32(0),
                      unroll=False)
        for j in range(max(0, nchunks - slots), nchunks):
            out_copy(jnp.int32(j % slots), jnp.int32(j)).wait()

    return pl.pallas_call(
        kernel,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_rows, n_cols), dtype),
        scratch_shapes=[
            pltpu.VMEM((slots, bm, n_cols), dtype),
            pltpu.VMEM((_HALO, n_cols), dtype),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=int(3.0 * slots * bm * n_cols * 4) + (8 << 20),
        ),
    )


def time_chain(fn_tok, tok0, ks=(4, 16), reps=5):
    """Marginal ms/call between chain lengths; fn_tok: tok -> tok."""
    @functools.partial(jax.jit, static_argnums=1)
    def chain(tok, k):
        return lax.fori_loop(0, k, lambda i, t: fn_tok(t), tok)

    def run(k):
        float(jnp.sum(chain(tok0, k)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(chain(tok0, k)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return 1000.0 * (run(ks[1]) - run(ks[0])) / (ks[1] - ks[0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    u = jnp.ones((n, n), jnp.float32)
    tok0 = jnp.zeros((_HALO, n), jnp.float32)
    nbytes = n * n * 4

    from iterative_solvers_tpu.utils.roofline import measured_stream_gbps

    triad = measured_stream_gbps(n=min(n, 8192))
    print(json.dumps({"kernel": "xla_triad_reference", "gbps": round(triad, 1)}),
          flush=True)

    for bm in (128, 256, 512):
        for slots in (2, 4, 8):
            if slots * bm > 2048:
                continue
            rk = read_kernel(n, n, bm, slots)
            ms = time_chain(lambda t: rk(u, t), tok0, reps=reps)
            print(json.dumps({
                "kernel": "read", "bm": bm, "slots": slots,
                "ms": round(ms, 3), "gbps": round(nbytes / ms / 1e6, 1),
            }), flush=True)

            wk = write_kernel(n, n, bm, slots)
            ms = time_chain(lambda t: wk(t)[:_HALO, :], tok0, reps=reps)
            print(json.dumps({
                "kernel": "write", "bm": bm, "slots": slots,
                "ms": round(ms, 3), "gbps": round(nbytes / ms / 1e6, 1),
            }), flush=True)

            ck = copy_kernel(n, n, bm, slots)
            ms = time_chain(lambda t: ck(u, t)[:_HALO, :], tok0, reps=reps)
            print(json.dumps({
                "kernel": "copy", "bm": bm, "slots": slots,
                "ms": round(ms, 3),
                "gbps": round(2 * nbytes / ms / 1e6, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
