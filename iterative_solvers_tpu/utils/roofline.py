"""Roofline accounting for the hot kernels (SURVEY.md §5.1, BASELINE.json
">=80% of HBM roofline" target).

Stencil application and SpMV are HBM-bandwidth-bound on TPU; these helpers
compute the bytes each kernel must move and convert measured wall time into
achieved bandwidth / roofline fraction.
"""
from __future__ import annotations

import dataclasses

# v5e ("v5 lite") public specs; override per-platform as needed.
HBM_GBPS = {"tpu v5 lite": 819.0, "tpu v5e": 819.0, "tpu v4": 1228.0,
            "cpu": 50.0}
PEAK_BF16_TFLOPS = {"tpu v5 lite": 197.0, "tpu v5e": 197.0}
# On-chip vector memory per core.  Decisive for honest rooflines: a kernel
# whose whole working set fits in VMEM can be served from VMEM across a
# timing chain (inputs declared memory_space=ANY are placed at the
# compiler's discretion), sustaining apparent "HBM" bandwidths well above
# the HBM peak — the r3 artifact's >1.0 SpMV fractions (VERDICT r3 #5).
# HBM-roofline fractions are only meaningful when the working set is
# comfortably larger than VMEM; see working_set_exceeds_vmem.
VMEM_BYTES = {"tpu v5 lite": 128 * 2**20, "tpu v5e": 128 * 2**20,
              "tpu v4": 128 * 2**20}


def device_vmem_bytes() -> int:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, v in VMEM_BYTES.items():
        if k in kind:
            return v
    return 16 * 2**20


def working_set_exceeds_vmem(bytes_total: int, margin: float = 1.5) -> bool:
    """True when a timing chain over this working set must stream from HBM
    (set > margin x VMEM) — the precondition for quoting an HBM-roofline
    fraction."""
    return bytes_total > margin * device_vmem_bytes()


@dataclasses.dataclass(frozen=True)
class KernelCost:
    bytes_moved: int
    flops: int

    def achieved_gbps(self, seconds: float) -> float:
        return self.bytes_moved / seconds / 1e9

    def roofline_fraction(self, seconds: float, hbm_gbps: float) -> float:
        return self.achieved_gbps(seconds) / hbm_gbps


def stencil_cost(shape: tuple[int, int], dtype_bytes: int,
                 points: int = 5) -> KernelCost:
    """One stencil application: read field once, write once (perfect cache /
    fusion assumption — the roofline), ~2*points flops per node."""
    n = shape[0] * shape[1]
    return KernelCost(bytes_moved=2 * n * dtype_bytes, flops=2 * points * n)


def spmv_cost(nnz: int, n_rows: int, n_cols: int, dtype_bytes: int,
              index_bytes: int = 4, fmt: str = "csr") -> KernelCost:
    """Minimal SpMV byte traffic: values + (indices for csr/coo) + x + y.
    This is the FORMAT-IDEAL lower bound (each value/vector element touched
    once); see :func:`spmv_kernel_cost` for what the diagonal Pallas kernels
    actually move."""
    value_bytes = nnz * dtype_bytes
    index_traffic = 0 if fmt == "dia" else nnz * index_bytes
    vec_bytes = (n_cols + n_rows) * dtype_bytes
    return KernelCost(bytes_moved=value_bytes + index_traffic + vec_bytes,
                      flops=2 * nnz)


def spmv_kernel_cost(ndiags: int, ny: int, nx: int, dtype_bytes: int,
                     block_rows: int = 64, halo: int = 8) -> KernelCost:
    """ACTUAL byte traffic of the diagonal slab-pipeline SpMV kernels
    (ops.pallas_spmv): the ``ndiags`` stored coefficient fields are read in
    FULL (including the zeros a Dirichlet operator stores where a shift
    exits the domain — this is where the nnz-based model undercounts), the
    x field is read once plus a 2*halo-row overlap per block chunk, and y
    is written once.  Use this (with an HBM-validated working set,
    :func:`working_set_exceeds_vmem`) for honest roofline fractions."""
    n = ny * nx
    x_bytes = n * dtype_bytes * (block_rows + 2 * halo) // block_rows
    coef_bytes = ndiags * n * dtype_bytes
    return KernelCost(bytes_moved=coef_bytes + x_bytes + n * dtype_bytes,
                      flops=2 * ndiags * n)


def device_hbm_gbps() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, v in HBM_GBPS.items():
        if k in kind:
            return v
    return HBM_GBPS["cpu"]


_HBM_MEASURED: dict = {}


def measured_stream_gbps(n: int = 8192, reps: int = 5) -> float:
    """Empirically measured HBM streaming bandwidth: a chained f32 triad
    ``v = v + x`` over two ``(n, n)`` fields (3 n² x 4 B per call), timed by
    the marginal-cost method.  The public 819 GB/s v5e figure is slightly
    conservative (sequential streams measure ~3-5% above it), which alone
    pushes honest byte-accounted fractions over 1.0 — roofline
    denominators should use ``max(spec, measured)``.  Cached per process
    keyed on (n, reps)."""
    key = (n, reps)
    if key in _HBM_MEASURED:
        return _HBM_MEASURED[key]
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    x = jnp.ones((n, n), jnp.float32) * 1e-9
    v0 = jnp.zeros((n, n), jnp.float32)
    jf = jax.jit(lambda v, x, k: jnp.sum(
        lax.fori_loop(0, k, lambda i, a: a + x, v)))

    def run(k):
        float(jf(v0, x, k))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jf(v0, x, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t = (run(80) - run(10)) / 70.0
    _HBM_MEASURED[key] = 3 * n * n * 4 / t / 1e9
    return _HBM_MEASURED[key]


def roofline_denominator_gbps() -> float:
    """The honest HBM-roofline denominator: max(public spec, measured
    stream) — a fraction of this can never exceed 1.0 for a genuinely
    HBM-bound kernel."""
    return max(device_hbm_gbps(), measured_stream_gbps())


# -- communication accounting (SURVEY §5.7/§5.8; VERDICT r1 item 6) -----------

# v5e ICI: 4 links/chip x ~100 GB/s effective half-duplex per direction is
# commonly quoted as ~100 GB/s/link; keep a conservative per-neighbour figure.
ICI_GBPS_PER_LINK = 100.0


@dataclasses.dataclass(frozen=True)
class CommStats:
    """Collective traffic of one compiled step, counted from the HLO.

    Byte counts are PER DEVICE (SPMD modules carry per-shard shapes) —
    i.e. the traffic each chip puts on its ICI links."""

    collective_permute_count: int
    all_reduce_count: int
    all_gather_count: int
    reduce_scatter_count: int
    permute_bytes: int        # sum of collective-permute operand bytes
    all_gather_bytes: int

    @property
    def total_comm_bytes(self) -> int:
        return self.permute_bytes + self.all_gather_bytes


_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1}


def _shape_bytes(shape_str: str) -> int:
    """Bytes of an HLO shape string like 'f32[12,48]{1,0}' (0 if opaque)."""
    import re

    total = 0
    for m in re.finditer(r"(f64|f32|bf16|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]",
                         shape_str):
        dt, dims = m.group(1), m.group(2)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
        break  # first shape on the line = the op's result shape
    return total


def comm_stats_from_compiled(compiled) -> CommStats:
    """Count collectives (and their operand bytes) in a compiled executable.

    ``compiled`` is the result of ``jax.jit(f).lower(*args).compile()``.
    Byte counts use each collective's result shape — for permutes that is
    exactly the halo strip moved per device pair; for all-gathers the
    gathered result.
    """
    txt = compiled.as_text()
    cp = ar = ag = rs = 0
    cp_bytes = ag_bytes = 0
    for line in txt.splitlines():
        s = line.strip()
        if "collective-permute" in s and "=" in s and "start" not in s:
            cp += 1
            cp_bytes += _shape_bytes(s.split("=", 1)[1])
        elif "all-reduce" in s and "=" in s and "start" not in s:
            ar += 1
        elif "all-gather" in s and "=" in s and "start" not in s:
            ag += 1
            ag_bytes += _shape_bytes(s.split("=", 1)[1])
        elif "reduce-scatter" in s and "=" in s:
            rs += 1
    return CommStats(collective_permute_count=cp, all_reduce_count=ar,
                     all_gather_count=ag, reduce_scatter_count=rs,
                     permute_bytes=cp_bytes, all_gather_bytes=ag_bytes)


def halo_step_model(ny: int, nx: int, n_devices: int, halo_rows: int,
                    exchanges_per_step: int, dtype_bytes: int,
                    compute_passes: int, hbm_gbps: float | None = None,
                    ici_gbps: float = ICI_GBPS_PER_LINK) -> dict:
    """Analytic comm/compute model of a row-sharded stencil step.

    Per device and step: compute touches ``compute_passes`` full passes over
    its ``(ny/n_devices, nx)`` block; communication moves ``halo_rows x nx``
    strips to each of two neighbours, ``exchanges_per_step`` times.  Returns
    bytes, times, the comm/compute ratio, and the projected weak-scaling
    efficiency  eff = t_compute / (t_compute + t_comm)  (halo comm does not
    shrink with more devices at fixed per-device block — the weak-scaling
    regime)."""
    if hbm_gbps is None:
        hbm_gbps = device_hbm_gbps()
    block_rows = ny // n_devices
    compute_bytes = compute_passes * 2 * block_rows * nx * dtype_bytes
    comm_bytes = exchanges_per_step * 2 * halo_rows * nx * dtype_bytes
    t_compute = compute_bytes / (hbm_gbps * 1e9)
    t_comm = comm_bytes / (ici_gbps * 1e9)
    return {
        "block_rows": block_rows,
        "compute_bytes": compute_bytes,
        "comm_bytes": comm_bytes,
        "comm_compute_ratio": comm_bytes * hbm_gbps / (compute_bytes * ici_gbps),
        "weak_scaling_efficiency": t_compute / (t_compute + t_comm),
    }


def halo_step_model_2d(ny: int, nx: int, py: int, px: int, halo: int,
                       exchanges_per_step: int, dtype_bytes: int,
                       compute_passes: int, hbm_gbps: float | None = None,
                       ici_gbps: float = ICI_GBPS_PER_LINK) -> dict:
    """Analytic comm/compute model of a 2-D block-sharded stencil step
    (dist.halo.sharded_xy_chain): per device each exchange moves
    ``halo``-deep strips along the block perimeter (2 row strips + 2 column
    strips + 4 corners via the two-hop y-then-x scheme, so the column strips
    are halo-extended: bm + 2*halo rows).  Perimeter comm scales ~1/sqrt(p)
    at fixed global grid — the 2-D decomposition's advantage over rows-only
    once py*px is large."""
    if hbm_gbps is None:
        hbm_gbps = device_hbm_gbps()
    bm, bn = ny // py, nx // px
    compute_bytes = compute_passes * 2 * bm * bn * dtype_bytes
    per_exchange = (2 * halo * bn + 2 * halo * (bm + 2 * halo)) * dtype_bytes
    comm_bytes = exchanges_per_step * per_exchange
    t_compute = compute_bytes / (hbm_gbps * 1e9)
    t_comm = comm_bytes / (ici_gbps * 1e9)
    return {
        "block": (bm, bn),
        "compute_bytes": compute_bytes,
        "comm_bytes": comm_bytes,
        "comm_compute_ratio": comm_bytes * hbm_gbps / (compute_bytes * ici_gbps),
        "weak_scaling_efficiency": t_compute / (t_compute + t_comm),
    }
