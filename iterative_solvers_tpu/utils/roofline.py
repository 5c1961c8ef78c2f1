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
    """SpMV byte traffic: values + (indices for csr/coo) + x + y."""
    value_bytes = nnz * dtype_bytes
    index_traffic = 0 if fmt == "dia" else nnz * index_bytes
    vec_bytes = (n_cols + n_rows) * dtype_bytes
    return KernelCost(bytes_moved=value_bytes + index_traffic + vec_bytes,
                      flops=2 * nnz)


def device_hbm_gbps() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for k, v in HBM_GBPS.items():
        if k in kind:
            return v
    return HBM_GBPS["cpu"]
