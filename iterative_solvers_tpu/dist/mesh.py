"""Device-mesh construction and the multi-host runtime entry point.

TPU-native equivalent of a distributed-communication backend (SURVEY.md
§5.8): ``jax.distributed.initialize`` for multi-host process groups (ICI
within a slice, DCN across slices), ``jax.sharding.Mesh`` for placement.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(shape: tuple[int, int] | None = None,
              axis_names: tuple[str, str] = ("y", "x"),
              devices=None) -> Mesh:
    """Build a 2-D device mesh.  With ``shape=None``, factor the device count
    into the most-square grid (better surface-to-volume for halo traffic)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        py = int(np.floor(np.sqrt(n)))
        while n % py:
            py -= 1
        shape = (py, n // py)
    py, px = shape
    if py * px > n:
        raise ValueError(f"mesh {shape} needs {py*px} devices, have {n}")
    arr = np.asarray(devices[: py * px]).reshape(py, px)
    return Mesh(arr, axis_names=axis_names)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Bring up the multi-host runtime (jax.distributed).  On single-host
    deployments this is a no-op; on a pod slice each host calls it before
    building the global mesh.  Arguments default to the TPU environment's
    auto-detection."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def local_block_shape(global_shape: tuple[int, int], mesh: Mesh) -> tuple[int, int]:
    """Per-device block of a block-partitioned (Ny, Nx) field."""
    py, px = mesh.devices.shape
    ny, nx = global_shape
    if ny % py or nx % px:
        raise ValueError(f"grid {global_shape} not divisible by mesh {mesh.devices.shape}")
    return ny // py, nx // px
