"""Distributed solver drivers: sharded Newton–Krylov time steps.

The Krylov/Newton machinery in :mod:`..solvers` is shape-agnostic and built
from ``jnp`` reductions, so over block-sharded global arrays under ``jit``
every inner product lowers to a per-device partial sum + ``all-reduce`` over
ICI and every stencil shift to a collective-permute — the distribution model
BASELINE.json asks for, without a separate distributed code path.  These
helpers wire the sharded residual (explicit halo version from
:mod:`.halo`) into the JFNK stack and pin the shardings at the jit boundary.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.swift_hohenberg import SHConfig
from ..solvers.newton import NewtonKrylov
from .halo import sharded_sh_operator, grid_sharding


def make_sharded_sh_step(cfg: SHConfig, mesh: Mesh,
                         axis_names: tuple[str, str] = ("y", "x"),
                         solver: NewtonKrylov | None = None,
                         explicit_halos: bool = True):
    """Distributed SH Crank–Nicolson JFNK step.

    ``explicit_halos=True`` evaluates the linear operator through the
    shard_map + ppermute path (one width-2 exchange per application);
    ``False`` leaves the global-array ops to GSPMD.  Both produce identical
    trajectories — tested against each other.
    """
    if solver is None:
        solver = NewtonKrylov()
    sharding = grid_sharding(mesh, axis_names)

    if explicit_halos:
        apply_L = lambda v: sharded_sh_operator(v, cfg.h, cfg.r, mesh, axis_names)
    else:
        from ..models.swift_hohenberg import apply_L as _gl
        apply_L = lambda v: _gl(v, cfg)

    def residual(u, u_old, l_uold, uo2, uo3):
        uu = u * u
        return (u - u_old) / cfg.k - (
            apply_L(u) + cfg.g * uu - u * uu + l_uold + cfg.g * uo2 - uo3
        ) / 2.0

    def step(u_old):
        l_uold = apply_L(u_old)
        uo2 = u_old * u_old
        uo3 = u_old * uo2
        res = solver.solve(
            partial(residual, u_old=u_old, l_uold=l_uold, uo2=uo2, uo3=uo3),
            u_old,
        )
        return res.x, res

    return jax.jit(step, in_shardings=sharding,
                   out_shardings=(sharding, None))
