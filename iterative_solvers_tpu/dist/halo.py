"""Halo exchange and sharded stencil operators (shard_map + ppermute).

The reference caps at 91x61 grids because everything is dense-in-memory and
serial (SURVEY.md §5.7).  The TPU-native scaling layer is 2-D domain
decomposition over a ``jax.sharding.Mesh``: each device owns a block of the
``(Ny, Nx)`` grid and stencil application exchanges a fixed-width halo with
its mesh neighbours via ``lax.ppermute`` (neighbour-ring traffic over ICI —
the same communication pattern ring attention uses), while Krylov inner
products reduce with ``psum``.

Two distribution styles are provided and tested against each other:

1. **GSPMD (implicit)** — run the ordinary global-array ops under ``jit``
   with ``NamedSharding``; XLA's SPMD partitioner inserts the
   collective-permutes itself.  Zero code changes, good default.
2. **shard_map (explicit)** — the functions here: manual halo exchange with
   explicit widths, giving control over comm aggregation (exchange once for
   a fused double-Laplacian instead of twice) and overlap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _ring_perm(n: int, shift: int):
    """Source->dest pairs sending each shard's data to its +shift neighbour."""
    return [(i, (i + shift) % n) for i in range(n)]


def halo_exchange_1d(block, width: int, axis_name: str, *, axis: int = 0,
                     periodic: bool = True):
    """Exchange ``width`` rows (axis=0) or columns (axis=1) with the two
    neighbours along mesh axis ``axis_name``.

    Returns ``(lo_halo, hi_halo)`` — the ghost strips that belong *before*
    and *after* this shard's block.  For non-periodic axes, the global edge
    shards receive zeros (callers overwrite edge values with one-sided
    formulas anyway).
    """
    n = lax.axis_size(axis_name)
    if n == 1:
        if periodic:
            lo = lax.slice_in_dim(block, block.shape[axis] - width,
                                  block.shape[axis], axis=axis)
            hi = lax.slice_in_dim(block, 0, width, axis=axis)
            return lo, hi
        zeros = jnp.zeros_like(lax.slice_in_dim(block, 0, width, axis=axis))
        return zeros, zeros

    idx = lax.axis_index(axis_name)
    top = lax.slice_in_dim(block, block.shape[axis] - width,
                           block.shape[axis], axis=axis)
    bot = lax.slice_in_dim(block, 0, width, axis=axis)
    # my top strip becomes my +1 neighbour's lo halo; my bottom strip becomes
    # my -1 neighbour's hi halo
    lo = lax.ppermute(top, axis_name, _ring_perm(n, 1))
    hi = lax.ppermute(bot, axis_name, _ring_perm(n, -1))
    if not periodic:
        lo = jnp.where(idx == 0, jnp.zeros_like(lo), lo)
        hi = jnp.where(idx == n - 1, jnp.zeros_like(hi), hi)
    return lo, hi


def with_halo(block, width: int, axis_names: tuple[str, str],
              periodic: bool = True):
    """Extend a 2-D block with ``width`` ghost cells on all four sides
    (corners filled by exchanging the already-extended columns)."""
    ay, ax = axis_names
    lo_y, hi_y = halo_exchange_1d(block, width, ay, axis=0, periodic=periodic)
    ext = jnp.concatenate([lo_y, block, hi_y], axis=0)
    lo_x, hi_x = halo_exchange_1d(ext, width, ax, axis=1, periodic=periodic)
    return jnp.concatenate([lo_x, ext, hi_x], axis=1)


def _lap_core(ext, inv_h2):
    """5-point Laplacian of the core region of a 1-cell-extended block."""
    return (
        ext[:-2, 1:-1] + ext[2:, 1:-1] + ext[1:-1, :-2] + ext[1:-1, 2:]
        - 4.0 * ext[1:-1, 1:-1]
    ) * inv_h2


def sharded_lap_periodic(u, h: float, mesh: Mesh,
                         axis_names: tuple[str, str] = ("y", "x")):
    """Periodic 5-point Laplacian over a 2-D device mesh (explicit halos)."""
    inv_h2 = 1.0 / (h * h)
    spec = P(*axis_names)

    def local(block):
        ext = with_halo(block, 1, axis_names, periodic=True)
        return _lap_core(ext, inv_h2)

    return shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec)(u)


def sharded_sh_operator(u, h: float, r: float, mesh: Mesh,
                        axis_names: tuple[str, str] = ("y", "x")):
    """Swift–Hohenberg L = -Lap^2 - 2 Lap + (r-1) I with ONE width-2 halo
    exchange feeding the fused double Laplacian (vs two width-1 exchanges) —
    the comm-aggregation trick the explicit path exists for."""
    inv_h2 = 1.0 / (h * h)
    spec = P(*axis_names)

    def local(block):
        ext = with_halo(block, 2, axis_names, periodic=True)   # one exchange
        lap1 = _lap_core(ext, inv_h2)                           # core+1 ring
        lap2 = _lap_core(lap1, inv_h2)                          # core
        return -lap2 - 2.0 * lap1[1:-1, 1:-1] + (r - 1.0) * block

    return shard_map(local, mesh=mesh, in_specs=spec, out_specs=spec)(u)


def pdot(a, b, axis_names):
    """Distributed inner product for use *inside* shard_map bodies."""
    return lax.psum(jnp.sum(a * b), axis_names)


def sharded_y_chain(chain, depth: int, axis_name: str):
    """Lift a global-in-y operator chain onto row-sharded blocks.

    ``chain(*blocks) -> block`` must be the ordinary single-device function
    (same row count in as out) composed of y-direction stencils with
    one-sided edge handling, whose total *influence depth* — the maximum of
    (a) the stencil radius accumulated through the chain and (b) the number
    of output rows any global-edge special formula reaches — is <= ``depth``.

    The lifted body (for use inside ``shard_map``):

    1. exchanges a ``depth``-row halo once per input (one fused ppermute
       pair instead of one exchange per stencil — the comm-aggregation win
       of the explicit path),
    2. evaluates the UNMODIFIED chain on the extended blocks and keeps the
       core rows — interior formulas see real neighbour data; the chain's
       own edge handling lands in the discarded halo rows,
    3. re-evaluates the chain on a thin strip at the true domain edges
       (where the one-sided formulas are *supposed* to fire) and patches the
       first/last ``depth`` rows on the global edge shards.

    Reusing the single-device chain verbatim means the sharded operator is
    correct by construction wherever the single-device one is; the only new
    requirement is ``block_rows >= 2 * depth + 8`` so the edge strips hold
    the full one-sided influence.
    """

    def lifted(*blocks):
        n = lax.axis_size(axis_name)
        if n == 1:
            return chain(*blocks)
        bm = blocks[0].shape[0]
        s = 2 * depth + 8
        if bm < s:
            raise ValueError(
                f"sharded_y_chain: {bm} block rows < {s} needed for "
                f"depth={depth} (use fewer shards or a bigger grid)")
        idx = lax.axis_index(axis_name)
        exts = []
        for b in blocks:
            lo, hi = halo_exchange_1d(b, depth, axis_name, axis=0,
                                      periodic=False)
            exts.append(jnp.concatenate([lo, b, hi], axis=0))
        core = chain(*exts)[depth:-depth]
        lo_out = chain(*(e[depth:depth + s] for e in exts))[:depth]
        hi_out = chain(*(e[-(depth + s):e.shape[0] - depth] for e in exts))[-depth:]
        core = core.at[:depth].set(jnp.where(idx == 0, lo_out, core[:depth]))
        core = core.at[-depth:].set(
            jnp.where(idx == n - 1, hi_out, core[-depth:]))
        return core

    return lifted


def sharded_xy_chain(chain, depth: int, axis_names: tuple[str, str] = ("y", "x")):
    """Lift a global operator chain onto 2-D block-sharded fields.

    Generalises :func:`sharded_y_chain` to a ``(py, px)`` device mesh: the
    same contract (``chain`` is the unmodified single-device function whose
    total influence depth in *either* axis is <= ``depth``), the same
    correct-by-construction structure:

    1. ONE fused halo exchange per input per axis (corners arrive via the
       two-hop y-then-x exchange of :func:`with_halo`, zeros at global
       edges),
    2. the chain runs verbatim on the extended blocks; the core
       ``[depth:-depth, depth:-depth]`` is kept,
    3. the global-edge regions — where the chain's one-sided formulas are
       *supposed* to fire but saw halo data — are re-evaluated on thin
       strips anchored at the true domain edges: 4 edge strips (one-sided
       in one axis, interior in the other) and 4 corner blocks (one-sided
       in both), each patched onto the matching edge/corner shards.

    Block-size requirement: both block dims >= ``2 * depth + 8``.
    """
    ay, ax = axis_names

    def lifted(*blocks):
        ny_sh = lax.axis_size(ay)
        nx_sh = lax.axis_size(ax)
        if ny_sh == 1 and nx_sh == 1:
            return chain(*blocks)
        if nx_sh == 1:
            return sharded_y_chain(chain, depth, ay)(*blocks)
        bm, bn = blocks[0].shape
        s = 2 * depth + 8
        if bm < s or bn < s:
            raise ValueError(
                f"sharded_xy_chain: block {bm}x{bn} < {s} needed for "
                f"depth={depth} (use fewer shards or a bigger grid)")
        iy = lax.axis_index(ay)
        ix = lax.axis_index(ax)
        d = depth
        exts = [with_halo(b, d, axis_names, periodic=False) for b in blocks]

        core = chain(*exts)[d:-d, d:-d]

        # edge strips: one-sided axis anchored at the true edge, the other
        # axis still halo-extended (its one-sided rows/cols land in the
        # discarded margin; edge-shard leftovers are fixed by the corners)
        lo_y = chain(*(e[d:d + s, :] for e in exts))[:d, d:-d]
        hi_y = chain(*(e[e.shape[0] - d - s:e.shape[0] - d, :]
                       for e in exts))[-d:, d:-d]
        lo_x = chain(*(e[:, d:d + s] for e in exts))[d:-d, :d]
        hi_x = chain(*(e[:, e.shape[1] - d - s:e.shape[1] - d]
                       for e in exts))[d:-d, -d:]
        core = core.at[:d, :].set(jnp.where(iy == 0, lo_y, core[:d, :]))
        core = core.at[-d:, :].set(
            jnp.where(iy == ny_sh - 1, hi_y, core[-d:, :]))
        core = core.at[:, :d].set(jnp.where(ix == 0, lo_x, core[:, :d]))
        core = core.at[:, -d:].set(
            jnp.where(ix == nx_sh - 1, hi_x, core[:, -d:]))

        # corner blocks: one-sided in both axes.  True-domain s x s blocks:
        # lo side = ext[d : d+s], hi side = ext[-d-s : -d] (ends at the last
        # true row/col, exactly like the edge strips above).
        lo_sl = slice(d, d + s)
        hi_sl = slice(-d - s, -d)
        for cy in (0, 1):
            for cx in (0, 1):
                ys = lo_sl if cy == 0 else hi_sl
                xs = lo_sl if cx == 0 else hi_sl
                sub = chain(*(e[ys, xs] for e in exts))
                pick = sub[slice(0, d) if cy == 0 else slice(s - d, s),
                           slice(0, d) if cx == 0 else slice(s - d, s)]
                on = ((iy == 0) if cy == 0 else (iy == ny_sh - 1)) & (
                    (ix == 0) if cx == 0 else (ix == nx_sh - 1))
                ty = slice(0, d) if cy == 0 else slice(bm - d, bm)
                tx = slice(0, d) if cx == 0 else slice(bn - d, bn)
                core = core.at[ty, tx].set(
                    jnp.where(on, pick, core[ty, tx]))
        return core

    return lifted


def grid_sharding(mesh: Mesh, axis_names: tuple[str, str] = ("y", "x")):
    return NamedSharding(mesh, P(*axis_names))


def shard_field(u, mesh: Mesh, axis_names: tuple[str, str] = ("y", "x")):
    """Place a (Ny, Nx) field block-partitioned over the mesh."""
    return jax.device_put(u, grid_sharding(mesh, axis_names))
