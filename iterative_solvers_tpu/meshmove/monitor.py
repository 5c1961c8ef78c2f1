"""Monitor functions, smoothing filter, Mackenzie regularisation.

TPU-native form of the reference's ``compute_and_smooth_monitor``
(droplet.py:729-760, PMA.py:275-321, PMA2_nk.py:345-391): the adaptivity
driver field, four passes of a 9-point fourth-order filter with distinct
edge/corner masks, then the Mackenzie floor ``mon += C * ∬ mon |J| dA``.

The filter pass is fully vectorised: interior via shifted slices, the four
edge strips and corners via their own small expressions, assembled with
static ``.at[]`` updates — no gathers, fuses under jit.  The integral is a
single reduction (a ``psum`` when sharded).
"""
from __future__ import annotations

import jax.numpy as jnp


def smooth_pass(t):
    """One pass of the reference's fourth-order 9-point filter."""
    mon = jnp.zeros_like(t)
    # interior: t + (N+S+E+W)/8 + diagonals/16   (droplet.py:742-743)
    inner = (
        t[1:-1, 1:-1]
        + (t[:-2, 1:-1] + t[2:, 1:-1] + t[1:-1, :-2] + t[1:-1, 2:]) / 8.0
        + (t[:-2, :-2] + t[:-2, 2:] + t[2:, :-2] + t[2:, 2:]) / 16.0
    )
    mon = mon.at[1:-1, 1:-1].set(inner)
    # edges without corners (droplet.py:745-748)
    mon = mon.at[1:-1, -1].set(
        (4 * t[1:-1, -1] + 2 * t[:-2, -1] + 2 * t[2:, -1]
         + 2 * t[1:-1, -2] + t[2:, -2] + t[:-2, -2]) / 12.0
    )
    mon = mon.at[1:-1, 0].set(
        (4 * t[1:-1, 0] + 2 * t[:-2, 0] + 2 * t[2:, 0]
         + 2 * t[1:-1, 1] + t[2:, 1] + t[:-2, 1]) / 12.0
    )
    mon = mon.at[-1, 1:-1].set(
        (4 * t[-1, 1:-1] + 2 * t[-1, :-2] + 2 * t[-1, 2:]
         + 2 * t[-2, 1:-1] + t[-2, 2:] + t[-2, :-2]) / 12.0
    )
    mon = mon.at[0, 1:-1].set(
        (4 * t[0, 1:-1] + 2 * t[0, :-2] + 2 * t[0, 2:]
         + 2 * t[1, 1:-1] + t[1, 2:] + t[1, :-2]) / 12.0
    )
    # corners (droplet.py:750-753)
    mon = mon.at[0, 0].set((4 * t[0, 0] + 2 * t[0, 1] + 2 * t[1, 0] + t[1, 1]) / 9.0)
    mon = mon.at[0, -1].set((4 * t[0, -1] + 2 * t[0, -2] + 2 * t[1, -1] + t[1, -2]) / 9.0)
    mon = mon.at[-1, 0].set((4 * t[-1, 0] + 2 * t[-1, 1] + 2 * t[-2, 0] + t[-2, 1]) / 9.0)
    mon = mon.at[-1, -1].set(
        (4 * t[-1, -1] + 2 * t[-1, -2] + 2 * t[-2, -1] + t[-2, -2]) / 9.0
    )
    return mon


def smooth_and_regularise(mon_src, jac, dx: float, dy: float,
                          smoothing_iters: int = 4, mackenzie_c: float = 1.0,
                          cap: float | None = None):
    """Smooth the raw monitor field and apply the Mackenzie floor.

    ``mackenzie_c`` is the normalisation constant: 0.15 for the droplet
    workload (droplet.py:44,759), 1.0 for the MEMS/PMA workloads
    (PMA2_nk.py:389-390).

    ``cap`` (fine-grid extension, default None = reference-exact) bounds
    the monitor at ``cap x`` its Mackenzie floor before the floor is added,
    so the PMA equidistribution cannot compress the mesh beyond a spacing
    ratio ~ sqrt(1 + cap).  The reference never needs this: at 91x61 the
    discrete ``|lap u|^2`` is bounded by the grid (~1/h^4), but once the
    eps-interface resolves, the raw monitor grows ~1e8 and the TRUE PMA
    steady state compresses min_spacing to ~1e-5 — measured at 1024² in
    the r5 long-run trajectory (min_spacing 9e-5 -> 8e-6 over 50 steps as
    the mesh approached equidistribution), which explodes the metric
    stiffness and collapses the convergent dt.  A bounded compression
    ratio is the standard moving-mesh remedy (monitor clipping).
    """
    mon = mon_src
    for _ in range(smoothing_iters):
        mon = smooth_pass(mon)
    integral = jnp.sum(mon * jnp.abs(jac)) * dx * dy
    floor = mackenzie_c * integral
    if cap is not None:
        mon = jnp.minimum(mon, cap * floor)
    return mon + floor
