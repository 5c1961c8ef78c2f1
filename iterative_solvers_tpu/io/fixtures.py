"""Loaders for the reference's checked-in ``initdrop_*.txt`` solver states.

The reference serialises ``(U.val[i], Q.val[i])`` line-per-node with the full
configuration encoded in the filename
(``initdrop_{kind}_{R}_{Nx}-{Ny}_{a}_{eps}_{alpha}_{gamma}_{C}.txt`` —
droplet.py:137-138, 556-576).  These 14 files are deterministic golden solver
states and serve as regression fixtures (SURVEY.md §4.4).
"""
from __future__ import annotations

import dataclasses
import pathlib
import re

import numpy as np

_NAME_RE = re.compile(
    r"initdrop_(?P<kind>[a-z]+)_(?P<R>[\d.]+)_(?P<nx>\d+)-(?P<ny>\d+)"
    r"_(?P<a>[\d.]+)_(?P<eps>[\d.]+)_(?P<alpha>[\d.]+)_(?P<gamma>[\d.]+)"
    r"_(?P<C>[\d.]+)\.txt"
)


@dataclasses.dataclass(frozen=True)
class DropletFixture:
    kind: str          # "rect" (single drop) or "coal" (coalescence pair)
    R: float
    nx: int
    ny: int
    a: float
    epsilon: float
    alpha: float
    gamma: float
    mackenzie_c: float
    u: np.ndarray      # (ny, nx) solution
    q: np.ndarray      # (ny, nx) mesh potential


def parse_name(name: str) -> dict:
    m = _NAME_RE.match(pathlib.Path(name).name)
    if not m:
        raise ValueError(f"not an initdrop fixture name: {name}")
    d = m.groupdict()
    return {
        "kind": d["kind"], "R": float(d["R"]), "nx": int(d["nx"]),
        "ny": int(d["ny"]), "a": float(d["a"]), "epsilon": float(d["eps"]),
        "alpha": float(d["alpha"]), "gamma": float(d["gamma"]),
        "mackenzie_c": float(d["C"]),
    }


def load(path: str | pathlib.Path) -> DropletFixture:
    path = pathlib.Path(path)
    meta = parse_name(path.name)
    data = np.loadtxt(path)
    n = meta["nx"] * meta["ny"]
    if data.shape != (n, 2):
        raise ValueError(
            f"{path.name}: expected {n} lines of (u, q), got {data.shape}"
        )
    shape = (meta["ny"], meta["nx"])
    return DropletFixture(
        u=data[:, 0].reshape(shape), q=data[:, 1].reshape(shape), **meta
    )


def upsample(fix: DropletFixture, nx: int, ny: int) -> DropletFixture:
    """Bicubic-interpolate a fixture state onto a finer grid — used to seed
    large-scale (e.g. 4096^2) runs from the reference's 91x61 states.  The
    mesh potential Q interpolates smoothly (it is C^2 by construction), so
    the refined mesh inherits the coarse adaption."""
    from scipy.interpolate import RectBivariateSpline

    ys = np.linspace(0.0, 1.0, fix.ny)
    xs = np.linspace(0.0, 1.0, fix.nx)
    yt = np.linspace(0.0, 1.0, ny)
    xt = np.linspace(0.0, 1.0, nx)

    def interp(f):
        return RectBivariateSpline(ys, xs, f, kx=3, ky=3)(yt, xt)

    q_up = interp(fix.q)

    # Blend Q into the identity-mesh potential near the boundary: the fine
    # grid's one-sided Neumann formulas amplify any boundary inconsistency
    # of the interpolant by 1/h, which tangles the mesh.  The reference's
    # meshes are near-uniform at the boundary anyway (adaption concentrates
    # in the interior), so a smooth ~16-cell taper to (x^2 + y^2)/2 keeps
    # the interior adaption and makes the boundary exactly consistent.
    cfg = config_for(dataclasses.replace(fix, nx=nx, ny=ny))
    grid = cfg.grid
    q_id = 0.5 * (grid.xx ** 2 + grid.yy ** 2)
    dev = q_up - q_id
    # Q is a potential — only derivatives matter — so remove the (large)
    # constant offset before tapering; blending the offset itself would
    # inject O(offset / taper_width^2) spurious curvature.
    frame = np.concatenate([dev[0, :], dev[-1, :], dev[:, 0], dev[:, -1]])
    dev = dev - np.mean(frame)
    iy = np.arange(ny)[:, None].astype(np.float64)
    ix = np.arange(nx)[None, :].astype(np.float64)
    taper = max(16.0, min(nx, ny) / 16.0)

    # product of per-edge smoothsteps, NOT min(dist): the min's kink along
    # the corner diagonals is only C^0, and the mesh Jacobian's second
    # derivatives across it grow like 1/h — at 4096^2 the corner qxy
    # blow-up tangles the mesh (jac < 0).  The product form is C^1 with
    # h-independent curvature.
    def edge_w(d):
        w = np.clip(d / taper, 0.0, 1.0)
        return w * w * (3.0 - 2.0 * w)

    w = (edge_w(iy) * edge_w(ny - 1 - iy) * edge_w(ix) * edge_w(nx - 1 - ix))
    q_fixed = q_id + w * dev

    return dataclasses.replace(fix, nx=nx, ny=ny, u=interp(fix.u), q=q_fixed)


def config_for(fix: DropletFixture):
    """DropletConfig matching a fixture's encoded parameters (fixing the
    reference pitfall of silently loading a state under mismatched globals —
    SURVEY.md §5.4)."""
    from ..models.droplet import DropletConfig

    return DropletConfig(
        R=fix.R, a=fix.a, epsilon=fix.epsilon, nx=fix.nx, ny=fix.ny,
        alpha=fix.alpha, gamma=fix.gamma, mackenzie_c=fix.mackenzie_c,
    )
