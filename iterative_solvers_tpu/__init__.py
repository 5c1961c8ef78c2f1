"""iterative_solvers_tpu — a TPU-native framework for iterative solution of stiff
nonlinear PDEs.

Built from scratch in JAX/XLA/Pallas (with a companion native C++ Newton–Krylov
library), providing the capabilities of the reference repo
*Shiakaron/Iterative-solvers-summer-2020* re-designed TPU-first:

- ``core``     — grid descriptors, boundary masks, typed configs
- ``ops``      — matrix-free finite-difference stencils, curvilinear (moving-mesh)
                 operators, sparse containers (DIA/CSR/BSR) + SpMV, DCT transforms
- ``solvers``  — GMRES / LGMRES (Givens, restarts, outer-vector recycling),
                 Jacobian-free Newton–Krylov, spectral (DCT/DST) fast solvers,
                 tridiagonal LU, time steppers
- ``meshmove`` — Parabolic Monge–Ampère moving-mesh subsystem (monitor functions,
                 smoothing, Mackenzie regularisation, spectral mesh solve)
- ``models``   — Swift–Hohenberg, MEMS/touchdown, thin-film droplet, heat, wave,
                 Poisson workloads
- ``dist``     — device meshes, halo exchange (ppermute), sharded solvers
- ``io``       — checkpoint/restart with metadata, reference-fixture loaders
- ``utils``    — timing, metrics, roofline accounting

Reference parity targets are documented per-module with ``file:line`` citations
into the reference repo (see SURVEY.md).
"""

__version__ = "0.1.0"
