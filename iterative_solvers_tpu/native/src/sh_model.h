// Swift-Hohenberg model for the native driver — counterpart of the
// reference's in-repo C++ workload (cpp_work/.../main.cpp, SURVEY.md §2.10):
// periodic Laplacian assembly, L = -Lap^2 - 2 Lap + (r-1) I, Crank-Nicolson
// residual, and the Newton-Krylov time loop.
#pragma once

#include "csr.h"
#include "newton_krylov.h"

namespace nk {

// periodic 5-point Laplacian on an n x n grid (row-major flattening),
// assembled from neighbour offsets (not a translation of the reference's
// per-block insert loops).
CSR periodic_laplacian(int n, double h);

// L = -Lap^2 - 2 Lap + (r - 1) I
CSR sh_operator(int n, double h, double r);

struct SHModel {
  int n;
  double d, k, r, g;
  CSR L;

  SHModel(int n_, double d_, double k_, double r_, double g_)
      : n(n_), d(d_), k(k_), r(r_), g(g_), L(sh_operator(n_, d_ / n_, r_)) {}

  // CN residual given the frozen previous step (u_old, L u_old, u_old^2,
  // u_old^3): F(u) = (u-u_old)/k - (L u + g u^2 - u^3 + [old terms])/2
  Vec residual(const Vec &u, const Vec &u_old, const Vec &l_uold,
               const Vec &uo2, const Vec &uo3) const;

  // advance nsteps; returns per-step Newton stats if wanted
  Vec evolve(Vec u, int nsteps, const NonlinOptions &opt,
             std::vector<NonlinStats> *stats = nullptr) const;
};

}  // namespace nk
