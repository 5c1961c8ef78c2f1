// LGMRES with outer-vector recycling — native counterpart of the external
// C++ library the reference links against (SURVEY.md §2.11, API
// reconstructed from the MSVC symbols in Debug/newton_krylov.obj):
//
//   Vec lgmres(matvec, psolve, x0, b, outer_v, tol, maxiter, inner_m, outer_k)
//
// Semantics mirror scipy.sparse.linalg.lgmres: per outer cycle, an augmented
// subspace of inner_m Arnoldi vectors plus up to outer_k recycled solution
// directions; least squares by Givens-rotated Hessenberg; new correction
// appended to outer_v (normalised), oldest evicted.
#pragma once

#include <utility>
#include <vector>

#include "vec.h"

namespace nk {

struct LgmresStats {
  int outer_cycles = 0;
  int matvecs = 0;
  double final_residual = 0.0;
  bool converged = false;
};

// outer_v entries: (z, Az) with Az possibly empty (recomputed on use, the
// store_outer_Av=false mode Newton-Krylov needs).
using OuterVecs = std::vector<std::pair<Vec, Vec>>;

Vec lgmres(const MatVec &matvec, const MatVec &psolve, const Vec &x0,
           const Vec &b, OuterVecs &outer_v, double tol, int maxiter,
           int inner_m, unsigned outer_k, bool store_outer_av = true,
           LgmresStats *stats = nullptr);

}  // namespace nk
