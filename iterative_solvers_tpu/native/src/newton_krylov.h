// Jacobian-free Newton-Krylov — native counterpart of the reference's
// external library (SURVEY.md §2.11):
//
//   Vec nonlin_solve(F, x0, f_tol, f_rtol, x_tol, x_rtol)
//   class KrylovJacobian { Vec solve(rhs, tol); matvec via FD-JVP; }
//   _nonlin_line_search (Armijo)
//
// mirroring scipy.optimize._nonlin semantics (same termination conditions,
// rdiff/omega update, Eisenstat-Walker forcing schedule, one lgmres cycle
// per Newton iteration with recycled outer vectors).
#pragma once

#include <limits>

#include "lgmres.h"
#include "vec.h"

namespace nk {

using Residual = std::function<Vec(const Vec &)>;

struct NonlinOptions {
  double f_tol = 6.05545445239334e-06;  // eps**(1/3), scipy default
  double f_rtol = std::numeric_limits<double>::infinity();
  double x_tol = std::numeric_limits<double>::infinity();
  double x_rtol = std::numeric_limits<double>::infinity();
  int maxiter = 100;
  int inner_m = 30;
  unsigned outer_k = 10;
  double rdiff = 1.4901161193847656e-08;  // eps**0.5
  bool line_search = true;
  int max_backtracks = 8;
};

struct NonlinStats {
  int iterations = 0;
  int func_evals = 0;
  double f_norm = 0.0;
  bool converged = false;
};

class KrylovJacobian {
 public:
  KrylovJacobian(const Residual &func, double rdiff, int inner_m,
                 unsigned outer_k)
      : func_(func), rdiff_(rdiff), inner_m_(inner_m), outer_k_(outer_k) {}

  // refresh the linearisation point (scipy KrylovJacobian.update)
  void update(const Vec &x, const Vec &fx) {
    x0_ = x;
    f0_ = fx;
    const double mx = std::max(1.0, max_abs(x0_));
    const double mf = std::max(1.0, max_abs(f0_));
    omega_ = rdiff_ * mx / mf;
  }

  // finite-difference directional derivative (scipy KrylovJacobian.matvec)
  Vec matvec(const Vec &v) const;

  // one recycled-lgmres cycle on J dx = rhs (scipy KrylovJacobian.solve)
  Vec solve(const Vec &rhs, double tol, int *matvecs);

 private:
  Residual func_;
  double rdiff_, omega_ = 0.0;
  int inner_m_;
  unsigned outer_k_;
  Vec x0_, f0_;
  OuterVecs outer_v_;
};

Vec nonlin_solve(const Residual &F, const Vec &x0, const NonlinOptions &opt,
                 NonlinStats *stats = nullptr);

// reference-compatible signature (main.cpp:104):
//   nonlin_solve(residual, Uo, 6e-6, inf, inf, inf)
inline Vec nonlin_solve(const Residual &F, const Vec &x0, double f_tol,
                        double f_rtol, double x_tol, double x_rtol) {
  NonlinOptions opt;
  opt.f_tol = f_tol;
  opt.f_rtol = f_rtol;
  opt.x_tol = x_tol;
  opt.x_rtol = x_rtol;
  return nonlin_solve(F, x0, opt);
}

}  // namespace nk
