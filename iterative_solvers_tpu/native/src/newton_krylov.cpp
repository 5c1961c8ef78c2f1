#include "newton_krylov.h"

#include <algorithm>
#include <cmath>

namespace nk {

Vec KrylovJacobian::matvec(const Vec &v) const {
  const double nv = nrm2(v);
  if (nv == 0.0) return Vec(v.size(), 0.0);
  const double sc = omega_ / nv;
  Vec xp(x0_);
  axpy(sc, v, xp);
  Vec r = func_(xp);
  for (std::size_t i = 0; i < r.size(); ++i) r[i] = (r[i] - f0_[i]) / sc;
  return r;
}

Vec KrylovJacobian::solve(const Vec &rhs, double tol, int *matvecs) {
  LgmresStats st;
  MatVec mv = [this](const Vec &v) { return matvec(v); };
  MatVec ident = [](const Vec &v) { return v; };
  // scipy KrylovJacobian: one outer lgmres cycle, no stored A*v products
  Vec dx = lgmres(mv, ident, Vec(), rhs, outer_v_, tol, /*maxiter=*/1,
                  inner_m_, outer_k_, /*store_outer_av=*/false, &st);
  if (matvecs) *matvecs += st.matvecs;
  return dx;
}

namespace {

// Armijo backtracking on phi(s) = ||F(x + s dx)||^2 (scipy
// _nonlin_line_search 'armijo' mode).
double armijo(const Residual &F, const Vec &x, const Vec &dx,
              double phi0, Vec &fx_out, int max_backtracks, int *fev) {
  const double t = 1e-4;
  double s = 1.0;
  Vec xt(x);
  axpy(s, dx, xt);
  fx_out = F(xt);
  ++*fev;
  double phi = dot(fx_out, fx_out);
  int k = 0;
  while (phi > (1.0 - t * s) * (1.0 - t * s) * phi0 && k < max_backtracks) {
    s *= 0.5;
    xt = x;
    axpy(s, dx, xt);
    fx_out = F(xt);
    ++*fev;
    phi = dot(fx_out, fx_out);
    ++k;
  }
  return s;
}

}  // namespace

Vec nonlin_solve(const Residual &F, const Vec &x0, const NonlinOptions &opt,
                 NonlinStats *stats) {
  Vec x = x0;
  Vec fx = F(x);
  int fev = 1;
  double f_norm = max_abs(fx);
  const double f0_norm = f_norm;

  KrylovJacobian jac(F, opt.rdiff, opt.inner_m, opt.outer_k);
  jac.update(x, fx);

  // Eisenstat-Walker forcing schedule (scipy _nonlin.py nonlin_solve)
  const double gamma = 0.9, eta_max = 0.9999, eta_threshold = 0.1;
  double eta = 1e-3;

  bool converged = f_norm <= opt.f_tol;
  int it = 0;
  for (; it < opt.maxiter && !converged; ++it) {
    // inner tolerance (scipy: tol = min(eta, eta*|F|)*|F| in 2-norm terms)
    const double rnorm = nrm2(fx);
    const double tol_inner = std::min(eta, eta * rnorm);

    Vec rhs = scaled(fx, -1.0);
    Vec dx = jac.solve(rhs, tol_inner, &fev);

    double s = 1.0;
    Vec fx_new;
    if (opt.line_search) {
      s = armijo(F, x, dx, dot(fx, fx), fx_new, opt.max_backtracks, &fev);
    } else {
      Vec xt(x);
      axpy(1.0, dx, xt);
      fx_new = F(xt);
      ++fev;
    }
    axpy(s, dx, x);
    const double f_norm_new = max_abs(fx_new);
    const double dx_norm = s * max_abs(dx);
    const double x_norm = max_abs(x);

    // forcing update
    const double eta_a =
        gamma * (f_norm_new * f_norm_new) / std::max(f_norm * f_norm, 1e-300);
    if (gamma * eta * eta < eta_threshold)
      eta = std::min(eta_max, eta_a);
    else
      eta = std::min(eta_max, std::max(eta_a, gamma * eta * eta));

    fx = std::move(fx_new);
    f_norm = f_norm_new;
    jac.update(x, fx);

    // scipy TerminationCondition (AND of f- and x-criteria)
    converged =
        (f_norm == 0.0) ||
        ((f_norm <= opt.f_tol) && (f_norm / opt.f_rtol <= f0_norm) &&
         (dx_norm <= opt.x_tol) && (dx_norm / opt.x_rtol <= x_norm));
  }

  if (stats) {
    stats->iterations = it;
    stats->func_evals = fev;
    stats->f_norm = f_norm;
    stats->converged = converged;
  }
  return x;
}

}  // namespace nk
