// C API for ctypes bindings (pybind11 is not in this image; the surface is
// small enough that a plain extern-C layer + ctypes is the right tool).
#include <cstdint>
#include <cstring>
#include <vector>

#include "csr.h"
#include "lgmres.h"
#include "newton_krylov.h"
#include "sh_model.h"

using nk::Vec;

extern "C" {

// residual callback: F(x, out, n, user) — writes F(x) into out.
typedef void (*residual_cb)(const double *, double *, std::int64_t, void *);

static nk::Residual wrap_residual(residual_cb cb, void *user,
                                  std::int64_t n) {
  return [cb, user, n](const Vec &x) {
    Vec out(static_cast<std::size_t>(n));
    cb(x.data(), out.data(), n, user);
    return out;
  };
}

// Jacobian-free Newton-Krylov on a user residual.  Returns 1 on
// convergence.  stats_out (optional, length 3): iterations, func_evals,
// final f_norm.
int nk_nonlin_solve(residual_cb cb, void *user, const double *x0,
                    std::int64_t n, double f_tol, double f_rtol, double x_tol,
                    double x_rtol, int maxiter, int inner_m, int outer_k,
                    double *x_out, double *stats_out) {
  nk::NonlinOptions opt;
  opt.f_tol = f_tol;
  opt.f_rtol = f_rtol;
  opt.x_tol = x_tol;
  opt.x_rtol = x_rtol;
  opt.maxiter = maxiter;
  opt.inner_m = inner_m;
  opt.outer_k = static_cast<unsigned>(outer_k);
  nk::NonlinStats st;
  Vec x0v(x0, x0 + n);
  Vec x = nk::nonlin_solve(wrap_residual(cb, user, n), x0v, opt, &st);
  std::memcpy(x_out, x.data(), sizeof(double) * n);
  if (stats_out) {
    stats_out[0] = st.iterations;
    stats_out[1] = st.func_evals;
    stats_out[2] = st.f_norm;
  }
  return st.converged ? 1 : 0;
}

// LGMRES on a CSR system.
int nk_lgmres_csr(std::int64_t n, const std::int64_t *indptr,
                  const std::int64_t *indices, const double *data,
                  const double *b, const double *x0, double tol, int maxiter,
                  int inner_m, int outer_k, double *x_out,
                  double *stats_out) {
  nk::CSR a;
  a.n_rows = a.n_cols = n;
  a.indptr.assign(indptr, indptr + n + 1);
  a.indices.assign(indices, indices + indptr[n]);
  a.data.assign(data, data + indptr[n]);
  nk::MatVec mv = [&a](const Vec &v) { return a.matvec(v); };
  nk::MatVec ident = [](const Vec &v) { return v; };
  nk::OuterVecs outer;
  nk::LgmresStats st;
  Vec x = nk::lgmres(mv, ident, Vec(x0, x0 + n), Vec(b, b + n), outer, tol,
                     maxiter, inner_m, static_cast<unsigned>(outer_k), true,
                     &st);
  std::memcpy(x_out, x.data(), sizeof(double) * n);
  if (stats_out) {
    stats_out[0] = st.outer_cycles;
    stats_out[1] = st.matvecs;
    stats_out[2] = st.final_residual;
  }
  return st.converged ? 1 : 0;
}

// CSR SpMV (for kernel benchmarking/parity).
void nk_spmv_csr(std::int64_t n_rows, const std::int64_t *indptr,
                 const std::int64_t *indices, const double *data,
                 const double *x, double *y) {
  for (std::int64_t i = 0; i < n_rows; ++i) {
    double s = 0.0;
    for (std::int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
      s += data[k] * x[indices[k]];
    y[i] = s;
  }
}

// Swift-Hohenberg CN/NK evolution (the reference main.cpp workload).
// Returns number of converged steps.
int nk_sh_evolve(int n, double d, double k, double r, double g,
                 const double *u0, int nsteps, double f_tol, double *u_out) {
  nk::SHModel model(n, d, k, r, g);
  nk::NonlinOptions opt;
  opt.f_tol = f_tol;
  std::vector<nk::NonlinStats> stats;
  Vec u = model.evolve(Vec(u0, u0 + static_cast<std::size_t>(n) * n), nsteps,
                       opt, &stats);
  std::memcpy(u_out, u.data(), sizeof(double) * u.size());
  int ok = 0;
  for (const auto &s : stats) ok += s.converged ? 1 : 0;
  return ok;
}

// Assemble the SH operator and return its nnz (test/diagnostic hook).
std::int64_t nk_sh_operator_nnz(int n, double d, double r) {
  return static_cast<std::int64_t>(nk::sh_operator(n, d / n, r).data.size());
}

}  // extern "C"
