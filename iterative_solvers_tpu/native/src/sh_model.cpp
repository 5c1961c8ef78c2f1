#include "sh_model.h"

namespace nk {

CSR periodic_laplacian(int n, double h) {
  const double e = 1.0 / (h * h);
  const std::int64_t nn = static_cast<std::int64_t>(n) * n;
  Triplets t(nn, nn);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < n; ++j) {
      const std::int64_t row = static_cast<std::int64_t>(i) * n + j;
      const int ip = (i + 1) % n, im = (i - 1 + n) % n;
      const int jp = (j + 1) % n, jm = (j - 1 + n) % n;
      t.add(row, row, -4.0 * e);
      t.add(row, static_cast<std::int64_t>(ip) * n + j, e);
      t.add(row, static_cast<std::int64_t>(im) * n + j, e);
      t.add(row, static_cast<std::int64_t>(i) * n + jp, e);
      t.add(row, static_cast<std::int64_t>(i) * n + jm, e);
    }
  }
  return t.to_csr();
}

CSR sh_operator(int n, double h, double r) {
  CSR lap = periodic_laplacian(n, h);
  CSR lap2 = spgemm(lap, lap);
  CSR tmp = spadd(lap2, -1.0, lap, -2.0);
  return spadd(tmp, 1.0, identity(lap.n_rows), r - 1.0);
}

Vec SHModel::residual(const Vec &u, const Vec &u_old, const Vec &l_uold,
                      const Vec &uo2, const Vec &uo3) const {
  Vec lu = L.matvec(u);
  Vec out(u.size());
  for (std::size_t i = 0; i < u.size(); ++i) {
    const double uu = u[i] * u[i];
    const double rhs_new = lu[i] + g * uu - u[i] * uu;
    const double rhs_old = l_uold[i] + g * uo2[i] - uo3[i];
    out[i] = (u[i] - u_old[i]) / k - (rhs_new + rhs_old) / 2.0;
  }
  return out;
}

Vec SHModel::evolve(Vec u, int nsteps, const NonlinOptions &opt,
                    std::vector<NonlinStats> *stats) const {
  for (int s = 0; s < nsteps; ++s) {
    Vec u_old = u;
    Vec l_uold = L.matvec(u_old);
    Vec uo2(u.size()), uo3(u.size());
    for (std::size_t i = 0; i < u.size(); ++i) {
      uo2[i] = u_old[i] * u_old[i];
      uo3[i] = u_old[i] * uo2[i];
    }
    Residual F = [&](const Vec &v) {
      return residual(v, u_old, l_uold, uo2, uo3);
    };
    NonlinStats st;
    u = nonlin_solve(F, u_old, opt, &st);
    if (stats) stats->push_back(st);
  }
  return u;
}

}  // namespace nk
