#include "lgmres.h"

#include <algorithm>
#include <cmath>

namespace nk {

namespace {

// Solve the j x j upper-triangular system R y = g (R stored column-major in
// a (m+1) x m layout: R[c] is the column vector).
Vec solve_upper(const std::vector<Vec> &R, const Vec &g, int j) {
  Vec y(j, 0.0);
  for (int c = j - 1; c >= 0; --c) {
    double s = g[c];
    for (int k = c + 1; k < j; ++k) s -= R[k][c] * y[k];
    y[c] = s / R[c][c];
  }
  return y;
}

}  // namespace

Vec lgmres(const MatVec &matvec, const MatVec &psolve, const Vec &x0,
           const Vec &b, OuterVecs &outer_v, double tol, int maxiter,
           int inner_m, unsigned outer_k, bool store_outer_av,
           LgmresStats *stats) {
  const std::size_t n = b.size();
  Vec x = x0.empty() ? Vec(n, 0.0) : x0;
  const double b_norm = std::max(nrm2(b), 1e-300);
  int total_mv = 0;

  int cycle = 0;
  double r_norm = 0.0;
  for (; cycle < maxiter; ++cycle) {
    Vec r = sub(b, matvec(x));
    ++total_mv;
    r_norm = nrm2(r);
    if (r_norm <= tol * b_norm) break;

    const int m_aug = static_cast<int>(outer_v.size());
    const int m_tot = inner_m + m_aug;

    // Arnoldi basis of preconditioned residual Krylov space, augmented.
    std::vector<Vec> V;        // orthonormal basis of the A*Z image space
    std::vector<Vec> Z;        // expansion vectors (solution space)
    std::vector<Vec> R;        // Givens-reduced Hessenberg columns
    Vec g(m_tot + 1, 0.0);
    Vec cs(m_tot, 0.0), sn(m_tot, 0.0);

    // right-preconditioned (flexible) formulation: the basis starts from
    // the true residual; psolve only enters through the expansion vectors
    // Z[j] = psolve(V[j]), so the least-squares residual is the true one.
    Vec v0 = scaled(r, 1.0 / r_norm);
    V.push_back(v0);
    g[0] = r_norm;

    double pres = r_norm;
    int j = 0;
    for (; j < m_tot; ++j) {
      Vec z, w;
      if (j < inner_m) {
        z = psolve(V.back());
        w = matvec(z);
        ++total_mv;
      } else {
        const auto &zw = outer_v[j - inner_m];
        z = zw.first;
        if (!zw.second.empty()) {
          w = zw.second;
        } else {
          w = matvec(z);
          ++total_mv;
        }
      }
      // modified Gram-Schmidt against V
      Vec h(m_tot + 1, 0.0);
      for (std::size_t i = 0; i < V.size(); ++i) {
        h[i] = dot(V[i], w);
        axpy(-h[i], V[i], w);
      }
      // one re-orthogonalisation pass for robustness
      for (std::size_t i = 0; i < V.size(); ++i) {
        const double c2 = dot(V[i], w);
        h[i] += c2;
        axpy(-c2, V[i], w);
      }
      const double beta = nrm2(w);
      if (beta > 0) {
        V.push_back(scaled(w, 1.0 / beta));
      } else {
        V.push_back(Vec(n, 0.0));
      }
      Z.push_back(std::move(z));

      // apply previous rotations, then form the new one
      for (int i = 0; i < j; ++i) {
        const double t = cs[i] * h[i] + sn[i] * h[i + 1];
        h[i + 1] = -sn[i] * h[i] + cs[i] * h[i + 1];
        h[i] = t;
      }
      const double rho = std::hypot(h[j], beta);
      if (rho > 0) {
        cs[j] = h[j] / rho;
        sn[j] = beta / rho;
      } else {
        cs[j] = 1.0;
        sn[j] = 0.0;
      }
      h[j] = rho;
      R.push_back(h);
      g[j + 1] = -sn[j] * g[j];
      g[j] *= cs[j];
      pres = std::fabs(g[j + 1]);
      if (pres <= tol * b_norm) {
        ++j;
        break;
      }
    }

    Vec y = solve_upper(R, g, j);
    Vec dx(n, 0.0);
    for (int c = 0; c < j; ++c) axpy(y[c], Z[c], dx);

    // recycle the correction direction
    const double nx = nrm2(dx);
    if (nx > 0) {
      Vec z_store = scaled(dx, 1.0 / nx);
      Vec az_store;
      if (store_outer_av) {
        az_store = matvec(z_store);
        ++total_mv;
      }
      outer_v.emplace_back(std::move(z_store), std::move(az_store));
      while (outer_v.size() > outer_k) outer_v.erase(outer_v.begin());
    }

    for (std::size_t i = 0; i < n; ++i) x[i] += dx[i];
  }

  if (stats) {
    Vec r = sub(b, matvec(x));
    stats->outer_cycles = cycle;
    stats->matvecs = total_mv + 1;
    stats->final_residual = nrm2(r);
    stats->converged = stats->final_residual <= tol * b_norm;
  }
  return x;
}

}  // namespace nk
