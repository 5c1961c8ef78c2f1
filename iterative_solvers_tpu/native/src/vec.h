// Minimal dense-vector kernels for the native Newton-Krylov library.
//
// The reference's native layer is Eigen-based (cpp_work/.../Header.h:14:
// Vec = Eigen::Matrix<double,Dynamic,1>); Eigen is not available in this
// image, and the handful of BLAS-1 operations the solvers need do not
// justify vendoring it.  Plain std::vector<double> + tight loops (g++ -O3
// auto-vectorises these).
#pragma once

#include <cmath>
#include <cstddef>
#include <functional>
#include <vector>

namespace nk {

using Vec = std::vector<double>;

inline double dot(const Vec &a, const Vec &b) {
  double s = 0.0;
  for (std::size_t i = 0; i < a.size(); ++i) s += a[i] * b[i];
  return s;
}

inline double nrm2(const Vec &a) { return std::sqrt(dot(a, a)); }

inline double max_abs(const Vec &a) {
  double m = 0.0;
  for (double v : a) m = std::max(m, std::fabs(v));
  return m;
}

// y += alpha * x
inline void axpy(double alpha, const Vec &x, Vec &y) {
  for (std::size_t i = 0; i < x.size(); ++i) y[i] += alpha * x[i];
}

inline void scale(Vec &x, double alpha) {
  for (double &v : x) v *= alpha;
}

inline Vec scaled(const Vec &x, double alpha) {
  Vec y(x);
  scale(y, alpha);
  return y;
}

// a - b
inline Vec sub(const Vec &a, const Vec &b) {
  Vec c(a.size());
  for (std::size_t i = 0; i < a.size(); ++i) c[i] = a[i] - b[i];
  return c;
}

inline Vec add(const Vec &a, const Vec &b) {
  Vec c(a.size());
  for (std::size_t i = 0; i < a.size(); ++i) c[i] = a[i] + b[i];
  return c;
}

using MatVec = std::function<Vec(const Vec &)>;

}  // namespace nk
