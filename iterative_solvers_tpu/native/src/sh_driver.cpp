// Standalone Swift-Hohenberg driver — native counterpart of the reference's
// cpp_work executable (main.cpp:34-110): assemble the operator, run the
// Crank-Nicolson Newton-Krylov time loop, write the final state.
//
// Usage: sh_driver [N] [d] [k] [Tf] [r] [g] [out.txt]
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>

#include "sh_model.h"

int main(int argc, char **argv) {
  const int n = argc > 1 ? std::atoi(argv[1]) : 64;
  const double d = argc > 2 ? std::atof(argv[2]) : 40.0;
  const double k = argc > 3 ? std::atof(argv[3]) : 0.2;
  const double tf = argc > 4 ? std::atof(argv[4]) : 10.0;
  const double r = argc > 5 ? std::atof(argv[5]) : 0.01;
  const double g = argc > 6 ? std::atof(argv[6]) : 1.0;
  const char *out = argc > 7 ? argv[7] : "sh_out.txt";

  const int nsteps = static_cast<int>(std::ceil(tf / k));
  nk::SHModel model(n, d, k, r, g);

  std::mt19937_64 rng(0);
  std::normal_distribution<double> dist(0.0, 1.0);
  nk::Vec u(static_cast<std::size_t>(n) * n);
  for (double &v : u) v = dist(rng);

  nk::NonlinOptions opt;  // scipy-default f_tol = 6e-6 (main.cpp:104)
  std::vector<nk::NonlinStats> stats;
  u = model.evolve(u, nsteps, opt, &stats);

  int converged = 0;
  int fev = 0;
  for (const auto &s : stats) {
    converged += s.converged ? 1 : 0;
    fev += s.func_evals;
  }
  std::printf("steps=%d converged=%d func_evals=%d final_fnorm=%.3e\n",
              nsteps, converged, fev,
              stats.empty() ? 0.0 : stats.back().f_norm);

  std::FILE *f = std::fopen(out, "w");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", out);
    return 1;
  }
  for (double v : u) std::fprintf(f, "%.17g\n", v);
  std::fclose(f);
  return 0;
}
