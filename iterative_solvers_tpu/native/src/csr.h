// CSR sparse matrix + SpMV for the native layer.
//
// Native counterpart of the reference's Eigen::SparseMatrix usage
// (cpp_work/.../main.cpp:38-81, Header.h:14: SpMat = RowMajor sparse).
#pragma once

#include <cstdint>
#include <vector>

#include "vec.h"

namespace nk {

struct CSR {
  std::int64_t n_rows = 0;
  std::int64_t n_cols = 0;
  std::vector<std::int64_t> indptr;   // size n_rows + 1
  std::vector<std::int64_t> indices;  // size nnz
  std::vector<double> data;           // size nnz

  Vec matvec(const Vec &x) const {
    Vec y(static_cast<std::size_t>(n_rows), 0.0);
    // rows are independent; parallelise when the matrix is large enough to
    // amortise thread startup (the reference's native layer is serial)
#pragma omp parallel for schedule(static) if (n_rows > 16384)
    for (std::int64_t i = 0; i < n_rows; ++i) {
      double s = 0.0;
      for (std::int64_t k = indptr[i]; k < indptr[i + 1]; ++k)
        s += data[k] * x[indices[k]];
      y[i] = s;
    }
    return y;
  }
};

// Triplet builder (sorted insertion happens once at finalise time).
struct Triplets {
  std::int64_t n_rows, n_cols;
  std::vector<std::int64_t> row, col;
  std::vector<double> val;

  Triplets(std::int64_t r, std::int64_t c) : n_rows(r), n_cols(c) {}

  void add(std::int64_t r, std::int64_t c, double v) {
    row.push_back(r);
    col.push_back(c);
    val.push_back(v);
  }

  CSR to_csr() const;
};

// C = A * B (both CSR); needed for L = -Lap^2 - 2 Lap + (r-1) I.
CSR spgemm(const CSR &a, const CSR &b);
// C = alpha*A + beta*B (same shape).
CSR spadd(const CSR &a, double alpha, const CSR &b, double beta);
// Identity.
CSR identity(std::int64_t n);

}  // namespace nk
