#include "csr.h"

#include <algorithm>
#include <map>
#include <numeric>

namespace nk {

CSR Triplets::to_csr() const {
  CSR m;
  m.n_rows = n_rows;
  m.n_cols = n_cols;
  const std::size_t nnz = val.size();
  std::vector<std::size_t> order(nnz);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](std::size_t a, std::size_t b) {
    if (row[a] != row[b]) return row[a] < row[b];
    return col[a] < col[b];
  });
  m.indptr.assign(n_rows + 1, 0);
  m.indices.reserve(nnz);
  m.data.reserve(nnz);
  std::int64_t prev_r = -1, prev_c = -1;
  for (std::size_t k : order) {
    if (row[k] == prev_r && col[k] == prev_c) {
      m.data.back() += val[k];  // accumulate duplicates
      continue;
    }
    m.indices.push_back(col[k]);
    m.data.push_back(val[k]);
    m.indptr[row[k] + 1]++;
    prev_r = row[k];
    prev_c = col[k];
  }
  for (std::int64_t i = 0; i < n_rows; ++i) m.indptr[i + 1] += m.indptr[i];
  return m;
}

CSR spgemm(const CSR &a, const CSR &b) {
  CSR c;
  c.n_rows = a.n_rows;
  c.n_cols = b.n_cols;
  c.indptr.assign(a.n_rows + 1, 0);
  std::vector<double> acc(b.n_cols, 0.0);
  std::vector<std::int64_t> marked;
  for (std::int64_t i = 0; i < a.n_rows; ++i) {
    marked.clear();
    for (std::int64_t ka = a.indptr[i]; ka < a.indptr[i + 1]; ++ka) {
      const std::int64_t j = a.indices[ka];
      const double av = a.data[ka];
      for (std::int64_t kb = b.indptr[j]; kb < b.indptr[j + 1]; ++kb) {
        const std::int64_t jc = b.indices[kb];
        if (acc[jc] == 0.0) marked.push_back(jc);
        acc[jc] += av * b.data[kb];
      }
    }
    std::sort(marked.begin(), marked.end());
    for (std::int64_t jc : marked) {
      if (acc[jc] != 0.0) {
        c.indices.push_back(jc);
        c.data.push_back(acc[jc]);
        c.indptr[i + 1]++;
      }
      acc[jc] = 0.0;
    }
  }
  for (std::int64_t i = 0; i < c.n_rows; ++i) c.indptr[i + 1] += c.indptr[i];
  return c;
}

CSR spadd(const CSR &a, double alpha, const CSR &b, double beta) {
  Triplets t(a.n_rows, a.n_cols);
  for (std::int64_t i = 0; i < a.n_rows; ++i) {
    for (std::int64_t k = a.indptr[i]; k < a.indptr[i + 1]; ++k)
      t.add(i, a.indices[k], alpha * a.data[k]);
    for (std::int64_t k = b.indptr[i]; k < b.indptr[i + 1]; ++k)
      t.add(i, b.indices[k], beta * b.data[k]);
  }
  return t.to_csr();
}

CSR identity(std::int64_t n) {
  Triplets t(n, n);
  for (std::int64_t i = 0; i < n; ++i) t.add(i, i, 1.0);
  return t.to_csr();
}

}  // namespace nk
