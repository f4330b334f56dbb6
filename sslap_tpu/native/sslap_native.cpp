// Native host-side runtime for sslap_tpu (C ABI, loaded via ctypes).
//
// The reference's native tier (Cython) owns ingest and feasibility
// (SURVEY.md SS3a R2/R3).  On TPU the solve loop is XLA/Pallas; the native
// tier here accelerates the host-side pieces that sit off the device hot
// path but on the end-to-end critical path for large instances:
//   * Hopcroft-Karp maximum bipartite matching over CSR (feasibility check)
//   * COO -> padded-ELL layout building (ingest for ~1e7+ nnz problems)
//
// Build: g++ -O3 -march=native -shared -fPIC (see build.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Hopcroft-Karp over bipartite CSR structure.  Deterministic: rows and
// adjacency scanned in index order (matches the numpy fallback in
// feasibility.py, which doubles as its oracle in tests/test_feasibility.py).
// Returns matching size; fills match_row[n], match_col[m] with -1 = free.
// ---------------------------------------------------------------------------
int64_t sslap_hopcroft_karp(const int64_t* indptr, const int64_t* indices,
                            int64_t n, int64_t m,
                            int64_t* match_row, int64_t* match_col) {
  const int64_t INF = INT64_MAX / 4;
  std::fill(match_row, match_row + n, int64_t{-1});
  std::fill(match_col, match_col + m, int64_t{-1});

  // Greedy seed pass.
  int64_t size = 0;
  for (int64_t u = 0; u < n; ++u) {
    for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
      int64_t v = indices[k];
      if (match_col[v] == -1) {
        match_col[v] = u;
        match_row[u] = v;
        ++size;
        break;
      }
    }
  }

  std::vector<int64_t> dist(n), q(n), it(n), stack(n + 1);

  auto bfs = [&]() -> bool {
    int64_t head = 0, tail = 0;
    bool found = false;
    for (int64_t u = 0; u < n; ++u) {
      if (match_row[u] == -1) {
        dist[u] = 0;
        q[tail++] = u;
      } else {
        dist[u] = INF;
      }
    }
    while (head < tail) {
      int64_t u = q[head++];
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
        int64_t w = match_col[indices[k]];
        if (w == -1) {
          found = true;
        } else if (dist[w] == INF) {
          dist[w] = dist[u] + 1;
          q[tail++] = w;
        }
      }
    }
    return found;
  };

  auto dfs = [&](int64_t root) -> bool {
    int64_t top = 0;
    stack[0] = root;
    it[root] = indptr[root];
    while (top >= 0) {
      int64_t u = stack[top];
      bool advanced = false;
      while (it[u] < indptr[u + 1]) {
        int64_t v = indices[it[u]++];
        int64_t w = match_col[v];
        if (w == -1) {
          while (top >= 0) {  // augment along the stack
            int64_t uu = stack[top--];
            int64_t pv = match_row[uu];
            match_row[uu] = v;
            match_col[v] = uu;
            v = pv;
          }
          return true;
        }
        if (dist[w] == dist[u] + 1) {
          stack[++top] = w;
          it[w] = indptr[w];
          advanced = true;
          break;
        }
      }
      if (!advanced) {
        dist[u] = INF;  // dead end this phase
        --top;
      }
    }
    return false;
  };

  while (bfs()) {
    for (int64_t u = 0; u < n; ++u) {
      if (match_row[u] == -1 && dfs(u)) ++size;
    }
  }
  return size;
}

// ---------------------------------------------------------------------------
// COO -> padded ELL.  Two-call protocol:
//   1) sslap_coo_prepare: stable counting-sort by row, per-row sort by col,
//      duplicate detection, per-row counts.  Returns K (max nnz/row), or
//      -1 on duplicate (row, col), -2 on out-of-range index.
//   2) sslap_ell_fill: scatter sorted entries into [n, K] cols/vals/valid.
// perm is caller-allocated [nnz]; counts is [n].
// ---------------------------------------------------------------------------
int64_t sslap_coo_prepare(int64_t nnz, int64_t n, int64_t m,
                          const int64_t* rr, const int64_t* cc,
                          int64_t* perm, int64_t* counts) {
  std::fill(counts, counts + n, int64_t{0});
  for (int64_t k = 0; k < nnz; ++k) {
    if (rr[k] < 0 || rr[k] >= n || cc[k] < 0 || cc[k] >= m) return -2;
    ++counts[rr[k]];
  }
  // Counting sort by row (stable).
  std::vector<int64_t> starts(n + 1, 0);
  for (int64_t u = 0; u < n; ++u) starts[u + 1] = starts[u] + counts[u];
  std::vector<int64_t> cursor(starts.begin(), starts.end() - 1);
  for (int64_t k = 0; k < nnz; ++k) perm[cursor[rr[k]]++] = k;
  // Per-row sort by column; detect duplicates.
  int64_t K = 0;
  for (int64_t u = 0; u < n; ++u) {
    int64_t lo = starts[u], hi = starts[u + 1];
    std::sort(perm + lo, perm + hi,
              [&](int64_t a, int64_t b) { return cc[a] < cc[b]; });
    for (int64_t k = lo + 1; k < hi; ++k) {
      if (cc[perm[k]] == cc[perm[k - 1]]) return -1;
    }
    K = std::max(K, hi - lo);
  }
  return K;
}

void sslap_ell_fill_f32(int64_t nnz, int64_t n, int64_t K,
                        const int64_t* rr, const int64_t* cc,
                        const float* vv, const int64_t* perm,
                        const int64_t* counts,
                        int32_t* ell_cols, float* ell_vals, bool* ell_valid) {
  std::memset(ell_cols, 0, sizeof(int32_t) * n * K);
  std::memset(ell_vals, 0, sizeof(float) * n * K);
  std::memset(ell_valid, 0, sizeof(bool) * n * K);
  int64_t pos = 0;
  for (int64_t u = 0; u < n; ++u) {
    for (int64_t s = 0; s < counts[u]; ++s, ++pos) {
      int64_t k = perm[pos];
      ell_cols[u * K + s] = static_cast<int32_t>(cc[k]);
      ell_vals[u * K + s] = vv[k];
      ell_valid[u * K + s] = true;
    }
  }
}

void sslap_ell_fill_i32(int64_t nnz, int64_t n, int64_t K,
                        const int64_t* rr, const int64_t* cc,
                        const int32_t* vv, const int64_t* perm,
                        const int64_t* counts,
                        int32_t* ell_cols, int32_t* ell_vals,
                        bool* ell_valid) {
  std::memset(ell_cols, 0, sizeof(int32_t) * n * K);
  std::memset(ell_vals, 0, sizeof(int32_t) * n * K);
  std::memset(ell_valid, 0, sizeof(bool) * n * K);
  int64_t pos = 0;
  for (int64_t u = 0; u < n; ++u) {
    for (int64_t s = 0; s < counts[u]; ++s, ++pos) {
      int64_t k = perm[pos];
      ell_cols[u * K + s] = static_cast<int32_t>(cc[k]);
      ell_vals[u * K + s] = vv[k];
      ell_valid[u * K + s] = true;
    }
  }
}

}  // extern "C"
