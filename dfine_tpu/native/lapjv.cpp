// Batched rectangular linear-sum-assignment (Jonker–Volgenant / shortest
// augmenting path with dual potentials).
//
// This is the repo's native host-side component, mirroring the role of the
// reference's scipy `linear_sum_assignment` C++ dependency
// (reference: src/d_fine/matcher.py:112-120).  The TPU computes the cost
// matrices; only the tiny assignment problem crosses to the host via
// jax.pure_callback, and this library solves all images of the batch in one
// call (optionally multi-threaded).
//
// Algorithm: for each row we grow a Dijkstra-style shortest augmenting path
// over columns, maintaining dual potentials u/v so reduced costs stay
// non-negative; after reaching a free column we update duals along the
// scanned sets and augment.  O(nr * nc^2) worst case; nr <= nc required.
//
// Build: g++ -O3 -shared -fPIC -o liblapjv.so lapjv.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

// Solve one nr x nc (nr <= nc) min-cost assignment.
// cost: row-major [nr, nc].  col4row out: [nr] column index per row.
void solve_one(const float* cost, int nr, int nc, int32_t* col4row) {
  std::vector<float> u(nr, 0.f), v(nc, 0.f);
  std::vector<int32_t> row4col(nc, -1);
  std::vector<float> shortest(nc);
  std::vector<int32_t> pred(nc);      // predecessor row on the path to column j
  std::vector<uint8_t> done(nc);      // column scanned (in SC)
  std::vector<int32_t> scanned_rows;  // rows in SR
  for (int i = 0; i < nr; ++i) col4row[i] = -1;

  for (int cur = 0; cur < nr; ++cur) {
    std::fill(shortest.begin(), shortest.end(), kInf);
    std::fill(done.begin(), done.end(), 0);
    scanned_rows.clear();

    int i = cur;
    float min_val = 0.f;
    int sink = -1;
    while (sink == -1) {
      scanned_rows.push_back(i);
      const float* ci = cost + (size_t)i * nc;
      float lowest = kInf;
      int jmin = -1;
      for (int j = 0; j < nc; ++j) {
        if (done[j]) continue;
        float r = min_val + ci[j] - u[i] - v[j];
        if (r < shortest[j]) {
          shortest[j] = r;
          pred[j] = i;
        }
        // tie-break toward free columns so augmenting paths stay short
        if (shortest[j] < lowest ||
            (shortest[j] == lowest && row4col[j] == -1)) {
          lowest = shortest[j];
          jmin = j;
        }
      }
      // infeasible only if costs are non-finite; bail to identity-ish
      if (jmin < 0 || lowest == kInf) {
        for (int r2 = cur; r2 < nr; ++r2)
          if (col4row[r2] < 0) col4row[r2] = -1;
        return;
      }
      min_val = lowest;
      done[jmin] = 1;
      if (row4col[jmin] == -1) {
        sink = jmin;
      } else {
        i = row4col[jmin];
      }
    }

    // dual updates over scanned sets
    u[cur] += min_val;
    for (int32_t r : scanned_rows) {
      if (r == cur) continue;
      u[r] += min_val - shortest[col4row[r]];
    }
    for (int j = 0; j < nc; ++j) {
      if (done[j]) v[j] -= min_val - shortest[j];
    }

    // augment along the alternating path ending at `sink`
    int j = sink;
    while (true) {
      int32_t r = pred[j];
      row4col[j] = r;
      int32_t tmp = col4row[r];
      col4row[r] = j;
      if (r == cur) break;
      j = tmp;
    }
  }
}

}  // namespace

extern "C" {

// cost: [batch, nr, nc] row-major float32.  col4row: [batch, nr] int32 out.
// n_threads <= 0 -> hardware_concurrency (capped at batch).
int lapjv_batch(const float* cost, int batch, int nr, int nc,
                int32_t* col4row, int n_threads) {
  if (nr > nc || nr <= 0 || nc <= 0 || batch <= 0) return -1;
  int hw = (int)std::thread::hardware_concurrency();
  int nt = n_threads > 0 ? n_threads : (hw > 0 ? hw : 1);
  if (nt > batch) nt = batch;
  if (nt <= 1) {
    for (int b = 0; b < batch; ++b)
      solve_one(cost + (size_t)b * nr * nc, nr, nc, col4row + (size_t)b * nr);
    return 0;
  }
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([=]() {
      for (int b = t; b < batch; b += nt)
        solve_one(cost + (size_t)b * nr * nc, nr, nc,
                  col4row + (size_t)b * nr);
    });
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
