// Host-side reference LDPC belief-propagation decoder (C++).
//
// Role: independent native oracle for validating the batched Pallas/XLA BP
// decoder (ldpc/decode.py) — same flooding schedule, same tanh-rule
// sum-product updates, same per-codeword syndrome early exit, computed in
// double precision with a straightforward edge-list implementation.
// Also used by bench.py as the single-thread CPU baseline for the decoder.
//
// Exposed C ABI (ctypes):
//   ldpc_bp_decode(m, n, dc_max, ck_cols[m*dc_max], llr[n], max_iter,
//                  min_sum, out_bits[n]) -> iterations used (int)
//
// ck_cols uses the same sentinel convention as ldpc/code.py: entries == n
// mark padding slots of irregular rows.

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

int ldpc_bp_decode(int m, int n, int dc_max, const int32_t* ck_cols,
                   const double* llr, int max_iter, int min_sum,
                   int8_t* out_bits) {
  const double MSG_CLIP = 16.0;
  std::vector<double> r(static_cast<size_t>(m) * dc_max, 0.0);
  std::vector<double> l_tot(n, 0.0);
  std::vector<int8_t> d(n, 0);

  auto posterior = [&]() {
    for (int v = 0; v < n; ++v) l_tot[v] = llr[v];
    for (int c = 0; c < m; ++c) {
      for (int j = 0; j < dc_max; ++j) {
        int v = ck_cols[c * dc_max + j];
        if (v < n) l_tot[v] += r[c * dc_max + j];
      }
    }
    for (int v = 0; v < n; ++v) d[v] = l_tot[v] < 0 ? 1 : 0;
  };

  auto syndrome_ok = [&]() {
    for (int c = 0; c < m; ++c) {
      int parity = 0;
      for (int j = 0; j < dc_max; ++j) {
        int v = ck_cols[c * dc_max + j];
        if (v < n) parity ^= d[v];
      }
      if (parity) return false;
    }
    return true;
  };

  posterior();
  if (syndrome_ok()) {
    for (int v = 0; v < n; ++v) out_bits[v] = d[v];
    return 0;
  }

  std::vector<double> q(dc_max);
  for (int it = 1; it <= max_iter; ++it) {
    // flooding check update with leave-one-out over each row
    for (int c = 0; c < m; ++c) {
      int deg = 0;
      for (int j = 0; j < dc_max; ++j) {
        int v = ck_cols[c * dc_max + j];
        if (v >= n) { q[j] = 0.0; continue; }
        double qj = l_tot[v] - r[c * dc_max + j];
        if (qj > MSG_CLIP) qj = MSG_CLIP;
        if (qj < -MSG_CLIP) qj = -MSG_CLIP;
        q[j] = qj;
        ++deg;
      }
      (void)deg;
      for (int j = 0; j < dc_max; ++j) {
        int v = ck_cols[c * dc_max + j];
        if (v >= n) continue;
        if (min_sum) {
          double sign = 1.0, mag = 1e300;
          for (int k2 = 0; k2 < dc_max; ++k2) {
            if (k2 == j || ck_cols[c * dc_max + k2] >= n) continue;
            sign *= (q[k2] < 0 ? -1.0 : 1.0);
            double a = std::fabs(q[k2]);
            if (a < mag) mag = a;
          }
          r[c * dc_max + j] = sign * mag;
        } else {
          double prod = 1.0;
          for (int k2 = 0; k2 < dc_max; ++k2) {
            if (k2 == j || ck_cols[c * dc_max + k2] >= n) continue;
            prod *= std::tanh(0.5 * q[k2]);
          }
          if (prod > 0.9999999) prod = 0.9999999;
          if (prod < -0.9999999) prod = -0.9999999;
          r[c * dc_max + j] = 2.0 * std::atanh(prod);
        }
      }
    }
    posterior();
    if (syndrome_ok()) {
      for (int v = 0; v < n; ++v) out_bits[v] = d[v];
      return it;
    }
  }
  for (int v = 0; v < n; ++v) out_bits[v] = d[v];
  return max_iter;
}

}  // extern "C"
