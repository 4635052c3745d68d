// Dynamic time warping with Sakoe-Chiba band and backtracking.
//
// Native equivalent of the reference's numba-compiled DTW kernel
// (`utils/oversmoothing.py:109-200`): accumulated-cost DP over time-major
// feature sequences A [Ta, M] and B [Tb, M] with L2 or cosine frame
// distance, int8 backpointers, and path backtracking. Exposed via a C ABI
// and loaded from Python with ctypes (tts_arabic_tpu/eval/dtw.py).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

inline float l2_row(const float* a, const float* b, int m) {
  float acc = 0.0f;
  for (int k = 0; k < m; ++k) {
    const float d = a[k] - b[k];
    acc += d * d;
  }
  return std::sqrt(acc);
}

inline float cosine_row(const float* a, const float* b, int m) {
  float dot = 0.0f, na = 0.0f, nb = 0.0f;
  for (int k = 0; k < m; ++k) {
    dot += a[k] * b[k];
    na += a[k] * a[k];
    nb += b[k] * b[k];
  }
  const float denom = std::sqrt(na) * std::sqrt(nb) + 1e-12f;
  return 1.0f - dot / denom;
}

}  // namespace

extern "C" {

// Returns 0 on success. path_out must hold (Ta+Tb)*2 int32; *path_len gets
// the number of (i, j) pairs written in ascending time order.
int dtw_path(const float* A, const float* B, int Ta, int Tb, int M,
             int metric, int window, float* total_cost, int32_t* path_out,
             int32_t* path_len) {
  if (Ta <= 0 || Tb <= 0 || M <= 0) return 1;
  const float kInf = 1e30f;
  const bool use_band = window >= 0;

  // rolling 2-row accumulated cost; full backpointer matrix
  std::vector<float> prev(Tb + 1, kInf), curr(Tb + 1, kInf);
  std::vector<int8_t> bp(static_cast<size_t>(Ta) * Tb, -1);
  prev[0] = 0.0f;

  for (int i = 1; i <= Ta; ++i) {
    int j_min = 1, j_max = Tb;
    if (use_band) {
      j_min = i - window < 1 ? 1 : i - window;
      j_max = i + window > Tb ? Tb : i + window;
    }
    std::fill(curr.begin(), curr.end(), kInf);
    // D[i][0] is +inf except D[0][0]; handled by prev/curr init
    const float* ai = A + static_cast<size_t>(i - 1) * M;
    for (int j = j_min; j <= j_max; ++j) {
      const float cost = metric == 0 ? l2_row(ai, B + static_cast<size_t>(j - 1) * M, M)
                                     : cosine_row(ai, B + static_cast<size_t>(j - 1) * M, M);
      const float up = prev[j];
      const float left = curr[j - 1];
      const float diag = prev[j - 1];
      float best = up;
      int8_t p = 0;
      if (left < best) { best = left; p = 1; }
      if (diag < best) { best = diag; p = 2; }
      curr[j] = cost + best;
      bp[static_cast<size_t>(i - 1) * Tb + (j - 1)] = p;
    }
    std::swap(prev, curr);
  }
  *total_cost = prev[Tb];

  // backtrack (matches the reference's loop semantics incl. early break on
  // unreachable cells)
  int i = Ta - 1, j = Tb - 1;
  std::vector<int32_t> rev;
  rev.reserve(2 * (Ta + Tb));
  while (i >= 0 && j >= 0) {
    rev.push_back(i);
    rev.push_back(j);
    const int8_t p = bp[static_cast<size_t>(i) * Tb + j];
    if (p == 2) { --i; --j; }
    else if (p == 0) { --i; }
    else if (p == 1) { --j; }
    else {
      // unreachable cell: the reference's loop increments its counter only
      // after a successful move, so the just-pushed pair is dropped
      rev.pop_back();
      rev.pop_back();
      break;
    }
  }
  const int L = static_cast<int>(rev.size() / 2);
  for (int k = 0; k < L; ++k) {
    path_out[2 * k] = rev[2 * (L - 1 - k)];
    path_out[2 * k + 1] = rev[2 * (L - 1 - k) + 1];
  }
  *path_len = L;
  return 0;
}

}  // extern "C"
