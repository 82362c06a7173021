// fddm_native: host-side native kernels for the FDDM-ASR-TPU framework.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host-side
// hot loops the reference implements in slow Python (SURVEY quirk #10 /
// evaluate.py's O(N*M) double loop):
//   * levenshtein_u32 — edit distance over codepoint arrays (CER/WER inner
//     loop; called per utterance over whole test sets)
//   * levenshtein_batch_u32 — batched variant amortising FFI overhead
//   * pcm16_to_f32 — WAV sample conversion for the data loader
//
// Build:  make -C native     (or scripts/build_native.sh; loaded via ctypes,
// with a pure-Python fallback when the toolchain is unavailable)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Edit distance between uint32 codepoint sequences a[0..n), b[0..m).
int32_t levenshtein_u32(const uint32_t* a, int32_t n, const uint32_t* b,
                        int32_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  std::vector<int32_t> prev(m + 1), cur(m + 1);
  for (int32_t j = 0; j <= m; ++j) prev[j] = j;
  for (int32_t i = 1; i <= n; ++i) {
    cur[0] = i;
    const uint32_t ai = a[i - 1];
    for (int32_t j = 1; j <= m; ++j) {
      const int32_t cost = (ai == b[j - 1]) ? 0 : 1;
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost});
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

// Batched edit distance: sequences are packed back-to-back with offset
// arrays (offs has batch+1 entries).  Results in out[0..batch).
void levenshtein_batch_u32(const uint32_t* a, const int64_t* a_offs,
                           const uint32_t* b, const int64_t* b_offs,
                           int32_t batch, int32_t* out) {
  for (int32_t i = 0; i < batch; ++i) {
    const uint32_t* ap = a + a_offs[i];
    const uint32_t* bp = b + b_offs[i];
    out[i] = levenshtein_u32(ap, (int32_t)(a_offs[i + 1] - a_offs[i]), bp,
                             (int32_t)(b_offs[i + 1] - b_offs[i]));
  }
}

// PCM16 little-endian -> float32 in [-1, 1).
void pcm16_to_f32(const int16_t* in, int64_t n, float* out) {
  constexpr float kScale = 1.0f / 32768.0f;
  for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
}

}  // extern "C"
