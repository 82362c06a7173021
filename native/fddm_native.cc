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
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// SPM-compatible BPE encoder (mirrors fddm_asr_tpu/tokenizer/spm.py exactly:
// greedy best-score adjacent merge, ties leftmost; CONTROL/UNKNOWN pieces are
// never produced — they fall back to per-codepoint lookup).  The reference's
// native boundary is the SentencePiece C++ library behind its pip wheel
// (SURVEY §2, tokenizer_train.py:256); this is our equivalent of its encoder
// hot loop.  Normalization (NFKC, whitespace folding, dummy prefix, U+2581
// escaping) stays in Python — the bytes arriving here are post-normalization.

constexpr uint8_t kNormal = 1;   // model_proto.NORMAL
constexpr uint8_t kUnknown = 2;  // model_proto.UNKNOWN
constexpr uint8_t kControl = 3;  // model_proto.CONTROL

struct BpeModel {
  std::unordered_map<std::string, int32_t> piece_to_id;
  std::vector<double> scores;
  std::vector<uint8_t> types;
  int32_t unk_id = 0;
};

inline int Utf8Len(unsigned char b) {
  if (b < 0x80) return 1;
  if ((b >> 5) == 0x6) return 2;
  if ((b >> 4) == 0xE) return 3;
  if ((b >> 3) == 0x1E) return 4;
  return 1;  // invalid byte: treat as one symbol
}

struct MergeCand {
  double score;
  int32_t pos;        // index of the left symbol
  int32_t left_len;   // byte lengths at push time (staleness check)
  int32_t right_len;
};

struct CandOrder {  // max-score first; ties -> leftmost position first
  bool operator()(const MergeCand& a, const MergeCand& b) const {
    if (a.score != b.score) return a.score < b.score;
    return a.pos > b.pos;
  }
};

// Encodes one post-normalization UTF-8 string; appends ids to `out`.
void EncodeOne(const BpeModel& m, const char* text, int64_t n_bytes,
               std::vector<int32_t>* out) {
  if (n_bytes <= 0) return;
  // Split into codepoint spans.  A merged symbol is always a contiguous byte
  // range of the immutable input, so (start, len) fully identifies it.
  std::vector<int32_t> start, len;
  for (int64_t i = 0; i < n_bytes;) {
    int l = Utf8Len((unsigned char)text[i]);
    if (i + l > n_bytes) l = 1;
    start.push_back((int32_t)i);
    len.push_back(l);
    i += l;
  }
  const int32_t n = (int32_t)start.size();
  std::vector<int32_t> nxt(n), prv(n);
  std::vector<uint8_t> alive(n, 1);
  for (int32_t i = 0; i < n; ++i) {
    nxt[i] = i + 1;
    prv[i] = i - 1;
  }

  std::priority_queue<MergeCand, std::vector<MergeCand>, CandOrder> heap;
  std::string key;
  auto push = [&](int32_t i) {
    const int32_t j = nxt[i];
    if (j >= n) return;
    key.assign(text + start[i], (size_t)(len[i] + len[j]));
    auto it = m.piece_to_id.find(key);
    if (it != m.piece_to_id.end() && m.types[it->second] == kNormal) {
      heap.push({m.scores[it->second], i, len[i], len[j]});
    }
  };
  for (int32_t i = 0; i + 1 < n; ++i) push(i);

  while (!heap.empty()) {
    const MergeCand c = heap.top();
    heap.pop();
    const int32_t i = c.pos;
    if (!alive[i] || len[i] != c.left_len) continue;
    const int32_t j = nxt[i];
    if (j >= n || !alive[j] || len[j] != c.right_len) continue;
    len[i] += len[j];
    alive[j] = 0;
    nxt[i] = nxt[j];
    if (nxt[i] < n) prv[nxt[i]] = i;
    push(i);
    if (prv[i] >= 0) push(prv[i]);
  }

  for (int32_t i = 0; i < n; ++i) {
    if (!alive[i]) continue;
    key.assign(text + start[i], (size_t)len[i]);
    auto it = m.piece_to_id.find(key);
    if (it != m.piece_to_id.end() && m.types[it->second] != kControl &&
        m.types[it->second] != kUnknown) {
      out->push_back(it->second);
      continue;
    }
    // unknown piece: per-codepoint lookup (spm.py encode(), lines 168-176)
    for (int64_t p = start[i]; p < start[i] + len[i];) {
      int l = Utf8Len((unsigned char)text[p]);
      if (p + l > start[i] + len[i]) l = 1;
      key.assign(text + p, (size_t)l);
      auto cit = m.piece_to_id.find(key);
      out->push_back(cit != m.piece_to_id.end() ? cit->second : m.unk_id);
      p += l;
    }
  }
}

}  // namespace

extern "C" {

// Builds a BPE model.  pieces are concatenated UTF-8 with n+1 offsets.
void* bpe_new(const char* pieces, const int64_t* offs, const double* scores,
              const uint8_t* types, int32_t n, int32_t unk_id) {
  auto* m = new BpeModel();
  m->unk_id = unk_id;
  m->scores.assign(scores, scores + n);
  m->types.assign(types, types + n);
  m->piece_to_id.reserve((size_t)n * 2);
  for (int32_t i = 0; i < n; ++i) {
    std::string p(pieces + offs[i], (size_t)(offs[i + 1] - offs[i]));
    m->piece_to_id[std::move(p)] = i;  // duplicate pieces: last wins (dict semantics)
  }
  return m;
}

void bpe_free(void* h) { delete (BpeModel*)h; }

// Encodes n_texts post-normalization UTF-8 strings (concatenated, n+1
// offsets).  Writes ids into out (capacity out_cap) and per-text counts into
// out_counts.  Returns total ids written, or -1 if out_cap is insufficient
// (caller re-allocates; one id per codepoint is always enough).
int64_t bpe_encode_batch(void* h, const char* texts, const int64_t* offs,
                         int32_t n_texts, int32_t* out, int64_t out_cap,
                         int32_t* out_counts) {
  const auto& m = *(const BpeModel*)h;
  std::vector<int32_t> ids;
  int64_t total = 0;
  for (int32_t t = 0; t < n_texts; ++t) {
    ids.clear();
    EncodeOne(m, texts + offs[t], offs[t + 1] - offs[t], &ids);
    if (total + (int64_t)ids.size() > out_cap) return -1;
    std::memcpy(out + total, ids.data(), ids.size() * sizeof(int32_t));
    total += (int64_t)ids.size();
    out_counts[t] = (int32_t)ids.size();
  }
  return total;
}

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
