// Native BLEU n-gram counting.
// TPU-native framework equivalent of the reference's libbleu extension
// (reference: fairseq/clib/libbleu/libbleu.cpp — clipped n-gram match
// counting over int token arrays). Fresh implementation: hash-map based
// clipped counts for n=1..4, exposed via a C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct NGramKey {
  uint64_t h;
  bool operator==(const NGramKey& o) const { return h == o.h; }
};

struct NGramHash {
  size_t operator()(const NGramKey& k) const { return (size_t)k.h; }
};

inline uint64_t hash_ngram(const int32_t* toks, int n) {
  // FNV-1a over the token bytes
  uint64_t h = 1469598103934665603ULL;
  const uint8_t* p = reinterpret_cast<const uint8_t*>(toks);
  for (int i = 0; i < n * 4; ++i) {
    h ^= p[i];
    h *= 1099511628211ULL;
  }
  return h;
}

}  // namespace

extern "C" {

struct BleuStatC {
  int64_t reflen;
  int64_t predlen;
  int64_t match1, count1;
  int64_t match2, count2;
  int64_t match3, count3;
  int64_t match4, count4;
};

// Accumulate clipped n-gram stats for one (ref, pred) pair into *stat.
void bleu_add(BleuStatC* stat, const int32_t* ref, int64_t ref_len,
              const int32_t* pred, int64_t pred_len) {
  stat->reflen += ref_len;
  stat->predlen += pred_len;
  int64_t* matches = &stat->match1;
  for (int n = 1; n <= 4; ++n) {
    std::unordered_map<NGramKey, int32_t, NGramHash> rgrams;
    for (int64_t i = 0; i + n <= ref_len; ++i) {
      rgrams[{hash_ngram(ref + i, n)}]++;
    }
    int64_t match = 0;
    std::unordered_map<NGramKey, int32_t, NGramHash> used;
    for (int64_t i = 0; i + n <= pred_len; ++i) {
      NGramKey k{hash_ngram(pred + i, n)};
      auto it = rgrams.find(k);
      if (it != rgrams.end() && used[k] < it->second) {
        used[k]++;
        match++;
      }
    }
    int64_t count = pred_len - n + 1;
    matches[2 * (n - 1)] += match;
    matches[2 * (n - 1) + 1] += count > 0 ? count : 0;
  }
}

// Levenshtein distance between two int sequences (libnat equivalent,
// reference: fairseq/clib/libnat/edit_dist.cpp:23-40 DP recurrence).
int64_t levenshtein(const int32_t* a, int64_t la, const int32_t* b, int64_t lb) {
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = i;
    for (int64_t j = 1; j <= lb; ++j) {
      int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1] ? 1 : 0);
      int64_t del = prev[j] + 1;
      int64_t ins = cur[j - 1] + 1;
      int64_t m = sub < del ? sub : del;
      cur[j] = m < ins ? m : ins;
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// Token-budget batch packing (reference semantics:
// fairseq/data/data_utils_fast.pyx:27-123 batch_by_size_fast).
// Writes batch END offsets into out_ends; returns number of batches.
int64_t batch_by_size_fast(const int64_t* sizes, int64_t n,
                           int64_t max_tokens, int64_t max_sentences,
                           int64_t bsz_mult, int64_t* out_ends) {
  int64_t n_batches = 0;
  int64_t start = 0;
  int64_t sample_len = 0;
  std::vector<int64_t> tail_sizes;
  for (int64_t i = 0; i < n; ++i) {
    int64_t sz = sizes[i];
    sample_len = sample_len > sz ? sample_len : sz;
    int64_t cur = i - start;  // batch size before adding i
    int64_t num_tokens = (cur + 1) * sample_len;
    if (cur > 0 && (cur == max_sentences || num_tokens > max_tokens)) {
      int64_t mod_len = bsz_mult * (cur / bsz_mult);
      if (mod_len == 0) mod_len = cur % bsz_mult;
      out_ends[n_batches++] = start + mod_len;
      start = start + mod_len;
      // recompute sample_len over the carried tail + current element
      sample_len = sz;
      for (int64_t j = start; j < i; ++j)
        sample_len = sample_len > sizes[j] ? sample_len : sizes[j];
    }
  }
  if (start < n) out_ends[n_batches++] = n;
  return n_batches;
}

// Batched suggested-edit-ops for Levenshtein NAT training targets
// (reference semantics: fairseq/clib/libnat/edit_dist.cpp:23-115
// suggested_ed2_path — ins/del cost 1, substitute cost 2, backtrack prefers
// insert > delete > keep so tie-breaking matches the reference bit-for-bit).
// Instead of the reference's ragged python-list edit paths, this emits the
// training targets directly as flat batched arrays:
//   ins_counts [B, Lx-1]: tokens to insert between kept x[i] and x[i+1]
//   ins_masks  [B, Ly]  : y positions that are insertions (mask-to-unk)
//   del_labels [B, Lx]  : 1 = delete x[i]
// x/y are right- or mixed-padded with `pad` (pad tokens are skipped).
void suggested_edit_ops(const int32_t* xs, const int32_t* ys,
                        int64_t B, int64_t Lx, int64_t Ly, int32_t pad,
                        int32_t* ins_counts, uint8_t* ins_masks,
                        uint8_t* del_labels) {
  std::vector<int32_t> x, y, ops;
  std::vector<int32_t> d;  // (lx+1) x (ly+1) DP table, row-major
  for (int64_t b = 0; b < B; ++b) {
    x.clear();
    y.clear();
    std::vector<int64_t> xpos;  // original column of each non-pad x token
    for (int64_t i = 0; i < Lx; ++i)
      if (xs[b * Lx + i] != pad) { x.push_back(xs[b * Lx + i]); xpos.push_back(i); }
    for (int64_t j = 0; j < Ly; ++j)
      if (ys[b * Ly + j] != pad) y.push_back(ys[b * Ly + j]);
    const int64_t lx = (int64_t)x.size(), ly = (int64_t)y.size();

    int32_t* ic = ins_counts + b * (Lx > 1 ? Lx - 1 : 1);
    uint8_t* im = ins_masks + b * Ly;
    uint8_t* dl = del_labels + b * Lx;

    if (lx == 0) {  // degenerate: everything is a slot-0 insertion
      for (int64_t j = 0; j < ly; ++j) im[j] = 1;
      continue;
    }

    d.assign((lx + 1) * (ly + 1), 0);
    auto D = [&](int64_t i, int64_t j) -> int32_t& { return d[i * (ly + 1) + j]; };
    for (int64_t i = 0; i <= lx; ++i) D(i, 0) = (int32_t)i;
    for (int64_t j = 0; j <= ly; ++j) D(0, j) = (int32_t)j;
    for (int64_t i = 1; i <= lx; ++i)
      for (int64_t j = 1; j <= ly; ++j) {
        int32_t best = D(i - 1, j) < D(i, j - 1) ? D(i - 1, j) : D(i, j - 1);
        best += 1;
        int32_t sub = D(i - 1, j - 1) + (x[i - 1] == y[j - 1] ? 0 : 2);
        D(i, j) = best < sub ? best : sub;
      }

    // backtrack (ops recorded reversed): 1=insert y, 2=delete x, 3=keep/sub
    ops.clear();
    int64_t i = lx, j = ly;
    while (i > 0 || j > 0) {
      if (j > 0 && D(i, j - 1) < D(i, j)) { ops.push_back(1); --j; }
      else if (i > 0 && D(i - 1, j) < D(i, j)) { ops.push_back(2); --i; }
      else { ops.push_back(3); --i; --j; }
    }

    // forward replay -> targets. Insertions land in the slot after the
    // xcount-th kept/deleted x token; y advances on insert and keep.
    int64_t xcount = 0, ycount = 0;
    for (int64_t k = (int64_t)ops.size() - 1; k >= 0; --k) {
      const int32_t op = ops[k];
      if (op == 1) {
        // only interior slots train the insertion head (reference keeps
        // cells 1..lx-1, levenshtein_utils.py mask_input[1:-1]; bos/eos
        // anchor the ends so edge cells are empty in practice)
        if (xcount >= 1 && xcount <= lx - 1) {
          ic[xcount - 1] += 1;
          if (ycount < ly) im[ycount] = 1;
        }
        ++ycount;
      } else if (op == 2) {
        dl[xpos[xcount]] = 1;
        ++xcount;
      } else {
        ++xcount;
        ++ycount;
      }
    }
  }
}

}  // extern "C"
