// Native byte-level BPE merge engine (the tokenizer hot loop).
//
// The reference's data pipeline leans on tiktoken's Rust core for tokenizer
// throughput (src/fa3/torch/flashattention_pytorch.py:788-794); this is the
// framework's native equivalent for its local GPT-2-format tokenizer
// (flashattention_tpu/tokenizer.py). Python keeps the regex pre-split (the
// GPT-2 pattern needs full Unicode classes; the `regex` module runs it at C
// speed) and hands PRE-SPLIT words to this engine as one contiguous blob +
// offsets; the engine runs the greedy lowest-rank pair merging — the actual
// hot loop — with a per-word memo cache, and returns token ids.
//
// Exact-parity contract: identical ids to BPETokenizer._bpe/encode for any
// vocab/merge table (pinned in tests/test_tokenizer.py). Words are byte
// strings in the GPT-2 byte-unicode alphabet, already UTF-8 encoded by the
// Python side, so keys here are plain bytes — no unicode handling needed.
//
// C ABI (ctypes-bound, no pybind — environment has no pybind11):
//   fat_bpe_create(vocab_blob, vocab_offs, n_vocab,
//                  merge_blob, merge_offs, n_merges) -> handle
//     vocab token i = vocab_blob[vocab_offs[i] : vocab_offs[i+1]] (id = i;
//     offs has n_vocab+1 entries). merge j = pair (2j, 2j+1) in merge_blob
//     (offs has 2*n_merges+1 entries); rank = j.
//   fat_bpe_encode(handle, blob, offs, n_words, out, out_cap) -> n_ids
//     encodes each word blob[offs[i]:offs[i+1]] in order; returns the total
//     id count, or -(needed) if out_cap is too small (caller retries), or
//     -1000000000 on an unknown-symbol error (cannot happen for tables
//     whose 256 byte symbols are all present).
//   fat_bpe_cache_size(handle) -> memoized word count
//   fat_bpe_destroy(handle)

#include <cstdint>
#include <mutex>
#include <string>
#include <unordered_map>
#include <utility>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<std::string, std::string>& p) const {
    std::hash<std::string> h;
    size_t a = h(p.first), b = h(p.second);
    return a ^ (b + 0x9e3779b97f4a7c15ULL + (a << 6) + (a >> 2));
  }
};

struct BpeEngine {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
      ranks;
  // One entry per byte value as a length-1..4 UTF-8-encoded symbol is not
  // needed separately: single characters of the byte-unicode alphabet are
  // themselves vocab entries. The word splitter below walks UTF-8
  // boundaries so "characters" match the Python side's symbol granularity.
  std::unordered_map<std::string, std::vector<int32_t>> cache;
  // ctypes releases the GIL during fat_bpe_encode, so two Python threads
  // sharing one tokenizer (e.g. a data.prefetch worker plus the main
  // thread) reach the memo cache concurrently — guard it like
  // page_allocator.cc guards its free list (review r5). One coarse lock
  // per encode call: the GIL serialized callers anyway before the native
  // engine existed, so this restores the old contract, not a new limit.
  std::mutex mu;
};

// Split a UTF-8 word into its character symbols (each 1-4 bytes). The
// Python side's symbols are single byte-unicode characters, which UTF-8
// encode to 1-2 bytes; walking UTF-8 boundaries reproduces that split.
static void utf8_chars(const std::string& w, std::vector<std::string>* out) {
  out->clear();
  size_t i = 0;
  while (i < w.size()) {
    unsigned char c = w[i];
    size_t len = c < 0x80 ? 1 : (c >> 5) == 0x6 ? 2 : (c >> 4) == 0xE ? 3 : 4;
    if (i + len > w.size()) len = 1;  // malformed tail: take the byte
    out->push_back(w.substr(i, len));
    i += len;
  }
}

static const std::vector<int32_t>* encode_word(BpeEngine* e,
                                               const std::string& word,
                                               bool* err) {
  auto it = e->cache.find(word);
  if (it != e->cache.end()) return &it->second;

  std::vector<std::string> parts;
  utf8_chars(word, &parts);
  // Greedy lowest-rank merging — identical order to BPETokenizer._bpe.
  while (parts.size() > 1) {
    int32_t best_rank = INT32_MAX;
    std::pair<std::string, std::string> best;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      auto r = e->ranks.find({parts[i], parts[i + 1]});
      if (r != e->ranks.end() && r->second < best_rank) {
        best_rank = r->second;
        best = r->first;
      }
    }
    if (best_rank == INT32_MAX) break;
    std::vector<std::string> merged;
    merged.reserve(parts.size());
    for (size_t i = 0; i < parts.size();) {
      if (i + 1 < parts.size() && parts[i] == best.first &&
          parts[i + 1] == best.second) {
        merged.push_back(parts[i] + parts[i + 1]);
        i += 2;
      } else {
        merged.push_back(parts[i]);
        i += 1;
      }
    }
    parts.swap(merged);
  }
  std::vector<int32_t> ids;
  ids.reserve(parts.size());
  for (const auto& p : parts) {
    auto v = e->vocab.find(p);
    if (v == e->vocab.end()) {
      *err = true;
      return nullptr;
    }
    ids.push_back(v->second);
  }
  auto ins = e->cache.emplace(word, std::move(ids));
  return &ins.first->second;
}

}  // namespace

extern "C" {

void* fat_bpe_create(const char* vocab_blob, const int32_t* vocab_offs,
                     int32_t n_vocab, const char* merge_blob,
                     const int32_t* merge_offs, int32_t n_merges) {
  auto* e = new BpeEngine();
  e->vocab.reserve(n_vocab * 2);
  for (int32_t i = 0; i < n_vocab; ++i) {
    e->vocab.emplace(
        std::string(vocab_blob + vocab_offs[i],
                    vocab_offs[i + 1] - vocab_offs[i]),
        i);
  }
  e->ranks.reserve(n_merges * 2);
  for (int32_t j = 0; j < n_merges; ++j) {
    std::string a(merge_blob + merge_offs[2 * j],
                  merge_offs[2 * j + 1] - merge_offs[2 * j]);
    std::string b(merge_blob + merge_offs[2 * j + 1],
                  merge_offs[2 * j + 2] - merge_offs[2 * j + 1]);
    e->ranks.emplace(std::make_pair(std::move(a), std::move(b)), j);
  }
  return e;
}

void fat_bpe_destroy(void* h) { delete static_cast<BpeEngine*>(h); }

int64_t fat_bpe_cache_size(void* h) {
  auto* e = static_cast<BpeEngine*>(h);
  std::lock_guard<std::mutex> lock(e->mu);
  return static_cast<int64_t>(e->cache.size());
}

int64_t fat_bpe_encode(void* h, const char* blob, const int32_t* offs,
                       int32_t n_words, int32_t* out, int64_t out_cap) {
  auto* e = static_cast<BpeEngine*>(h);
  std::lock_guard<std::mutex> lock(e->mu);
  int64_t n = 0;
  bool err = false;
  for (int32_t i = 0; i < n_words; ++i) {
    std::string word(blob + offs[i], offs[i + 1] - offs[i]);
    const std::vector<int32_t>* ids = encode_word(e, word, &err);
    if (err) return -1000000000;
    if (n + static_cast<int64_t>(ids->size()) <= out_cap) {
      for (int32_t id : *ids) out[n++] = id;
    } else {
      n += static_cast<int64_t>(ids->size());  // keep counting: report need
      // mark overflow by finishing the count pass without writing
      for (int32_t j = i + 1; j < n_words; ++j) {
        std::string w2(blob + offs[j], offs[j + 1] - offs[j]);
        const std::vector<int32_t>* ids2 = encode_word(e, w2, &err);
        if (err) return -1000000000;
        n += static_cast<int64_t>(ids2->size());
      }
      return -n;
    }
  }
  return n;
}

}  // extern "C"
