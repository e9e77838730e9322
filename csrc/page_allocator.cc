// Page allocator for the paged KV cache — the framework's host-native
// runtime component (the reference's native layer, csrc/*.cu, is host-side
// C++ too; here the host-native piece is the serving allocator, while the
// device math lives in Pallas kernels where it belongs on TPU).
//
// Free-list allocator with per-sequence page chains:
//  - O(1) page alloc/free via a stack of free physical page ids
//  - sequences acquire pages as they grow and release them on completion
//  - copy-on-extend bookkeeping kept minimal: the scheduler (Python) asks
//    "how many pages would seq growth need" and commits atomically, so a
//    continuous-batching step either fully schedules a sequence or leaves
//    it untouched (no partial allocation states).
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct Allocator {
  int64_t num_pages = 0;
  std::vector<int32_t> free_stack;           // available physical pages
  std::vector<int32_t> refcnt;               // per-page; 0 = free
  std::unordered_map<int64_t, std::vector<int32_t>> seq_pages;
  std::mutex mu;
};

// Drop one reference; return the page to the free list at zero. (Prefix
// caching shares prompt-prefix pages across sequences plus one pin held by
// the cache itself, so "release" means decrement, not free.)
void drop_ref(Allocator* a, int32_t page) {
  if (--a->refcnt[page] <= 0) {
    a->refcnt[page] = 0;
    a->free_stack.push_back(page);
  }
}

}  // namespace

extern "C" {

// Create an allocator managing `num_pages` physical pages. Returns a handle.
void* fat_allocator_create(int64_t num_pages) {
  auto* a = new Allocator();
  a->num_pages = num_pages;
  a->free_stack.reserve(num_pages);
  a->refcnt.assign(num_pages, 0);
  // LIFO: hand out low page ids first (stable layouts for tests/debugging).
  for (int64_t i = num_pages - 1; i >= 0; --i) {
    a->free_stack.push_back(static_cast<int32_t>(i));
  }
  return a;
}

void fat_allocator_destroy(void* handle) {
  delete static_cast<Allocator*>(handle);
}

int64_t fat_allocator_free_pages(void* handle) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  return static_cast<int64_t>(a->free_stack.size());
}

// Ensure `seq_id` owns at least `num_pages` pages. Appends newly allocated
// page ids to the sequence chain. Returns 0 on success, -1 if out of pages
// (in which case nothing is allocated — all-or-nothing).
int32_t fat_allocator_grow(void* handle, int64_t seq_id, int64_t num_pages) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  auto& chain = a->seq_pages[seq_id];
  int64_t need = num_pages - static_cast<int64_t>(chain.size());
  if (need <= 0) return 0;
  if (static_cast<int64_t>(a->free_stack.size()) < need) return -1;
  for (int64_t i = 0; i < need; ++i) {
    int32_t p = a->free_stack.back();
    a->free_stack.pop_back();
    a->refcnt[p] = 1;
    chain.push_back(p);
  }
  return 0;
}

// Append EXISTING pages (another sequence's shared prompt prefix, or
// cache-pinned pages) to `seq_id`'s chain, taking one reference each.
// Returns 0, or -1 if any page id is out of range or currently free.
int32_t fat_allocator_adopt(void* handle, int64_t seq_id,
                            const int32_t* pages, int64_t n) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  for (int64_t i = 0; i < n; ++i) {
    if (pages[i] < 0 || pages[i] >= a->num_pages || a->refcnt[pages[i]] <= 0)
      return -1;  // adopting a free page would alias future allocations
  }
  auto& chain = a->seq_pages[seq_id];
  for (int64_t i = 0; i < n; ++i) {
    ++a->refcnt[pages[i]];
    chain.push_back(pages[i]);
  }
  return 0;
}

// Take / drop a chain-independent reference (the prefix cache's own hold
// on a page). Returns the new refcount (0 = freed back to the pool), or
// -1 for invalid pins.
int32_t fat_allocator_pin(void* handle, int32_t page) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  if (page < 0 || page >= a->num_pages || a->refcnt[page] <= 0) return -1;
  return ++a->refcnt[page];
}

int32_t fat_allocator_unpin(void* handle, int32_t page) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  if (page < 0 || page >= a->num_pages || a->refcnt[page] <= 0) return -1;
  drop_ref(a, page);
  return a->refcnt[page];
}

int32_t fat_allocator_refcount(void* handle, int32_t page) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  if (page < 0 || page >= a->num_pages) return -1;
  return a->refcnt[page];
}

// Copy the sequence's page chain into `out` (caller-sized to `capacity`).
// Returns the chain length, or -1 if the sequence is unknown.
int64_t fat_allocator_get_pages(void* handle, int64_t seq_id, int32_t* out,
                                int64_t capacity) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  auto it = a->seq_pages.find(seq_id);
  if (it == a->seq_pages.end()) return -1;
  int64_t n = static_cast<int64_t>(it->second.size());
  int64_t m = n < capacity ? n : capacity;
  std::memcpy(out, it->second.data(), m * sizeof(int32_t));
  return n;
}

// Release the FIRST `n` pages of `seq_id`'s chain (sliding-window serving:
// pages wholly below the attention band are dead — the kernel's page walk
// starts at the band's first page and never revisits them). The caller owns
// the logical-offset bookkeeping: after this, chain position i holds the
// sequence's logical page (freed_total + i). Returns pages freed (may be
// < n if the chain is shorter), or 0 for unknown sequences.
int64_t fat_allocator_release_prefix(void* handle, int64_t seq_id,
                                     int64_t n) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  auto it = a->seq_pages.find(seq_id);
  if (it == a->seq_pages.end() || n <= 0) return 0;
  auto& chain = it->second;
  int64_t m = n < static_cast<int64_t>(chain.size())
                  ? n
                  : static_cast<int64_t>(chain.size());
  for (int64_t i = 0; i < m; ++i) drop_ref(a, chain[i]);
  chain.erase(chain.begin(), chain.begin() + m);
  return m;
}

// Release `n` pages of `seq_id`'s chain starting at position `start`
// (StreamingLLM serving: the window band moves past pages while the sink
// pages at the chain head must stay). Returns pages freed.
int64_t fat_allocator_release_range(void* handle, int64_t seq_id,
                                    int64_t start, int64_t n) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  auto it = a->seq_pages.find(seq_id);
  if (it == a->seq_pages.end() || n <= 0 || start < 0) return 0;
  auto& chain = it->second;
  int64_t sz = static_cast<int64_t>(chain.size());
  if (start >= sz) return 0;
  int64_t m = n < (sz - start) ? n : (sz - start);
  for (int64_t i = 0; i < m; ++i) drop_ref(a, chain[start + i]);
  chain.erase(chain.begin() + start, chain.begin() + start + m);
  return m;
}

// Release all pages owned by `seq_id`. Returns number of pages freed.
int64_t fat_allocator_release(void* handle, int64_t seq_id) {
  auto* a = static_cast<Allocator*>(handle);
  std::lock_guard<std::mutex> lock(a->mu);
  auto it = a->seq_pages.find(seq_id);
  if (it == a->seq_pages.end()) return 0;
  int64_t n = static_cast<int64_t>(it->second.size());
  for (int32_t p : it->second) drop_ref(a, p);
  a->seq_pages.erase(it);
  return n;
}

}  // extern "C"
