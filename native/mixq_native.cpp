// Native runtime core: paged-KV block manager (C ABI, loaded via ctypes).
//
// TPU-native counterpart of the reference's C++ executor internals
// (tensorrt_llm C++ BlocksManager behind bindings/executor.pyi and
// bin/executorWorker; Python mirror at runtime/kv_cache_manager.py:66-244).
// The device data plane stays in XLA; this is the control plane that must
// run in O(1)-ish time between decode steps at large batch: ref-counted
// block pool, per-sequence page lists, sliding-window recycling, fork
// (prefix sharing), and block-table serialization.
//
// Build: g++ -O2 -shared -fPIC -o libmixq_native.so mixq_native.cpp

#include <cstdint>
#include <cstring>
#include <deque>
#include <list>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t kPadPos = 1 << 30;  // padded block_pos entries (masked)

struct Sequence {
  std::vector<int32_t> blocks;
  std::vector<int32_t> bases;  // absolute base position of each block
  int64_t length = 0;          // tokens stored
};

struct Manager {
  int32_t num_blocks = 0;
  int32_t block_size = 0;
  int32_t sink_blocks = 0;
  int32_t window_blocks = -1;  // -1: unbounded
  std::vector<int32_t> free_list;
  std::vector<int32_t> ref_counts;
  std::unordered_map<int64_t, Sequence> seqs;
  // content-addressed prefix cache (reference executor enableBlockReuse):
  // chain-key -> block id; lru holds insertion order for eviction.
  std::unordered_map<uint64_t, int32_t> prefix_cache;
  std::unordered_map<int32_t, uint64_t> prefix_of_block;
  std::list<uint64_t> prefix_lru;
};

uint64_t chain_hash(uint64_t prev, const int64_t* toks, int32_t n) {
  uint64_t hsh = prev * 1099511628211ULL + 14695981039346656037ULL;
  for (int32_t i = 0; i < n; ++i)
    hsh = (hsh ^ static_cast<uint64_t>(toks[i])) * 1099511628211ULL;
  return hsh;
}

void reclaim(Manager& m, int32_t n) {
  // evict only EXCLUSIVELY cache-owned entries (refcount 1); shared ones
  // stay cached — evicting them frees nothing and loses reuse
  for (auto it = m.prefix_lru.begin(); n > 0 && it != m.prefix_lru.end();) {
    auto pit = m.prefix_cache.find(*it);
    if (pit == m.prefix_cache.end()) {
      it = m.prefix_lru.erase(it);
      continue;
    }
    int32_t b = pit->second;
    if (m.ref_counts[b] != 1) {
      ++it;
      continue;
    }
    m.prefix_cache.erase(pit);
    m.prefix_of_block.erase(b);
    m.ref_counts[b] = 0;
    m.free_list.push_back(b);
    it = m.prefix_lru.erase(it);
    --n;
  }
}

int32_t take_free(Manager& m) {
  if (m.free_list.empty()) reclaim(m, 1);
  if (m.free_list.empty()) return -1;
  int32_t b = m.free_list.back();
  m.free_list.pop_back();
  return b;
}

std::mutex g_mu;
std::unordered_map<int64_t, Manager> g_managers;
int64_t g_next_handle = 1;

Manager* get(int64_t h) {
  auto it = g_managers.find(h);
  return it == g_managers.end() ? nullptr : &it->second;
}

int32_t blocks_needed(const Manager& m, int64_t tokens) {
  return static_cast<int32_t>((tokens + m.block_size - 1) / m.block_size);
}

int64_t allocatable(const Manager& m) {
  int64_t evictable = 0;
  for (const auto& kv : m.prefix_of_block)
    if (m.ref_counts[kv.first] == 1) ++evictable;
  return static_cast<int64_t>(m.free_list.size()) + evictable;
}

}  // namespace

extern "C" {

// Returns a manager handle. Block 0 is reserved as the trash block for
// masked padding writes (mirrors the Python BlockManager contract).
int64_t mixq_bm_create(int32_t num_blocks, int32_t block_size,
                       int32_t sink_blocks, int32_t window_blocks) {
  std::lock_guard<std::mutex> lock(g_mu);
  int64_t h = g_next_handle++;
  Manager& m = g_managers[h];
  m.num_blocks = num_blocks;
  m.block_size = block_size;
  m.sink_blocks = sink_blocks;
  m.window_blocks = window_blocks;
  m.ref_counts.assign(num_blocks, 0);
  // stack order matches the Python BlockManager (pop from the high end) so
  // both implementations produce identical block tables
  m.free_list.reserve(num_blocks - 1);
  for (int32_t b = 1; b < num_blocks; ++b) m.free_list.push_back(b);
  return h;
}

void mixq_bm_destroy(int64_t h) {
  std::lock_guard<std::mutex> lock(g_mu);
  g_managers.erase(h);
}

int32_t mixq_bm_prefix_cache_size(int64_t h) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  return m ? static_cast<int32_t>(m->prefix_cache.size()) : -1;
}

int32_t mixq_bm_num_free(int64_t h) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  return m ? static_cast<int32_t>(m->free_list.size()) : -1;
}

int32_t mixq_bm_can_allocate(int64_t h, int64_t num_tokens) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return 0;
  return allocatable(*m) >= blocks_needed(*m, num_tokens) ? 1 : 0;
}

// 0 on success; -1 unknown handle; -2 seq exists; -3 pool exhausted.
int32_t mixq_bm_add_sequence(int64_t h, int64_t seq_id, int64_t num_tokens) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  if (m->seqs.count(seq_id)) return -2;
  int32_t need = blocks_needed(*m, num_tokens < 1 ? 1 : num_tokens);
  if (allocatable(*m) < need) return -3;
  Sequence s;
  s.length = num_tokens;
  s.blocks.reserve(need);
  s.bases.reserve(need);
  for (int32_t i = 0; i < need; ++i) {
    int32_t b = take_free(*m);
    if (b < 0) return -3;
    m->ref_counts[b]++;
    s.blocks.push_back(b);
    s.bases.push_back(i * m->block_size);
  }
  m->seqs.emplace(seq_id, std::move(s));
  return 0;
}

// add_sequence adopting cached full-prefix blocks whose chain hash over
// `tokens` matches (reference enableBlockReuse). At least one trailing
// token stays uncached. Returns cached token count, or <0 on error.
int32_t mixq_bm_add_sequence_cached(int64_t h, int64_t seq_id,
                                    const int64_t* tokens,
                                    int64_t num_tokens) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  if (m->seqs.count(seq_id)) return -2;
  int32_t bs = m->block_size;
  int64_t matchable = num_tokens - 1;   // keep >=1 token uncached
  std::vector<int32_t> adopted;
  uint64_t key = 0;
  for (int64_t i = 0; (i + 1) * bs <= matchable; ++i) {
    key = chain_hash(key, tokens + i * bs, bs);
    auto it = m->prefix_cache.find(key);
    if (it == m->prefix_cache.end()) break;
    adopted.push_back(it->second);
  }
  int32_t need = blocks_needed(*m, num_tokens < 1 ? 1 : num_tokens) -
                 static_cast<int32_t>(adopted.size());
  if (allocatable(*m) < need) return -3;
  Sequence s;
  s.length = num_tokens;
  for (int32_t b : adopted) {
    m->ref_counts[b]++;
    s.blocks.push_back(b);
  }
  for (int32_t i = 0; i < need; ++i) {
    int32_t b = take_free(*m);
    if (b < 0) return -3;
    m->ref_counts[b]++;
    s.blocks.push_back(b);
  }
  for (size_t i = 0; i < s.blocks.size(); ++i)
    s.bases.push_back(static_cast<int32_t>(i) * bs);
  m->seqs.emplace(seq_id, std::move(s));
  return static_cast<int32_t>(adopted.size()) * bs;
}

// Register the sequence's full blocks covering tokens[:upto] (call after
// their KV is written). 0 on success.
int32_t mixq_bm_register_prefix(int64_t h, int64_t seq_id,
                                const int64_t* tokens, int64_t upto) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -2;
  Sequence& s = it->second;
  int32_t bs = m->block_size;
  uint64_t key = 0;
  for (int64_t i = 0; (i + 1) * bs <= upto; ++i) {
    key = chain_hash(key, tokens + i * bs, bs);
    int32_t b = s.blocks[i];
    if (m->prefix_cache.count(key) || m->prefix_of_block.count(b)) continue;
    m->prefix_cache.emplace(key, b);
    m->prefix_of_block.emplace(b, key);
    m->prefix_lru.push_back(key);
    m->ref_counts[b]++;
  }
  return 0;
}

// Grow by new_tokens; recycles the oldest non-sink block when windowed.
// 0 success; -1 unknown handle; -2 unknown seq; -3 exhausted.
int32_t mixq_bm_extend(int64_t h, int64_t seq_id, int64_t new_tokens) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -2;
  Sequence& s = it->second;
  int64_t target = s.length + new_tokens;
  while (s.bases.back() + m->block_size < target) {
    int32_t next_base = s.bases.back() + m->block_size;
    if (m->window_blocks >= 0 &&
        static_cast<int32_t>(s.blocks.size()) >=
            m->sink_blocks + m->window_blocks) {
      // recycle the oldest non-sink block in place; it moves to the tail
      // with a fresh base (stale slots sit in the causal future)
      int32_t blk = s.blocks[m->sink_blocks];
      s.blocks.erase(s.blocks.begin() + m->sink_blocks);
      s.bases.erase(s.bases.begin() + m->sink_blocks);
      s.blocks.push_back(blk);
      s.bases.push_back(next_base);
      continue;
    }
    int32_t b = take_free(*m);
    if (b < 0) return -3;
    m->ref_counts[b]++;
    s.blocks.push_back(b);
    s.bases.push_back(next_base);
  }
  s.length = target;
  return 0;
}

// Shrink to new_length tokens, freeing tail blocks entirely beyond it
// (draft-token rewind, reference kv_cache_manager.py KVCacheUpdater).
// 0 success; -1 unknown handle; -2 unknown seq; -7 windowed manager
// (cannot rewind across recycled pages); -8 bad length.
int32_t mixq_bm_rewind(int64_t h, int64_t seq_id, int64_t new_length) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -2;
  if (m->window_blocks >= 0) return -7;
  Sequence& s = it->second;
  if (new_length < 1 || new_length > s.length) return -8;
  while (s.blocks.size() > 1 && s.bases.back() >= new_length) {
    int32_t b = s.blocks.back();
    s.blocks.pop_back();
    s.bases.pop_back();
    if (--m->ref_counts[b] == 0) m->free_list.push_back(b);
  }
  s.length = new_length;
  return 0;
}

int32_t mixq_bm_free_sequence(int64_t h, int64_t seq_id) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -2;
  for (int32_t b : it->second.blocks) {
    if (--m->ref_counts[b] == 0) m->free_list.push_back(b);
  }
  m->seqs.erase(it);
  return 0;
}

int32_t mixq_bm_fork(int64_t h, int64_t src_id, int64_t dst_id) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  auto it = m->seqs.find(src_id);
  if (it == m->seqs.end()) return -2;
  if (m->seqs.count(dst_id)) return -4;
  Sequence copy = it->second;
  for (int32_t b : copy.blocks) m->ref_counts[b]++;
  m->seqs.emplace(dst_id, std::move(copy));
  return 0;
}

// Writes min(len(blocks), max_blocks) entries; padding repeats the last
// real block (the Pallas pipeline elides same-index re-fetches, so padded
// grid steps cost no DMA; block_pos padding masks them out).
// Returns number of live blocks, or <0 on error.
int32_t mixq_bm_block_table(int64_t h, int64_t seq_id, int32_t* out,
                            int32_t max_blocks) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -2;
  const auto& blocks = it->second.blocks;
  if (static_cast<int32_t>(blocks.size()) > max_blocks) return -5;
  std::memcpy(out, blocks.data(), sizeof(int32_t) * blocks.size());
  int32_t pad = blocks.empty() ? 0 : blocks.back();
  for (int32_t i = static_cast<int32_t>(blocks.size()); i < max_blocks; ++i)
    out[i] = pad;
  return static_cast<int32_t>(blocks.size());
}

// Absolute base position per table entry; pads with kPadPos.
int32_t mixq_bm_block_pos(int64_t h, int64_t seq_id, int32_t* out,
                          int32_t max_blocks) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -2;
  const auto& bases = it->second.bases;
  if (static_cast<int32_t>(bases.size()) > max_blocks) return -5;
  std::memcpy(out, bases.data(), sizeof(int32_t) * bases.size());
  for (int32_t i = static_cast<int32_t>(bases.size()); i < max_blocks; ++i)
    out[i] = kPadPos;
  return static_cast<int32_t>(bases.size());
}

int32_t mixq_bm_block_poss(int64_t h, const int64_t* seq_ids, int32_t n,
                           int32_t* out, int32_t max_blocks) {
  for (int32_t i = 0; i < n; ++i) {
    int32_t r =
        mixq_bm_block_pos(h, seq_ids[i], out + i * max_blocks, max_blocks);
    if (r < 0) return r;
  }
  return 0;
}

// Batched table fill: seq_ids[n] -> out[n * max_blocks]. Returns 0 or the
// first error code encountered.
int32_t mixq_bm_block_tables(int64_t h, const int64_t* seq_ids, int32_t n,
                             int32_t* out, int32_t max_blocks) {
  for (int32_t i = 0; i < n; ++i) {
    int32_t r =
        mixq_bm_block_table(h, seq_ids[i], out + i * max_blocks, max_blocks);
    if (r < 0) return r;
  }
  return 0;
}

int64_t mixq_bm_seq_length(int64_t h, int64_t seq_id) {
  std::lock_guard<std::mutex> lock(g_mu);
  Manager* m = get(h);
  if (!m) return -1;
  auto it = m->seqs.find(seq_id);
  if (it == m->seqs.end()) return -2;
  return it->second.length;
}

}  // extern "C"
