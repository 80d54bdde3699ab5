// Native host-DRAM KV store: partitioned hash map for embedding vectors.
//
// TPU-native counterpart of the reference's volatile-database hash-map
// backends (hash_map / parallel_hash_map: partitions = min(cores,16),
// per-partition allocation chunks, overflow margin/policy/resolution —
// reference docs/hierarchical_parameter_server.md:403-512). The reference
// implements these natively in C++ inside the HugeCTR engine; this file is
// the equivalent native component for the TPU build (task rule: native
// subsystems stay native), exposed to Python over a C ABI (ctypes).
//
// Design:
//   - open-addressing (linear probe) int64 -> row-index table per partition,
//     power-of-two capacity, max load factor 0.6, tombstone-free (backshift
//     deletion);
//   - row arena per partition (float32, dim columns), grown geometrically;
//   - per-partition shared_mutex: concurrent bulk queries, exclusive inserts;
//   - partition chosen by key low bits (reference docs/architecture.md:131);
//   - eviction policies: 0=random, 1=least-used (access tick), 2=oldest
//     (insert tick), applied per partition when count exceeds
//     margin/num_partitions, down to resolution_target
//     (reference docs/hierarchical_parameter_server.md:460-487);
//   - bulk ops parallelized across partitions with std::thread (bounded by
//     hardware_concurrency, mirroring reference thread_pool.cpp:28-35).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <random>
#include <shared_mutex>
#include <thread>
#include <vector>

namespace {

constexpr int64_t kEmpty = INT64_MIN;

struct Partition {
  int dim;
  // hash table: slot -> key + row
  std::vector<int64_t> slot_key;
  std::vector<uint32_t> slot_row;
  size_t mask = 0;
  size_t count = 0;
  // row arena
  std::vector<float> rows;
  std::vector<int64_t> row_key;       // reverse map row -> key
  std::vector<uint64_t> last_used;    // access tick per row
  std::vector<uint64_t> inserted_at;  // insert tick per row
  uint64_t tick = 0;
  mutable std::shared_mutex mu;

  explicit Partition(int d) : dim(d) { rehash(1024); }

  void rehash(size_t new_cap) {
    std::vector<int64_t> old_keys = std::move(slot_key);
    std::vector<uint32_t> old_rows = std::move(slot_row);
    slot_key.assign(new_cap, kEmpty);
    slot_row.assign(new_cap, 0);
    mask = new_cap - 1;
    for (size_t i = 0; i < old_keys.size(); ++i) {
      if (old_keys[i] != kEmpty) place(old_keys[i], old_rows[i]);
    }
  }

  static inline size_t hash_key(int64_t k) {
    uint64_t x = static_cast<uint64_t>(k);
    x ^= x >> 33; x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33; x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return static_cast<size_t>(x);
  }

  inline void place(int64_t key, uint32_t row) {
    size_t i = hash_key(key) & mask;
    while (slot_key[i] != kEmpty) i = (i + 1) & mask;
    slot_key[i] = key;
    slot_row[i] = row;
  }

  // returns slot index or SIZE_MAX
  inline size_t find(int64_t key) const {
    size_t i = hash_key(key) & mask;
    while (true) {
      if (slot_key[i] == key) return i;
      if (slot_key[i] == kEmpty) return SIZE_MAX;
      i = (i + 1) & mask;
    }
  }

  void maybe_grow() {
    if (count * 5 >= (mask + 1) * 3) rehash((mask + 1) * 2);  // load > 0.6
  }

  // backshift deletion keeps probes correct without tombstones
  void erase_slot(size_t i) {
    slot_key[i] = kEmpty;
    size_t j = i;
    while (true) {
      j = (j + 1) & mask;
      if (slot_key[j] == kEmpty) break;
      size_t ideal = hash_key(slot_key[j]) & mask;
      // can slot j's entry move into the hole at i?
      bool wraps = (ideal <= i) == (i <= j);
      if ((i < j) ? (ideal <= i || ideal > j) : (ideal <= i && ideal > j)) {
        slot_key[i] = slot_key[j];
        slot_row[i] = slot_row[j];
        slot_key[j] = kEmpty;
        i = j;
      }
      (void)wraps;
    }
  }

  void erase_row(uint32_t row) {
    // move last row into the hole
    uint32_t last = static_cast<uint32_t>(row_key.size() - 1);
    int64_t victim_key = row_key[row];
    size_t vslot = find(victim_key);
    if (vslot != SIZE_MAX) erase_slot(vslot);
    if (row != last) {
      std::memcpy(&rows[size_t(row) * dim], &rows[size_t(last) * dim],
                  sizeof(float) * dim);
      row_key[row] = row_key[last];
      last_used[row] = last_used[last];
      inserted_at[row] = inserted_at[last];
      size_t mslot = find(row_key[row]);
      if (mslot != SIZE_MAX) slot_row[mslot] = row;
    }
    rows.resize(size_t(last) * dim);
    row_key.pop_back();
    last_used.pop_back();
    inserted_at.pop_back();
    --count;
  }
};

struct Store {
  int dim;
  int num_partitions;
  uint64_t overflow_margin;
  int overflow_policy;  // 0 random, 1 least-used, 2 oldest
  double resolution_target;
  std::vector<Partition*> parts;

  ~Store() {
    for (auto* p : parts) delete p;
  }

  inline int part_of(int64_t key) const {
    return static_cast<int>((static_cast<uint64_t>(key) & 0x7fffffffULL) %
                            static_cast<uint64_t>(num_partitions));
  }

  void maybe_evict(Partition& p) const {
    uint64_t per_part = overflow_margin / num_partitions;
    if (per_part == 0) per_part = 1;
    if (p.count <= per_part) return;
    size_t target = static_cast<size_t>(per_part * resolution_target);
    std::mt19937_64 rng(p.tick);
    while (p.count > target && p.count > 0) {
      uint32_t victim = 0;
      size_t n = p.row_key.size();
      if (overflow_policy == 0) {
        victim = static_cast<uint32_t>(rng() % n);
      } else {
        const std::vector<uint64_t>& m =
            (overflow_policy == 1) ? p.last_used : p.inserted_at;
        uint64_t best = UINT64_MAX;
        for (size_t r = 0; r < n; ++r) {
          if (m[r] < best) { best = m[r]; victim = static_cast<uint32_t>(r); }
        }
      }
      p.erase_row(victim);
    }
  }
};

// simple bounded parallel-for over partitions
template <typename F>
void parallel_parts(int n, F&& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int workers = static_cast<int>(hw ? (hw < 16u ? hw : 16u) : 4u);
  if (workers > n) workers = n;
  if (workers <= 1) {
    for (int p = 0; p < n; ++p) fn(p);
    return;
  }
  std::atomic<int> next{0};
  std::vector<std::thread> ts;
  ts.reserve(workers);
  for (int w = 0; w < workers; ++w) {
    ts.emplace_back([&] {
      int p;
      while ((p = next.fetch_add(1)) < n) fn(p);
    });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

void* hps_kv_create(int dim, int num_partitions, uint64_t overflow_margin,
                    int overflow_policy, double resolution_target) {
  auto* s = new Store();
  s->dim = dim;
  s->num_partitions = num_partitions > 0 ? num_partitions : 1;
  s->overflow_margin = overflow_margin;
  s->overflow_policy = overflow_policy;
  s->resolution_target = resolution_target;
  s->parts.reserve(s->num_partitions);
  for (int i = 0; i < s->num_partitions; ++i) s->parts.push_back(new Partition(dim));
  return s;
}

void hps_kv_destroy(void* h) { delete static_cast<Store*>(h); }

// Upsert n pairs. keys [n], vectors [n*dim].
void hps_kv_insert(void* h, int64_t n, const int64_t* keys,
                   const float* vectors) {
  auto* s = static_cast<Store*>(h);
  // bucket indices by partition first (single pass)
  std::vector<std::vector<int64_t>> idx(s->num_partitions);
  for (int64_t i = 0; i < n; ++i) idx[s->part_of(keys[i])].push_back(i);
  parallel_parts(s->num_partitions, [&](int pi) {
    Partition& p = *s->parts[pi];
    if (idx[pi].empty()) return;
    std::unique_lock lock(p.mu);
    ++p.tick;
    for (int64_t i : idx[pi]) {
      int64_t key = keys[i];
      size_t slot = p.find(key);
      if (slot != SIZE_MAX) {
        uint32_t row = p.slot_row[slot];
        std::memcpy(&p.rows[size_t(row) * p.dim], vectors + i * s->dim,
                    sizeof(float) * p.dim);
        p.last_used[row] = p.tick;
      } else {
        uint32_t row = static_cast<uint32_t>(p.row_key.size());
        p.rows.insert(p.rows.end(), vectors + i * s->dim,
                      vectors + (i + 1) * s->dim);
        p.row_key.push_back(key);
        p.last_used.push_back(p.tick);
        p.inserted_at.push_back(p.tick);
        ++p.count;
        p.maybe_grow();
        p.place(key, row);
      }
    }
    s->maybe_evict(p);
  });
}

// Query n keys -> out [n*dim] (zero-filled for misses), found [n] (0/1).
void hps_kv_query(void* h, int64_t n, const int64_t* keys, float* out,
                  uint8_t* found) {
  auto* s = static_cast<Store*>(h);
  std::vector<std::vector<int64_t>> idx(s->num_partitions);
  for (int64_t i = 0; i < n; ++i) idx[s->part_of(keys[i])].push_back(i);
  parallel_parts(s->num_partitions, [&](int pi) {
    Partition& p = *s->parts[pi];
    if (idx[pi].empty()) return;
    std::shared_lock lock(p.mu);
    ++p.tick;  // benign race on tick under shared lock; ordering not load-bearing
    for (int64_t i : idx[pi]) {
      size_t slot = p.find(keys[i]);
      if (slot == SIZE_MAX) {
        std::memset(out + i * s->dim, 0, sizeof(float) * s->dim);
        found[i] = 0;
      } else {
        uint32_t row = p.slot_row[slot];
        std::memcpy(out + i * s->dim, &p.rows[size_t(row) * p.dim],
                    sizeof(float) * p.dim);
        p.last_used[row] = p.tick;
        found[i] = 1;
      }
    }
  });
}

int64_t hps_kv_evict(void* h, int64_t n, const int64_t* keys) {
  auto* s = static_cast<Store*>(h);
  std::vector<std::vector<int64_t>> idx(s->num_partitions);
  for (int64_t i = 0; i < n; ++i) idx[s->part_of(keys[i])].push_back(i);
  std::atomic<int64_t> evicted{0};
  parallel_parts(s->num_partitions, [&](int pi) {
    Partition& p = *s->parts[pi];
    if (idx[pi].empty()) return;
    std::unique_lock lock(p.mu);
    for (int64_t i : idx[pi]) {
      size_t slot = p.find(keys[i]);
      if (slot != SIZE_MAX) {
        p.erase_row(p.slot_row[slot]);
        evicted.fetch_add(1);
      }
    }
  });
  return evicted.load();
}

int64_t hps_kv_size(void* h) {
  auto* s = static_cast<Store*>(h);
  int64_t total = 0;
  for (auto* p : s->parts) {
    std::shared_lock lock(p->mu);
    total += static_cast<int64_t>(p->count);
  }
  return total;
}

// Caller allocates out_keys with hps_kv_size entries. Returns count written.
int64_t hps_kv_keys(void* h, int64_t* out_keys, int64_t cap) {
  auto* s = static_cast<Store*>(h);
  int64_t w = 0;
  for (auto* p : s->parts) {
    std::shared_lock lock(p->mu);
    for (int64_t k : p->row_key) {
      if (w >= cap) return w;
      out_keys[w++] = k;
    }
  }
  return w;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// SlotMap: fixed-capacity key -> slot index with LRU eviction.
//
// Host-side index for the DYNAMIC HBM embedding cache (the reference's
// dynamic GPU cache maintains exactly this mapping device-side in CUDA,
// reference backend.cpp:483-491 cache types; here the host owns the index
// and the device stores rows at stable slot ids). `acquire` implements the
// insert path: present keys return their slot; new keys take a free slot or
// evict the least-recently-used one.
// ---------------------------------------------------------------------------

namespace {

struct SlotMap {
  int64_t capacity;
  std::vector<int64_t> slot_key;   // hash table: probe slot -> key
  std::vector<uint32_t> slot_val;  // probe slot -> cache slot id
  size_t mask = 0;
  std::vector<int64_t> cache_key;  // cache slot id -> key (kEmpty if free)
  std::vector<uint64_t> last_used; // cache slot id -> tick
  std::vector<uint32_t> free_list;
  uint64_t tick = 0;
  std::mutex mu;

  explicit SlotMap(int64_t cap) : capacity(cap) {
    size_t hcap = 1024;
    while (hcap * 3 < static_cast<size_t>(cap) * 5) hcap *= 2;  // load <= 0.6
    slot_key.assign(hcap, kEmpty);
    slot_val.assign(hcap, 0);
    mask = hcap - 1;
    cache_key.assign(cap, kEmpty);
    last_used.assign(cap, 0);
    free_list.reserve(cap);
    for (int64_t i = cap - 1; i >= 0; --i)
      free_list.push_back(static_cast<uint32_t>(i));
  }

  inline size_t find(int64_t key) const {
    size_t i = Partition::hash_key(key) & mask;
    while (true) {
      if (slot_key[i] == key) return i;
      if (slot_key[i] == kEmpty) return SIZE_MAX;
      i = (i + 1) & mask;
    }
  }

  inline void place(int64_t key, uint32_t val) {
    size_t i = Partition::hash_key(key) & mask;
    while (slot_key[i] != kEmpty) i = (i + 1) & mask;
    slot_key[i] = key;
    slot_val[i] = val;
  }

  void erase_probe(size_t i) {
    slot_key[i] = kEmpty;
    size_t j = i;
    while (true) {
      j = (j + 1) & mask;
      if (slot_key[j] == kEmpty) break;
      size_t ideal = Partition::hash_key(slot_key[j]) & mask;
      if ((i < j) ? (ideal <= i || ideal > j) : (ideal <= i && ideal > j)) {
        slot_key[i] = slot_key[j];
        slot_val[i] = slot_val[j];
        slot_key[j] = kEmpty;
        i = j;
      }
    }
  }

  uint32_t evict_lru() {
    uint64_t best = UINT64_MAX;
    uint32_t victim = 0;
    for (int64_t s = 0; s < capacity; ++s) {
      if (cache_key[s] != kEmpty && last_used[s] < best) {
        best = last_used[s];
        victim = static_cast<uint32_t>(s);
      }
    }
    return victim;
  }
};

}  // namespace

extern "C" {

void* hps_slotmap_create(int64_t capacity) { return new SlotMap(capacity); }
void hps_slotmap_destroy(void* h) { delete static_cast<SlotMap*>(h); }

// Translate n keys -> cache slots; missing keys get `miss_slot`. touch=1
// refreshes LRU ticks for hits.
void hps_slotmap_translate(void* h, int64_t n, const int64_t* keys,
                           int32_t* out_slots, int32_t miss_slot, int touch) {
  auto* m = static_cast<SlotMap*>(h);
  std::lock_guard<std::mutex> lock(m->mu);
  ++m->tick;
  for (int64_t i = 0; i < n; ++i) {
    size_t p = m->find(keys[i]);
    if (p == SIZE_MAX) {
      out_slots[i] = miss_slot;
    } else {
      uint32_t s = m->slot_val[p];
      out_slots[i] = static_cast<int32_t>(s);
      if (touch) m->last_used[s] = m->tick;
    }
  }
}

// Acquire slots for n keys (insert path). Existing keys keep their slot; new
// keys take a free slot or evict the LRU entry. out_slots[n]; out_evicted[n]
// receives the evicted key per insert (kEmpty/INT64_MIN if none). Returns the
// number of NEW insertions.
int64_t hps_slotmap_acquire(void* h, int64_t n, const int64_t* keys,
                            int32_t* out_slots, int64_t* out_evicted) {
  auto* m = static_cast<SlotMap*>(h);
  std::lock_guard<std::mutex> lock(m->mu);
  ++m->tick;
  int64_t inserted = 0;
  for (int64_t i = 0; i < n; ++i) {
    out_evicted[i] = kEmpty;
    size_t p = m->find(keys[i]);
    if (p != SIZE_MAX) {
      uint32_t s = m->slot_val[p];
      m->last_used[s] = m->tick;
      out_slots[i] = static_cast<int32_t>(s);
      continue;
    }
    uint32_t s;
    if (!m->free_list.empty()) {
      s = m->free_list.back();
      m->free_list.pop_back();
    } else {
      s = m->evict_lru();
      out_evicted[i] = m->cache_key[s];
      size_t vp = m->find(m->cache_key[s]);
      if (vp != SIZE_MAX) m->erase_probe(vp);
    }
    m->cache_key[s] = keys[i];
    m->last_used[s] = m->tick;
    m->place(keys[i], s);
    out_slots[i] = static_cast<int32_t>(s);
    ++inserted;
  }
  return inserted;
}

int64_t hps_slotmap_size(void* h) {
  auto* m = static_cast<SlotMap*>(h);
  std::lock_guard<std::mutex> lock(m->mu);
  return m->capacity - static_cast<int64_t>(m->free_list.size());
}

// Dump resident keys + their slots; returns count written.
int64_t hps_slotmap_keys(void* h, int64_t* out_keys, int32_t* out_slots,
                         int64_t cap) {
  auto* m = static_cast<SlotMap*>(h);
  std::lock_guard<std::mutex> lock(m->mu);
  int64_t w = 0;
  for (int64_t s = 0; s < m->capacity && w < cap; ++s) {
    if (m->cache_key[s] != kEmpty) {
      out_keys[w] = m->cache_key[s];
      out_slots[w] = static_cast<int32_t>(s);
      ++w;
    }
  }
  return w;
}

}  // extern "C"
