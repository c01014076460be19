// C ABI for the host runtime (consumed by libhpc_tpu/runtime/native.py via
// ctypes — the pybind11-free binding layer).
//
// Exposes: arena pool, thread pool + parallel_for, MatrixMarket→CSR loader,
// host-side Morton encode, and a concurrency self-test that stress-tests the
// MPMC queue / pool / hierarchical lock in-process (the reference runs its
// concurrency stress suites under ASan, SURVEY.md §4.3; here the same
// push/pop-tally assertions run inside hpc_native_selftest).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include "../include/hazard_stack.hpp"
#include "../include/hier_lock.hpp"
#include "../include/linklist.hpp"
#include "../include/lockfree_stack.hpp"
#include "../include/mempool.hpp"
#include "../include/mpmc_queue.hpp"
#include "../include/mtx.hpp"
#include "../include/threadpool.hpp"
#include "../include/uqueue.hpp"

using namespace hpc_host;

extern "C" {

// ---- arena pool -----------------------------------------------------------

void* hpc_pool_create(std::size_t page_size) {
  try {
    return new ArenaPool(page_size);
  } catch (...) {
    return nullptr;
  }
}
void* hpc_pool_alloc(void* pool, std::size_t size) {
  try {
    return static_cast<ArenaPool*>(pool)->alloc(size);
  } catch (...) {
    return nullptr;
  }
}
int hpc_pool_free_large(void* pool, void* p) {
  return static_cast<ArenaPool*>(pool)->free_large(p) ? 1 : 0;
}
void hpc_pool_reset(void* pool) { static_cast<ArenaPool*>(pool)->reset(); }
void hpc_pool_destroy(void* pool) { delete static_cast<ArenaPool*>(pool); }
std::size_t hpc_pool_bytes_reserved(void* pool) {
  return static_cast<ArenaPool*>(pool)->bytes_reserved();
}
std::size_t hpc_pool_n_pages(void* pool) {
  return static_cast<ArenaPool*>(pool)->n_pages();
}

// ---- thread pool ----------------------------------------------------------

void* hpc_threadpool_create(int n_threads) {
  try {
    return new ThreadPool(n_threads);
  } catch (...) {
    return nullptr;
  }
}
int hpc_threadpool_size(void* tp) {
  return static_cast<ThreadPool*>(tp)->size();
}
void hpc_threadpool_destroy(void* tp) { delete static_cast<ThreadPool*>(tp); }

typedef void (*hpc_range_fn)(std::int64_t begin, std::int64_t end, void* ctx);

void hpc_parallel_for(void* tp, std::int64_t n, hpc_range_fn fn, void* ctx,
                      std::int64_t min_chunk) {
  static_cast<ThreadPool*>(tp)->parallel_for(
      n, [fn, ctx](std::int64_t b, std::int64_t e) { fn(b, e, ctx); },
      min_chunk > 0 ? min_chunk : 1024);
}

// ---- MatrixMarket loader --------------------------------------------------

struct MtxHandle {
  MtxData meta;
  ThreadPool pool;
  std::vector<std::int32_t> rows, cols;
  std::vector<float> vals;
  bool parsed = false;

  explicit MtxHandle(int nt) : pool(nt) {}
};

void* hpc_mtx_open(const char* path, int n_threads) {
  try {
    auto* h = new MtxHandle(n_threads);
    h->meta = mtx_open(path);
    mtx_parse_triplets(h->meta, h->pool, h->rows, h->cols, h->vals);
    h->parsed = true;
    return h;
  } catch (...) {
    return nullptr;
  }
}
std::int64_t hpc_mtx_rows(void* h) {
  return static_cast<MtxHandle*>(h)->meta.rows;
}
std::int64_t hpc_mtx_cols(void* h) {
  return static_cast<MtxHandle*>(h)->meta.cols;
}
std::int64_t hpc_mtx_nnz(void* h) {
  return (std::int64_t)static_cast<MtxHandle*>(h)->rows.size();
}
// fill caller-allocated CSR buffers (indptr: rows+1, indices/data: nnz)
int hpc_mtx_fill_csr(void* hv, std::int32_t* indptr, std::int32_t* indices,
                     float* data) {
  try {
    auto* h = static_cast<MtxHandle*>(hv);
    triplets_to_csr(h->pool, h->meta.rows, h->rows, h->cols, h->vals, indptr,
                    indices, data);
    return 0;
  } catch (...) {
    return -1;
  }
}
void hpc_mtx_close(void* h) { delete static_cast<MtxHandle*>(h); }

// ---- host-side Morton (libmorton replacement for setup paths) -------------

void hpc_morton2d_encode(const std::uint32_t* x, const std::uint32_t* y,
                         std::uint32_t* out, std::int64_t n) {
  auto part = [](std::uint32_t v) {
    v &= 0xFFFF;
    v = (v | (v << 8)) & 0x00FF00FF;
    v = (v | (v << 4)) & 0x0F0F0F0F;
    v = (v | (v << 2)) & 0x33333333;
    v = (v | (v << 1)) & 0x55555555;
    return v;
  };
  for (std::int64_t i = 0; i < n; ++i)
    out[i] = part(x[i]) | (part(y[i]) << 1);
}

// ---- concurrency self-test ------------------------------------------------
// MPMC queue: P producers × C consumers over N items, tally must match —
// the reference's stress pattern (test_queue_lockfree_multithread_*.cc).

static int selftest_queue(int producers, int consumers, int n_items) {
  MpmcQueue<int> q(4096);
  std::atomic<long long> pushed{0}, popped{0}, sum_in{0}, sum_out{0};
  std::atomic<bool> done{false};
  std::vector<std::thread> ts;
  for (int p = 0; p < producers; ++p) {
    ts.emplace_back([&, p] {
      for (int i = p; i < n_items; i += producers) {
        while (!q.try_push(i)) std::this_thread::yield();
        pushed.fetch_add(1);
        sum_in.fetch_add(i);
      }
    });
  }
  for (int c = 0; c < consumers; ++c) {
    ts.emplace_back([&] {
      while (true) {
        if (auto v = q.try_pop()) {
          popped.fetch_add(1);
          sum_out.fetch_add(*v);
        } else if (done.load() && q.empty() &&
                   popped.load() >= pushed.load()) {
          return;
        } else {
          std::this_thread::yield();
        }
      }
    });
  }
  for (int p = 0; p < producers; ++p) ts[p].join();
  done.store(true);
  for (int c = 0; c < consumers; ++c) ts[producers + c].join();
  if (pushed.load() != n_items || popped.load() != n_items) return 1;
  if (sum_in.load() != sum_out.load()) return 2;
  if (!q.empty()) return 3;
  return 0;
}

static int selftest_pool() {
  ArenaPool pool(4096);
  // small allocs bump-allocated and aligned
  for (int i = 0; i < 1000; ++i) {
    void* p = pool.alloc(24);
    if (!p || ((std::uintptr_t)p & 15)) return 10;
    std::memset(p, 0xAB, 24);
  }
  // large alloc + early free
  void* big = pool.alloc(1 << 20);
  if (!big) return 11;
  if (!pool.free_large(big)) return 12;
  // cleanup handlers run LIFO on reset
  int order = 0, first = 0, second = 0;
  pool.add_cleanup([&] { first = ++order; });
  pool.add_cleanup([&] { second = ++order; });
  pool.reset();
  if (second != 1 || first != 2) return 13;
  return 0;
}

static int selftest_hier_lock() {
  HierarchicalMutex hi(1000), lo(10);
  // descending order OK
  try {
    hi.lock();
    lo.lock();
    lo.unlock();
    hi.unlock();
  } catch (...) {
    return 20;
  }
  // ascending order must throw
  try {
    lo.lock();
    bool threw = false;
    try {
      hi.lock();
    } catch (const std::logic_error&) {
      threw = true;
    }
    lo.unlock();
    if (!threw) return 21;
  } catch (...) {
    return 22;
  }
  return 0;
}

static int selftest_threadpool() {
  ThreadPool tp(4);
  std::atomic<long long> sum{0};
  tp.parallel_for(100000, [&](std::int64_t b, std::int64_t e) {
    long long local = 0;
    for (std::int64_t i = b; i < e; ++i) local += i;
    sum.fetch_add(local);
  });
  long long expect = 100000LL * 99999LL / 2;
  return sum.load() == expect ? 0 : 30;
}

// Lock-free stack stress: P pushers × C poppers, sum tally — the
// reference's hazard/ref-count stack tests (tests/test_stack_lockfree/).
static int selftest_stack(int producers, int consumers, int n_items) {
  LockFreeStack<int> st;
  std::atomic<long long> pushed{0}, popped{0}, sum_in{0}, sum_out{0};
  std::atomic<bool> done{false};
  std::vector<std::thread> ts;
  for (int p = 0; p < producers; ++p) {
    ts.emplace_back([&, p] {
      for (int i = p; i < n_items; i += producers) {
        st.push(i);
        pushed.fetch_add(1);
        sum_in.fetch_add(i);
      }
    });
  }
  for (int c = 0; c < consumers; ++c) {
    ts.emplace_back([&] {
      while (true) {
        if (auto v = st.pop()) {
          popped.fetch_add(1);
          sum_out.fetch_add(*v);
        } else if (done.load() && popped.load() >= pushed.load()) {
          return;
        } else {
          std::this_thread::yield();
        }
      }
    });
  }
  for (int p = 0; p < producers; ++p) ts[p].join();
  done.store(true);
  for (int c = 0; c < consumers; ++c) ts[producers + c].join();
  if (pushed.load() != n_items || popped.load() != n_items) return 40;
  if (sum_in.load() != sum_out.load()) return 41;
  if (!st.empty()) return 42;
  return 0;
}

// Hand-over-hand list: concurrent inserts + removals + nonexistent removes
// (the reference's test_linklist_lk patterns).
static int selftest_linklist() {
  LinkedList<int> list;
  std::vector<std::thread> ts;
  for (int t = 0; t < 4; ++t) {
    ts.emplace_back([&, t] {
      for (int i = t; i < 4000; i += 4) list.push_front(i);
    });
  }
  for (auto& th : ts) th.join();
  if (list.size() != 4000) return 50;
  std::atomic<long long> removed{0};
  ts.clear();
  for (int t = 0; t < 2; ++t) {
    ts.emplace_back([&, t] {
      removed.fetch_add(
          (long long)list.remove_if([&, t](int v) { return v % 2 == t; }));
    });
  }
  ts.emplace_back([&] {
    // concurrent remove of nonexistent values must find nothing
    if (list.remove_if([](int v) { return v >= 4000; })) removed.fetch_add(1 << 20);
  });
  for (auto& th : ts) th.join();
  if (removed.load() != 4000) return 51;
  if (list.size() != 0) return 52;
  if (list.find_first_if([](int) { return true; })) return 53;
  return 0;
}

// Hazard-pointer stack stress (same tally pattern; reclamation correctness
// is what ASan/LSan checks here — UAF on a bad protect, leak on a bad scan).
static int selftest_hazard_stack(int producers, int consumers, int n_items) {
  HazardStack<int> st;
  std::atomic<long long> pushed{0}, popped{0}, sum_in{0}, sum_out{0};
  std::atomic<bool> done{false};
  std::vector<std::thread> ts;
  for (int p = 0; p < producers; ++p) {
    ts.emplace_back([&, p] {
      for (int i = p; i < n_items; i += producers) {
        st.push(i);
        pushed.fetch_add(1);
        sum_in.fetch_add(i);
      }
    });
  }
  for (int c = 0; c < consumers; ++c) {
    ts.emplace_back([&] {
      while (true) {
        if (auto v = st.pop()) {
          popped.fetch_add(1);
          sum_out.fetch_add(*v);
        } else if (done.load() && popped.load() >= pushed.load()) {
          return;
        } else {
          std::this_thread::yield();
        }
      }
    });
  }
  for (int p = 0; p < producers; ++p) ts[p].join();
  done.store(true);
  for (int c = 0; c < consumers; ++c) ts[producers + c].join();
  if (pushed.load() != n_items || popped.load() != n_items) return 60;
  if (sum_in.load() != sum_out.load()) return 61;
  if (!st.empty()) return 62;
  return 0;
}

// Unbounded MPMC queue: tally stress + an unboundedness proof (1M pushes
// with no consumer — the bounded ring would deadlock the producer here).
static int selftest_uqueue(int producers, int consumers, int n_items) {
  UnboundedQueue<int> q;
  std::atomic<long long> pushed{0}, popped{0}, sum_in{0}, sum_out{0};
  std::atomic<bool> done{false};
  std::vector<std::thread> ts;
  for (int p = 0; p < producers; ++p) {
    ts.emplace_back([&, p] {
      for (int i = p; i < n_items; i += producers) {
        q.push(i);
        pushed.fetch_add(1);
        sum_in.fetch_add(i);
      }
    });
  }
  for (int c = 0; c < consumers; ++c) {
    ts.emplace_back([&] {
      while (true) {
        if (auto v = q.try_pop()) {
          popped.fetch_add(1);
          sum_out.fetch_add(*v);
        } else if (done.load() && popped.load() >= pushed.load()) {
          return;
        } else {
          std::this_thread::yield();
        }
      }
    });
  }
  for (int p = 0; p < producers; ++p) ts[p].join();
  done.store(true);
  for (int c = 0; c < consumers; ++c) ts[producers + c].join();
  if (pushed.load() != n_items || popped.load() != n_items) return 70;
  if (sum_in.load() != sum_out.load()) return 71;
  if (!q.empty()) return 72;
  return 0;
}

static int selftest_uqueue_unbounded_growth() {
  UnboundedQueue<int> q;
  const int n = 1 << 20;
  for (int i = 0; i < n; ++i) q.push(i);  // no consumer: must not block
  long long sum = 0;
  int count = 0;
  while (auto v = q.try_pop()) {
    sum += *v;
    ++count;
  }
  if (count != n) return 75;
  if (sum != (long long)n * (n - 1) / 2) return 76;
  return 0;
}

int hpc_native_selftest() {
  int rc;
  if ((rc = selftest_queue(1, 1, 200000))) return rc;
  if ((rc = selftest_queue(2, 4, 200000))) return rc;
  if ((rc = selftest_queue(3, 2, 200000))) return rc;
  if ((rc = selftest_pool())) return rc;
  if ((rc = selftest_hier_lock())) return rc;
  if ((rc = selftest_threadpool())) return rc;
  if ((rc = selftest_stack(1, 1, 100000))) return rc;
  if ((rc = selftest_stack(3, 2, 100000))) return rc;
  if ((rc = selftest_hazard_stack(1, 1, 100000))) return rc;
  if ((rc = selftest_hazard_stack(3, 2, 100000))) return rc;
  if ((rc = selftest_hazard_stack(2, 4, 100000))) return rc;
  if ((rc = selftest_uqueue(1, 1, 200000))) return rc;
  if ((rc = selftest_uqueue(2, 4, 200000))) return rc;
  if ((rc = selftest_uqueue(3, 2, 200000))) return rc;
  if ((rc = selftest_uqueue_unbounded_growth())) return rc;
  if ((rc = selftest_linklist())) return rc;
  return 0;
}

}  // extern "C"

// ---- counter-cost microbenchmark (reference: test_hpc_benchmark.cpp
// :1067-1126 — mutex vs atomic vs unsynchronized increment costs) ---------
#include <chrono>
#include <mutex>

extern "C" double hpc_bench_counter(int kind, int threads, int iters) {
  // kind: 0 = unsynchronized (per-thread), 1 = std::atomic fetch_add,
  //       2 = mutex-guarded, 3 = CAS loop
  static std::atomic<long long> atomic_ctr{0};
  static long long plain_ctr = 0;
  static std::mutex mtx;
  atomic_ctr.store(0);
  plain_ctr = 0;
  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> ts;
  for (int t = 0; t < threads; ++t) {
    ts.emplace_back([&, t] {
      long long local = 0;
      for (int i = 0; i < iters; ++i) {
        switch (kind) {
          case 0: local += 1; break;
          case 1: atomic_ctr.fetch_add(1, std::memory_order_relaxed); break;
          case 2: { std::lock_guard<std::mutex> g(mtx); ++plain_ctr; } break;
          case 3: {
            long long cur = atomic_ctr.load(std::memory_order_relaxed);
            while (!atomic_ctr.compare_exchange_weak(
                cur, cur + 1, std::memory_order_relaxed)) {
            }
            break;
          }
        }
      }
      if (kind == 0) atomic_ctr.fetch_add(local);
    });
  }
  for (auto& th : ts) th.join();
  auto t1 = std::chrono::steady_clock::now();
  double ns = std::chrono::duration<double, std::nano>(t1 - t0).count();
  return ns / ((double)threads * iters);
}
