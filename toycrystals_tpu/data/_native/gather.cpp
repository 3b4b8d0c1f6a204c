// Parallel row gather for host-resident u8 archives (the hot host-side op
// of the streaming input pipeline, data/stream.py). The reference delegates
// this work to torch's C++ DataLoader workers
// (`/root/reference/scripts/train_vae.py:262-269`); numpy fancy indexing is
// the Python fallback but runs single-threaded, so shuffled batch assembly
// from multi-GiB archives is capped at one core's memcpy bandwidth. This
// kernel splits the row list over std::threads (each row is one memcpy) —
// bytes-typed, so any row dtype works.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread (see data/native_gather.py,
// which compiles on first use and caches the .so by source hash).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// dst[i] = src[idx[i]] for n_idx rows of item_bytes each.
// Returns 0 on success, -1 if any index falls outside [0, n_src).
// n_threads <= 0 selects automatically (1 thread per ~8 MiB of output,
// capped at hardware_concurrency).
int gather_rows(const uint8_t* src, int64_t n_src, const int64_t* idx,
                int64_t n_idx, uint8_t* dst, int64_t item_bytes,
                int n_threads) {
  if (n_idx <= 0 || item_bytes <= 0) return 0;
  for (int64_t i = 0; i < n_idx; ++i) {
    if (idx[i] < 0 || idx[i] >= n_src) return -1;
  }

  if (n_threads <= 0) {
    const int64_t total = n_idx * item_bytes;
    const int64_t by_bytes = total / (8 << 20) + 1;
    int hw = static_cast<int>(std::thread::hardware_concurrency());
    if (hw <= 0) hw = 1;
    n_threads = static_cast<int>(by_bytes < hw ? by_bytes : hw);
  }
  if (static_cast<int64_t>(n_threads) > n_idx) {
    n_threads = static_cast<int>(n_idx);
  }

  auto run = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(dst + i * item_bytes, src + idx[i] * item_bytes,
                  static_cast<size_t>(item_bytes));
    }
  };

  if (n_threads <= 1) {
    run(0, n_idx);
    return 0;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads - 1);
  const int64_t per = (n_idx + n_threads - 1) / n_threads;
  for (int t = 1; t < n_threads; ++t) {
    const int64_t lo = t * per;
    const int64_t hi = (lo + per < n_idx) ? lo + per : n_idx;
    if (lo >= hi) break;
    pool.emplace_back(run, lo, hi);
  }
  run(0, per < n_idx ? per : n_idx);
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
