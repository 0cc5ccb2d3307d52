// Native bit-plane packer: lock-free COO genotype scatter.
//
// The runtime twin of the reference's ingest scatter loop
// (cuking.cu:675-703 + AtomicClearBit at 316-323), redesigned for the
// TPU engine's [2, N, W] uint32 plane layout (see cuking_tpu/ops/bitset.py):
// for every (sample, site, n_alt_alleles) entry, atomically clear
//   - the het bit and the hom bit  when n_alt == 0 (hom-ref)
//   - the hom bit                  when n_alt == 1 (het)
//   - the het bit                  when n_alt == 2 (hom-var)
// Relaxed ordering is sufficient: writers only clear independent bits.
// Any other n_alt value is reported back as a hard error (the caller
// raises FailedPrecondition, mirroring cuking.cu:698-701).
//
// Exposed as a C ABI for ctypes; multithreaded over entry ranges.

#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline void atomic_clear(uint32_t* word, uint32_t mask) {
  std::atomic_ref<uint32_t> ref(*word);
  ref.fetch_and(~mask, std::memory_order_relaxed);
}

}  // namespace

extern "C" {

// Returns -1 on success, otherwise the index of the first offending entry
// (invalid n_alt or out-of-range word index).
long long cuking_clear_bits(
    uint32_t* het_plane, uint32_t* hom_plane, long long plane_words,
    const int64_t* lin_word,  // sample_offset * W + (site % W), per entry
    const uint32_t* bit,      // site / W, per entry (< 32)
    const int32_t* n_alt,     // 0 / 1 / 2, per entry
    long long n, int num_threads) {
  if (n <= 0) return -1;
  if (num_threads < 1) num_threads = 1;
  std::atomic<long long> first_bad(-1);

  auto worker = [&](long long begin, long long end) {
    for (long long k = begin; k < end; ++k) {
      const int64_t w = lin_word[k];
      const int32_t v = n_alt[k];
      if (v < 0 || v > 2 || w < 0 || w >= plane_words || bit[k] > 31) {
        long long expected = -1;
        // Keep the smallest offending index for a deterministic error.
        long long cur = first_bad.load(std::memory_order_relaxed);
        while ((cur == -1 || k < cur) &&
               !first_bad.compare_exchange_weak(cur, k,
                                                std::memory_order_relaxed)) {
        }
        (void)expected;
        return;
      }
      const uint32_t mask = 1u << bit[k];
      if (v != 1) atomic_clear(het_plane + w, mask);  // hom-ref or hom-var
      if (v != 2) atomic_clear(hom_plane + w, mask);  // hom-ref or het
    }
  };

  if (num_threads == 1 || n < (1 << 16)) {
    worker(0, n);
  } else {
    std::vector<std::thread> threads;
    const long long chunk = (n + num_threads - 1) / num_threads;
    threads.reserve(num_threads);
    for (int t = 0; t < num_threads; ++t) {
      const long long begin = t * chunk;
      const long long end = begin + chunk < n ? begin + chunk : n;
      if (begin >= end) break;
      threads.emplace_back(worker, begin, end);
    }
    for (auto& th : threads) th.join();
  }
  return first_bad.load(std::memory_order_relaxed);
}

// Build stamp so Python can verify ABI compatibility.
int cuking_packer_abi_version() { return 1; }

}  // extern "C"
