// Native host-side IO hot paths for the observation feed.
//
// The reference ships every observation through habitat VectorEnv's
// pickled pipes (habitat-lab vector_env worker loop; SURVEY.md §3.1
// process crossing (a)) — serialize + pipe write + read + deserialize is
// 3-4 full passes over ~5 MB/env/step. The TPU build moves observation
// arrays through shared memory (etpnav_tpu/env/shm_transport.py); this
// library provides the parent-side gather that assembles per-worker shm
// views into the contiguous host batch the device feed consumes.
//
// gather_copy: copy n source buffers to consecutive segments of dst,
// fanned out over worker threads. A single-threaded memcpy tops out at
// ~5-10 GB/s on one core; the observation batch for 16 envs x 12 views
// is ~80 MB, so parallel memcpy is the difference between ~10 ms and
// ~2 ms of host time per rollout step on a multi-core host.
//
// Build: make -C native (libio_core.so). Loaded via ctypes
// (etpnav_tpu/native.py); numpy fallbacks exist.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Copy srcs[i] (sizes[i] bytes each) into dst at consecutive offsets
// (dst must hold sum(sizes)). nthreads <= 0 means hardware_concurrency.
void gather_copy(const void** srcs, const int64_t* sizes, void* dst,
                 int64_t n, int32_t nthreads) {
    std::vector<int64_t> offs(n);
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) {
        offs[i] = total;
        total += sizes[i];
    }
    int32_t hw = (int32_t)std::thread::hardware_concurrency();
    if (nthreads <= 0) nthreads = hw > 0 ? hw : 1;
    nthreads = std::min<int64_t>(nthreads, n);
    // below ~8 MB thread spawn overhead beats the parallel win
    if (nthreads <= 1 || total < (8 << 20)) {
        for (int64_t i = 0; i < n; ++i)
            std::memcpy((char*)dst + offs[i], srcs[i], (size_t)sizes[i]);
        return;
    }
    std::vector<std::thread> pool;
    pool.reserve(nthreads);
    for (int32_t t = 0; t < nthreads; ++t) {
        pool.emplace_back([&, t]() {
            for (int64_t i = t; i < n; i += nthreads)
                std::memcpy((char*)dst + offs[i], srcs[i],
                            (size_t)sizes[i]);
        });
    }
    for (auto& th : pool) th.join();
}

}  // extern "C"
