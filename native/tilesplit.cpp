// Multithreaded f32 -> lane-packed bf16 hi|lo split.
//
// The windowed format's 3-pass f32 Pallas kernel consumes tiles as ONE
// bf16 array with hi planes in columns [:C] and the f32-residual lo
// planes in [C:] (formats/windowed.py::_split_planes). ml_dtypes'
// single-threaded astype took ~9 s of the 24 s cop20k format build;
// this routine runs the same round-to-nearest-even conversion at
// memory bandwidth across threads.
//
// C ABI, bound with ctypes (no pybind11 in this environment) — the
// same pattern as native/mmio.cpp (the reference's only native
// component is its loader, Source Code/utils.cpp:70-185; this
// framework extends the native layer to its own build-time hot spots).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Round-to-nearest-even f32 -> bf16, matching ml_dtypes/XLA semantics
// for normal/subnormal values. NaN is canonicalized (quiet bit set) so
// a NaN never rounds into an infinity.
static inline uint16_t bf16_rne(float f) {
    uint32_t u;
    std::memcpy(&u, &f, sizeof(u));
    if ((u & 0x7fffffffu) > 0x7f800000u) {  // NaN
        return static_cast<uint16_t>((u >> 16) | 0x0040u);
    }
    uint32_t rounding_bias = 0x7fffu + ((u >> 16) & 1u);
    return static_cast<uint16_t>((u + rounding_bias) >> 16);
}

static inline float bf16_to_f32(uint16_t h) {
    uint32_t u = static_cast<uint32_t>(h) << 16;
    float f;
    std::memcpy(&f, &u, sizeof(f));
    return f;
}

}  // namespace

extern "C" {

// src: (rows, cols) f32, C-contiguous. dst: (rows, 2*cols) bf16 (as
// uint16), C-contiguous: dst[r, :cols] = hi(src[r]), dst[r, cols:] =
// bf16(src[r] - f32(hi)). Any leading dims fold into `rows`.
void split_bf16_hilo(const float* src, uint16_t* dst, int64_t rows,
                     int64_t cols, int32_t n_threads) {
    if (n_threads <= 0) {
        n_threads = static_cast<int32_t>(
            std::thread::hardware_concurrency());
        if (n_threads <= 0) n_threads = 1;
    }
    if (static_cast<int64_t>(n_threads) > rows) {
        n_threads = rows > 0 ? static_cast<int32_t>(rows) : 1;
    }
    auto work = [&](int64_t r0, int64_t r1) {
        for (int64_t r = r0; r < r1; ++r) {
            const float* s = src + r * cols;
            uint16_t* hi = dst + r * 2 * cols;
            uint16_t* lo = hi + cols;
            for (int64_t c = 0; c < cols; ++c) {
                uint16_t h = bf16_rne(s[c]);
                hi[c] = h;
                lo[c] = bf16_rne(s[c] - bf16_to_f32(h));
            }
        }
    };
    if (n_threads == 1) {
        work(0, rows);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (rows + n_threads - 1) / n_threads;
    for (int32_t t = 0; t < n_threads; ++t) {
        int64_t r0 = t * chunk;
        int64_t r1 = r0 + chunk < rows ? r0 + chunk : rows;
        if (r0 >= r1) break;
        ts.emplace_back(work, r0, r1);
    }
    for (auto& th : ts) th.join();
}

}  // extern "C"
