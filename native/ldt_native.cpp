// ldt_native — native runtime kernels for the loader/IO path.
//
// The reference's native code is all third-party wheels (stable_fast,
// xformers); its first-party runtime is pure Python. Here the host-side
// runtime work that sits between disk and the TPU — bf16->f32 widening of
// safetensors payloads, GGUF Q8_0 block dequantization, and mask feathering
// for the tiled pipelines — runs as C++ kernels (ctypes-bound, built once
// with g++ -O3; pure-numpy fallbacks keep the framework dependency-free).
//
// All functions are plain C ABI over caller-owned buffers: no Python API,
// no allocation, trivially thread-safe.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Cache-blocked transpose worker: in (rows, cols) -> out (cols, rows),
// elements of size es bytes, covering output rows [c0, c1).
template <typename T>
void transpose_cols(const T* in, T* out, int64_t rows, int64_t cols,
                    int64_t c0, int64_t c1) {
    const int64_t B = 128;  // ~16 KB tiles for int8: L1-resident both ways
    for (int64_t cb = c0; cb < c1; cb += B) {
        const int64_t ce = std::min(cb + B, c1);
        for (int64_t rb = 0; rb < rows; rb += B) {
            const int64_t re = std::min(rb + B, rows);
            for (int64_t c = cb; c < ce; ++c) {
                T* orow = out + c * rows;
                for (int64_t r = rb; r < re; ++r) {
                    orow[r] = in[r * cols + c];
                }
            }
        }
    }
}

template <typename T>
void transpose_threaded(const void* in_v, void* out_v, int64_t rows,
                        int64_t cols, int64_t n_threads) {
    const T* in = static_cast<const T*>(in_v);
    T* out = static_cast<T*>(out_v);
    if (n_threads <= 1 || cols < 512) {
        transpose_cols(in, out, rows, cols, 0, cols);
        return;
    }
    std::vector<std::thread> ts;
    const int64_t per = (cols + n_threads - 1) / n_threads;
    for (int64_t t = 0; t < n_threads; ++t) {
        const int64_t c0 = t * per;
        const int64_t c1 = std::min(c0 + per, cols);
        if (c0 >= c1) break;
        ts.emplace_back(transpose_cols<T>, in, out, rows, cols, c0, c1);
    }
    for (auto& th : ts) th.join();
}

}  // namespace

extern "C" {

// 2-D transpose for the GGUF -> device fused-layout path (12 GB of int8
// codes per Flux checkpoint): numpy's strided `.T` copy is single-thread
// byte gathers; blocked + threaded this runs at memory bandwidth.
// elem_size selects the specialization (1/2/4/8 bytes).
void ldt_transpose_2d(const void* in, void* out, int64_t rows, int64_t cols,
                      int64_t elem_size, int64_t n_threads) {
    switch (elem_size) {
        case 1: transpose_threaded<uint8_t>(in, out, rows, cols, n_threads); break;
        case 2: transpose_threaded<uint16_t>(in, out, rows, cols, n_threads); break;
        case 4: transpose_threaded<uint32_t>(in, out, rows, cols, n_threads); break;
        case 8: transpose_threaded<uint64_t>(in, out, rows, cols, n_threads); break;
        default: break;  // caller guards; unsupported sizes fall back in Python
    }
}

// bf16 (raw uint16) -> f32. n elements.
void ldt_bf16_to_f32(const uint16_t* in, float* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        uint32_t v = static_cast<uint32_t>(in[i]) << 16;
        std::memcpy(&out[i], &v, sizeof(float));
    }
}

// f16 -> f32 (IEEE half), n elements. Handles normals/subnormals/inf/nan.
static inline float half_to_float(uint16_t h) {
    uint32_t sign = (h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1Fu;
    uint32_t mant = h & 0x3FFu;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {  // subnormal: normalize
            int shift = 0;
            while (!(mant & 0x400u)) { mant <<= 1; ++shift; }
            mant &= 0x3FFu;
            bits = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float f;
    std::memcpy(&f, &bits, sizeof(float));
    return f;
}

void ldt_f16_to_f32(const uint16_t* in, float* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) out[i] = half_to_float(in[i]);
}

// GGUF Q8_0 blocks (34 bytes each: f16 scale + 32 int8) -> f32.
// out must hold n_blocks * 32 floats. (dequantize_blocks_Q8_0 parity,
// reference src/Quantize/Quantizer.py:94-112: x = d * q.)
void ldt_dequant_q8_0(const uint8_t* blocks, float* out, int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* blk = blocks + b * 34;
        uint16_t draw;
        std::memcpy(&draw, blk, 2);
        float d = half_to_float(draw);
        const int8_t* q = reinterpret_cast<const int8_t*>(blk + 2);
        float* o = out + b * 32;
        for (int i = 0; i < 32; ++i) o[i] = d * static_cast<float>(q[i]);
    }
}

// Split Q8_0 blocks into separate int8 codes + f32 scales (the layout the
// TPU quantized-weight path keeps in HBM).
void ldt_split_q8_0(const uint8_t* blocks, int8_t* q_out, float* scales_out,
                    int64_t n_blocks) {
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint8_t* blk = blocks + b * 34;
        uint16_t draw;
        std::memcpy(&draw, blk, 2);
        scales_out[b] = half_to_float(draw);
        std::memcpy(q_out + b * 32, blk + 2, 32);
    }
}

// Separable box blur (two passes ~ gaussian) used for mask feathering in
// the tiled pipelines (USDU mask_blur / detailer feather).
void ldt_box_blur_2d(const float* in, float* out, float* tmp,
                     int64_t h, int64_t w, int64_t radius) {
    int64_t k = 2 * radius + 1;
    // horizontal
    for (int64_t y = 0; y < h; ++y) {
        const float* row = in + y * w;
        float* trow = tmp + y * w;
        for (int64_t x = 0; x < w; ++x) {
            float acc = 0.f;
            for (int64_t dx = -radius; dx <= radius; ++dx) {
                int64_t xx = x + dx;
                if (xx < 0) xx = 0;
                if (xx >= w) xx = w - 1;
                acc += row[xx];
            }
            trow[x] = acc / static_cast<float>(k);
        }
    }
    // vertical
    for (int64_t y = 0; y < h; ++y) {
        for (int64_t x = 0; x < w; ++x) {
            float acc = 0.f;
            for (int64_t dy = -radius; dy <= radius; ++dy) {
                int64_t yy = y + dy;
                if (yy < 0) yy = 0;
                if (yy >= h) yy = h - 1;
                acc += tmp[yy * w + x];
            }
            out[y * w + x] = acc / static_cast<float>(k);
        }
    }
}

}  // extern "C"
