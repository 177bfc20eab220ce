// arpack — native packing/unpacking data plane for autoround_tpu.
//
// Role of the reference's native layer (auto_round_extension/ark C++): the
// TPU compute path is Pallas/XLA, so the native niche on this stack is the
// host-side export/import data plane — bit-packing quantized codes at
// memory bandwidth for multi-hundred-GB checkpoints (model-free compressor,
// serving weight loader).  Exposed as a plain C ABI consumed via ctypes
// (no pybind11 in this environment).
//
// Layouts match export/packing.py and ops/qmatmul.py exactly; the Python
// implementations remain as the reference/fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp arpack.cpp -o libarpack.so

#include <cstdint>
#include <cstring>

extern "C" {

// Pack (N, K) codes (< 2^bits, uint8 for bits<=8) into int32 words along K,
// LSB-first: out (N, ceil(K*bits/32)).  32 % bits == 0.
void pack_rows_u32(const uint8_t* codes, int64_t N, int64_t K, int bits,
                   int32_t* out) {
    const int per = 32 / bits;
    const int64_t words = (K + per - 1) / per;
#pragma omp parallel for schedule(static)
    for (int64_t n = 0; n < N; ++n) {
        const uint8_t* row = codes + n * K;
        int32_t* orow = out + n * words;
        for (int64_t w = 0; w < words; ++w) {
            uint32_t acc = 0;
            const int64_t base = w * per;
            const int lim = (base + per <= K) ? per : (int)(K - base);
            for (int j = 0; j < lim; ++j)
                acc |= (uint32_t)(row[base + j]) << (bits * j);
            orow[w] = (int32_t)acc;
        }
    }
}

// Inverse of pack_rows_u32: out (N, K) uint8.
void unpack_rows_u32(const int32_t* wordsbuf, int64_t N, int64_t K, int bits,
                     uint8_t* out) {
    const int per = 32 / bits;
    const int64_t words = (K + per - 1) / per;
    const uint32_t mask = (bits == 32) ? 0xFFFFFFFFu : ((1u << bits) - 1u);
#pragma omp parallel for schedule(static)
    for (int64_t n = 0; n < N; ++n) {
        const uint32_t* row = (const uint32_t*)(wordsbuf + n * words);
        uint8_t* orow = out + n * K;
        for (int64_t k = 0; k < K; ++k)
            orow[k] = (uint8_t)((row[k / per] >> (bits * (k % per))) & mask);
    }
}

// Nibble-plane serving layout (ops/qmatmul.py pack_w4_planes):
// K-tile t (width 8g) stores logical column t*8g + j*g + i in nibble j of
// word t*g + i.  codes (O, K) uint8 < 16 → out (O, K/8) int32.
void pack_w4_planes(const uint8_t* codes, int64_t O, int64_t K, int64_t g,
                    int32_t* out) {
    const int64_t TK = 8 * g;
    const int64_t ntiles = K / TK;
#pragma omp parallel for schedule(static)
    for (int64_t o = 0; o < O; ++o) {
        const uint8_t* row = codes + o * K;
        int32_t* orow = out + o * (K / 8);
        for (int64_t t = 0; t < ntiles; ++t) {
            for (int64_t i = 0; i < g; ++i) {
                uint32_t acc = 0;
                for (int j = 0; j < 8; ++j)
                    acc |= (uint32_t)(row[t * TK + j * g + i]) << (4 * j);
                orow[t * g + i] = (int32_t)acc;
            }
        }
    }
}

// GPTQ-layout transpose pack: codes (O, I) → qweight (I*bits/32, O):
// column o holds the packed codes of output-channel o along the input axis.
void pack_gptq_qweight(const uint8_t* codes, int64_t O, int64_t I, int bits,
                       int32_t* out) {
    const int per = 32 / bits;
    const int64_t words = (I + per - 1) / per;
#pragma omp parallel for schedule(static)
    for (int64_t w = 0; w < words; ++w) {
        for (int64_t o = 0; o < O; ++o) {
            uint32_t acc = 0;
            const int64_t base = w * per;
            const int lim = (base + per <= I) ? per : (int)(I - base);
            for (int j = 0; j < lim; ++j)
                acc |= (uint32_t)(codes[o * I + base + j]) << (bits * j);
            out[w * O + o] = (int32_t)acc;
        }
    }
}

}  // extern "C"
