// svt_native — C++ host-side runtime for surface_vision_transformers_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the HOST hot
// paths around it (the reference has no first-party native code — SURVEY §2 —
// so these are new capabilities, not ports):
//
//   * svt_gather_patches: threaded z-score + triangle-table gather for the
//     offline ETL, replacing the reference's O(2N*L) Python loop
//     (reference: tools/preprocessing.py:79-84);
//   * svt_decode_gzip_base64: one-shot base64 -> zlib/gzip inflate for GIFTI
//     <Data> payloads (bypasses two Python-level buffer copies);
//   * svt_f32_to_bf16: threaded fp32 -> bf16 (round-to-nearest-even) packing
//     for host-side dataset staging before device upload.
//
// C ABI only (consumed via ctypes — no pybind11 on this image). Threading is
// std::thread over row blocks; thread count from svt_set_threads or
// hardware_concurrency.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

static int g_threads = 0;

void svt_set_threads(int n) { g_threads = n; }

static int resolve_threads() {
  if (g_threads > 0) return g_threads;
  unsigned hc = std::thread::hardware_concurrency();
  return hc ? static_cast<int>(hc) : 1;
}

static void parallel_for(int64_t n, void (*body)(int64_t, int64_t, void*),
                         void* ctx) {
  int nt = resolve_threads();
  if (nt <= 1 || n < 2) {
    body(0, n, ctx);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back(body, lo, hi, ctx);
  }
  for (auto& th : ts) th.join();
}

// out[n, c, l, v] = (data[n, c, idx[l, v]] - mean[c]) / std[c]
struct GatherCtx {
  const float* data;
  const int32_t* indices;
  const float* means;
  const float* stds;
  float* out;
  int64_t C, G, L, V;
};

static void gather_body(int64_t lo, int64_t hi, void* vctx) {
  auto* ctx = static_cast<GatherCtx*>(vctx);
  const int64_t C = ctx->C, G = ctx->G, L = ctx->L, V = ctx->V;
  for (int64_t n = lo; n < hi; ++n) {
    const float* sample = ctx->data + n * C * G;
    float* out_n = ctx->out + n * C * L * V;
    for (int64_t c = 0; c < C; ++c) {
      const float* chan = sample + c * G;
      const float mean = ctx->means ? ctx->means[c] : 0.0f;
      const float inv_std = ctx->stds ? 1.0f / ctx->stds[c] : 1.0f;
      float* out_c = out_n + c * L * V;
      for (int64_t s = 0; s < L * V; ++s) {
        out_c[s] = (chan[ctx->indices[s]] - mean) * inv_std;
      }
    }
  }
}

// Returns 0 on success.
int svt_gather_patches(const float* data, const int32_t* indices,
                       const float* means, const float* stds, float* out,
                       int64_t N, int64_t C, int64_t G, int64_t L, int64_t V) {
  if (!data || !indices || !out) return 1;
  GatherCtx ctx{data, indices, means, stds, out, C, G, L, V};
  parallel_for(N, gather_body, &ctx);
  return 0;
}

// base64 decode (standard alphabet, '=' padding, whitespace skipped).
static int b64_decode(const char* in, int64_t n, unsigned char* out,
                      int64_t* out_len) {
  static int8_t lut[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) lut[i] = -1;
    const char* alpha =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    for (int i = 0; i < 64; ++i) lut[(unsigned char)alpha[i]] = (int8_t)i;
    init = true;
  }
  uint32_t acc = 0;
  int bits = 0;
  int64_t w = 0;
  for (int64_t i = 0; i < n; ++i) {
    unsigned char ch = (unsigned char)in[i];
    if (ch == '=' || ch == '\n' || ch == '\r' || ch == ' ' || ch == '\t')
      continue;
    int8_t v = lut[ch];
    if (v < 0) return 1;
    acc = (acc << 6) | (uint32_t)v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out[w++] = (unsigned char)((acc >> bits) & 0xFF);
    }
  }
  *out_len = w;
  return 0;
}

// base64 -> inflate (auto-detect zlib/gzip). Returns decompressed byte count,
// or -1 on error, or -2 if out_cap is too small.
int64_t svt_decode_gzip_base64(const char* b64, int64_t b64_len,
                               unsigned char* out, int64_t out_cap) {
  std::vector<unsigned char> compressed((b64_len * 3) / 4 + 4);
  int64_t comp_len = 0;
  if (b64_decode(b64, b64_len, compressed.data(), &comp_len)) return -1;

  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, MAX_WBITS | 32) != Z_OK) return -1;  // zlib or gzip
  zs.next_in = compressed.data();
  zs.avail_in = (uInt)comp_len;
  zs.next_out = out;
  zs.avail_out = (uInt)out_cap;
  int ret = inflate(&zs, Z_FINISH);
  int64_t produced = (int64_t)zs.total_out;
  inflateEnd(&zs);
  if (ret == Z_BUF_ERROR) return -2;
  if (ret != Z_STREAM_END) return -1;
  return produced;
}

// fp32 -> bf16 with round-to-nearest-even (matches XLA/numpy ml_dtypes).
struct Bf16Ctx {
  const float* in;
  uint16_t* out;
  int64_t n;
  int64_t block;
};

static void bf16_body(int64_t lo, int64_t hi, void* vctx) {
  auto* ctx = static_cast<Bf16Ctx*>(vctx);
  int64_t start = lo * ctx->block;
  int64_t end = hi * ctx->block < ctx->n ? hi * ctx->block : ctx->n;
  for (int64_t i = start; i < end; ++i) {
    uint32_t bits;
    std::memcpy(&bits, &ctx->in[i], 4);
    uint32_t lsb = (bits >> 16) & 1u;
    bits += 0x7FFFu + lsb;  // round to nearest even
    ctx->out[i] = (uint16_t)(bits >> 16);
  }
}

void svt_f32_to_bf16(const float* in, uint16_t* out, int64_t n) {
  const int64_t block = 1 << 16;
  Bf16Ctx ctx{in, out, n, block};
  parallel_for((n + block - 1) / block, bf16_body, &ctx);
}

// Batch-assembly row gather for the host-streaming input pipeline
// (data/pipeline.py StreamingLoader): out[i, :] = cast_f32(src[idx[i], :]).
// Threaded over output rows; src may be an np.memmap (page faults are
// serviced per thread, overlapping disk reads). dtype: 0 = f32 (memcpy),
// 1 = f64 (narrowing cast), 2 = f16 (widening cast).
struct RowsCtx {
  const unsigned char* src;
  const int64_t* idx;
  float* out;
  int64_t row_elems;
  int dtype;
};

static inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int shift = 0;
      while (!(man & 0x400)) { man <<= 1; ++shift; }
      man &= 0x3FF;
      bits = sign | ((uint32_t)(127 - 15 - shift) << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (man << 13);  // inf/nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

static void rows_body(int64_t lo, int64_t hi, void* vctx) {
  auto* ctx = static_cast<RowsCtx*>(vctx);
  const int64_t re = ctx->row_elems;
  for (int64_t i = lo; i < hi; ++i) {
    float* dst = ctx->out + i * re;
    const int64_t r = ctx->idx[i];
    if (ctx->dtype == 0) {
      std::memcpy(dst, ctx->src + (size_t)r * re * 4, (size_t)re * 4);
    } else if (ctx->dtype == 1) {
      const double* row = reinterpret_cast<const double*>(ctx->src) + r * re;
      for (int64_t e = 0; e < re; ++e) dst[e] = (float)row[e];
    } else {
      const uint16_t* row = reinterpret_cast<const uint16_t*>(ctx->src) + r * re;
      for (int64_t e = 0; e < re; ++e) dst[e] = f16_to_f32(row[e]);
    }
  }
}

// Returns 0 on success.
int svt_gather_rows(const void* src, int dtype, const int64_t* idx,
                    int64_t n_rows, int64_t row_elems, float* out) {
  if (!src || !idx || !out || dtype < 0 || dtype > 2) return 1;
  RowsCtx ctx{static_cast<const unsigned char*>(src), idx, out, row_elems,
              dtype};
  parallel_for(n_rows, rows_body, &ctx);
  return 0;
}

int svt_version() { return 2; }

}  // extern "C"
