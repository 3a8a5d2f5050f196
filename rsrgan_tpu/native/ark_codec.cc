// Fast Kaldi ark codec primitives.
//
// Native counterpart of rsrgan_tpu/data/kaldi_ark.py for the hot paths the
// reference suffered on (the per-element compressed-ark dequantization at
// io_funcs/kaldi_io.py:149-160 — SURVEY.md flags it as the data-prep
// bottleneck). Exposed via ctypes from rsrgan_tpu/native/__init__.py.
//
// Build: bash rsrgan_tpu/native/build.sh  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

// Decode Kaldi CompressedMatrix format 1 ("BCM ").
//
// payload: num_cols per-column headers (4 x uint16 percentiles) followed by
//          the uint8 matrix stored column-major.
// out:     row-major float32 [num_rows, num_cols].
void decode_compressed_ark(const uint8_t* payload, float min_value,
                           float value_range, int32_t num_rows,
                           int32_t num_cols, float* out) {
  const uint16_t* headers = reinterpret_cast<const uint16_t*>(payload);
  const uint8_t* data = payload + static_cast<size_t>(num_cols) * 8;
  const float u16_scale = value_range * 1.52590218966964e-05f;  // 1/65535

  for (int32_t c = 0; c < num_cols; ++c) {
    const float p0 = min_value + u16_scale * headers[c * 4 + 0];
    const float p25 = min_value + u16_scale * headers[c * 4 + 1];
    const float p75 = min_value + u16_scale * headers[c * 4 + 2];
    const float p100 = min_value + u16_scale * headers[c * 4 + 3];
    // Precompute the 256-entry dequantization table for this column: the
    // piecewise-linear char->float map (kaldi_io.py:128-136) has only 256
    // possible inputs, so table lookup beats per-element branching.
    float table[256];
    const float s_lo = (p25 - p0) * (1.0f / 64.0f);
    const float s_mid = (p75 - p25) * (1.0f / 128.0f);
    const float s_hi = (p100 - p75) * (1.0f / 63.0f);
    for (int v = 0; v < 64; ++v) table[v] = p0 + s_lo * v;
    for (int v = 64; v <= 192; ++v) table[v] = p25 + s_mid * (v - 64);
    for (int v = 193; v < 256; ++v) table[v] = p75 + s_hi * (v - 192);

    const uint8_t* col = data + static_cast<size_t>(c) * num_rows;
    for (int32_t r = 0; r < num_rows; ++r) {
      out[static_cast<size_t>(r) * num_cols + c] = table[col[r]];
    }
  }
}

// Batch float32 <-> CMVN transform helpers (apply / denormalize) used by
// the store builder on multi-GB corpora.
void apply_cmvn(const float* feats, const float* mean, const float* istd,
                int64_t rows, int64_t cols, float* out) {
  for (int64_t r = 0; r < rows; ++r) {
    const float* row = feats + r * cols;
    float* orow = out + r * cols;
    for (int64_t c = 0; c < cols; ++c) {
      orow[c] = (row[c] - mean[c]) * istd[c];
    }
  }
}

}  // extern "C"
