// Native host-side data ops for the input pipeline.
//
// The reference's data path is pure Python/PIL; this provides the fused
// crop + horizontal-flip + [-1,1] normalization as a single C++ pass over
// the decoded uint8 buffer (one read, one write, no intermediate arrays).
// Bound via ctypes (no pybind11 in this image); see fastops.py.

#include <cstdint>
#include <cstring>

extern "C" {

// src: uint8 HWC (src_h, src_w, 3). dst: float32 (size, size, 3).
// Crops at (oy, ox), optionally flips horizontally, maps [0,255] -> [-1,1].
void crop_flip_normalize(const uint8_t* src, int64_t src_h, int64_t src_w,
                         int64_t oy, int64_t ox, int64_t size, int flip,
                         float* dst) {
  const float scale = 2.0f / 255.0f;
  for (int64_t y = 0; y < size; ++y) {
    const uint8_t* row = src + ((oy + y) * src_w + ox) * 3;
    float* out = dst + y * size * 3;
    if (flip) {
      for (int64_t x = 0; x < size; ++x) {
        const uint8_t* px = row + (size - 1 - x) * 3;
        out[x * 3 + 0] = px[0] * scale - 1.0f;
        out[x * 3 + 1] = px[1] * scale - 1.0f;
        out[x * 3 + 2] = px[2] * scale - 1.0f;
      }
    } else {
      for (int64_t x = 0; x < size * 3; ++x) {
        out[x] = row[x] * scale - 1.0f;
      }
    }
  }
}

// Batched uint8 -> float32 [-1,1] conversion (collate fast path,
// reference datasets/prefetcher.py fast_collate + device normalize).
void normalize_batch(const uint8_t* src, int64_t n, float* dst) {
  const float scale = 2.0f / 255.0f;
  for (int64_t i = 0; i < n; ++i) {
    dst[i] = src[i] * scale - 1.0f;
  }
}

}  // extern "C"
