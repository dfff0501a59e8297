// neuman_host: native host-side scene-staging runtime.
//
// The reference delegates its host-side hot loops to native code inside
// torch DataLoader workers, scipy.ndimage, and libigl (SURVEY.md §2.9).
// Our TPU design moved the per-step work on device; what remains on the
// host is one-time scene staging, which for 100+ frame scenes at video
// resolution is minutes of single-core numpy. This library provides the
// staging kernels natively (threaded where it pays):
//
//   - binary_dilate:       iterative cross-structuring-element dilation
//                          (border masks; parity with
//                          scipy.ndimage.binary_dilation default structure)
//   - build_class_perm:    class-sorted pixel permutation [body|border|bkg]
//                          (counting sort; feeds datasets/arrays.py)
//   - fused_depth:         least-squares mono->MVS calibration + hole fill
//                          (parity with data_io/neuman_helper.py:78-86)
//   - read_colmap_depth_bin: COLMAP dense .bin parse + 95th-pct clip
//                          (parity with cameras/contents.py:99-108)
//
// Exposed with a plain C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Iterative binary dilation with the 4-connected cross element.
// mask: [h*w] uint8 in/out buffers must not alias.
void binary_dilate(const uint8_t* mask, uint8_t* out, int h, int w,
                   int iterations) {
  std::vector<uint8_t> cur(mask, mask + (size_t)h * w);
  std::vector<uint8_t> next((size_t)h * w);
  for (int it = 0; it < iterations; ++it) {
    for (int y = 0; y < h; ++y) {
      const uint8_t* row = cur.data() + (size_t)y * w;
      const uint8_t* up = y > 0 ? row - w : nullptr;
      const uint8_t* dn = y < h - 1 ? row + w : nullptr;
      uint8_t* orow = next.data() + (size_t)y * w;
      for (int x = 0; x < w; ++x) {
        uint8_t v = row[x];
        if (!v) {
          if (x > 0 && row[x - 1]) v = 1;
          else if (x < w - 1 && row[x + 1]) v = 1;
          else if (up && up[x]) v = 1;
          else if (dn && dn[x]) v = 1;
        }
        orow[x] = v;
      }
    }
    cur.swap(next);
  }
  std::memcpy(out, cur.data(), (size_t)h * w);
}

// Class-sorted pixel permutation. mask: human-foreground (nonzero = body);
// border: dilation ring (1 = border). Output perm: [h*w] int32 flat pixel
// ids ordered [body | border | strict-background] with stable order inside
// each class; counts: {body, border}.
void build_class_perm(const uint8_t* mask, const uint8_t* border, int h,
                      int w, int32_t* perm, int32_t* counts) {
  const size_t n = (size_t)h * w;
  int32_t n_body = 0, n_border = 0;
  for (size_t i = 0; i < n; ++i) {
    if (mask[i]) ++n_body;
    else if (border[i] == 1) ++n_border;
  }
  int32_t i_body = 0, i_border = n_body, i_bkg = n_body + n_border;
  for (size_t i = 0; i < n; ++i) {
    if (mask[i]) perm[i_body++] = (int32_t)i;
    else if (border[i] == 1) perm[i_border++] = (int32_t)i;
    else perm[i_bkg++] = (int32_t)i;
  }
  counts[0] = n_body;
  counts[1] = n_border;
}

// Fused depth: least-squares fit mono->mvs on pixels where mvs > 0 and
// mask == 0, then fill the remaining pixels with slope*mono + intercept.
// Returns 0 on success, -1 if the fit is degenerate.
int fused_depth(const float* mvs, const float* mono, const uint8_t* mask,
                int h, int w, float* out) {
  const size_t n = (size_t)h * w;
  double sx = 0, sy = 0, sxx = 0, sxy = 0;
  size_t m = 0;
  for (size_t i = 0; i < n; ++i) {
    if (mvs[i] > 0 && mask[i] == 0) {
      double x = mono[i], y = mvs[i];
      sx += x; sy += y; sxx += x * x; sxy += x * y;
      ++m;
    }
  }
  if (m < 2) return -1;
  double denom = (double)m * sxx - sx * sx;
  if (denom == 0) return -1;
  double slope = ((double)m * sxy - sx * sy) / denom;
  double intercept = (sy - slope * sx) / (double)m;
  for (size_t i = 0; i < n; ++i) {
    bool valid = mvs[i] > 0 && mask[i] == 0;
    out[i] = valid ? mvs[i] : (float)(mono[i] * slope + intercept);
  }
  return 0;
}

// COLMAP dense .bin: "w&h&c&" ASCII header then column-major float32 data.
// Negative depths zeroed; values above the 95th percentile of positive
// depths zeroed (parity with cameras/contents.py read_colmap_bin).
// Returns 0 on success; out must hold h*w floats; h/w read from the file
// and written to dims[0]/dims[1]. Call with out=nullptr to query dims.
int read_colmap_depth_bin(const char* path, float* out, int32_t* dims) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  long w = 0, hh = 0, c = 0;
  if (std::fscanf(f, "%ld&%ld&%ld&", &w, &hh, &c) != 3 || c != 1) {
    std::fclose(f);
    return -2;
  }
  dims[0] = (int32_t)hh;
  dims[1] = (int32_t)w;
  if (!out) {
    std::fclose(f);
    return 0;
  }
  const size_t n = (size_t)w * hh;
  std::vector<float> buf(n);
  if (std::fread(buf.data(), sizeof(float), n, f) != n) {
    std::fclose(f);
    return -3;
  }
  std::fclose(f);
  // F-order flatten of the (w, h, 1) array is x-fastest, i.e. already the
  // row-major [h, w] depth image.
  std::vector<float> dep(std::move(buf));
  std::vector<float> pos;
  pos.reserve(n);
  for (size_t i = 0; i < n; ++i) {
    if (dep[i] < 0) dep[i] = 0;
    if (dep[i] > 0) pos.push_back(dep[i]);
  }
  float maxd = 0;
  if (!pos.empty()) {
    // numpy 'linear' percentile interpolation at q=0.95
    double idx = 0.95 * (double)(pos.size() - 1);
    size_t lo = (size_t)idx;
    size_t hi = std::min(lo + 1, pos.size() - 1);
    std::nth_element(pos.begin(), pos.begin() + lo, pos.end());
    float vlo = pos[lo];
    std::nth_element(pos.begin(), pos.begin() + hi, pos.end());
    float vhi = pos[hi];
    maxd = (float)(vlo + (idx - (double)lo) * (vhi - vlo));
  }
  for (size_t i = 0; i < n; ++i)
    if (dep[i] > maxd) dep[i] = 0;
  std::memcpy(out, dep.data(), n * sizeof(float));
  return 0;
}

}  // extern "C"
