// ROIAlign forward — CPU oracle for parity-testing the TPU implementation.
//
// Math follows the reference CUDA/CPU kernels
// (/root/reference/Detection/support/src/cuda/ROIAlign_cuda.cu:15-80):
// legacy non-aligned coordinates (no -0.5 offset), roi sizes clamped to >=1,
// bilinear interpolation averaged over a sampling grid. sampling_ratio <= 0
// selects the reference's ADAPTIVE grid (ceil(roi_size / pooled_size));
// a positive value selects the static grid the TPU kernel uses — both are
// exposed so tests can quantify the static-grid divergence.
//
// Layout: NHWC (TPU framework layout), C ABI for ctypes.
#include <algorithm>
#include <cmath>
#include <cstdint>

namespace {

inline float bilinear(const float* feat, int64_t H, int64_t W, int64_t C,
                      float y, float x, int64_t c) {
  if (y < -1.0f || y > H || x < -1.0f || x > W) return 0.0f;
  y = std::max(y, 0.0f);
  x = std::max(x, 0.0f);
  int64_t y0 = static_cast<int64_t>(y);
  int64_t x0 = static_cast<int64_t>(x);
  int64_t y1 = y0 + 1, x1 = x0 + 1;
  if (y0 >= H - 1) { y0 = y1 = H - 1; y = static_cast<float>(y0); }
  if (x0 >= W - 1) { x0 = x1 = W - 1; x = static_cast<float>(x0); }
  const float ly = y - y0, lx = x - x0;
  const float hy = 1.0f - ly, hx = 1.0f - lx;
  auto at = [&](int64_t yy, int64_t xx) {
    return feat[(yy * W + xx) * C + c];
  };
  return hy * hx * at(y0, x0) + hy * lx * at(y0, x1) +
         ly * hx * at(y1, x0) + ly * lx * at(y1, x1);
}

}  // namespace

extern "C" {

// feat: B*H*W*C floats (NHWC). boxes: R*4 [x1,y1,x2,y2] absolute coords.
// batch_idx: R int64. out: R*ph*pw*C floats.
void afan_roi_align_cpu(const float* feat, int64_t B, int64_t H, int64_t W,
                        int64_t C, const float* boxes,
                        const int64_t* batch_idx, int64_t R,
                        int64_t ph, int64_t pw, float spatial_scale,
                        int64_t sampling_ratio, float* out) {
  for (int64_t r = 0; r < R; ++r) {
    const float* box = boxes + r * 4;
    const float* f = feat + batch_idx[r] * H * W * C;
    const float x1 = box[0] * spatial_scale;
    const float y1 = box[1] * spatial_scale;
    const float x2 = box[2] * spatial_scale;
    const float y2 = box[3] * spatial_scale;
    const float roi_w = std::max(x2 - x1, 1.0f);
    const float roi_h = std::max(y2 - y1, 1.0f);
    const float bin_w = roi_w / pw;
    const float bin_h = roi_h / ph;
    const int64_t gy = sampling_ratio > 0
                           ? sampling_ratio
                           : static_cast<int64_t>(std::ceil(roi_h / ph));
    const int64_t gx = sampling_ratio > 0
                           ? sampling_ratio
                           : static_cast<int64_t>(std::ceil(roi_w / pw));
    const float cnt = static_cast<float>(gy * gx);
    for (int64_t py = 0; py < ph; ++py) {
      for (int64_t px = 0; px < pw; ++px) {
        float* o = out + ((r * ph + py) * pw + px) * C;
        for (int64_t c = 0; c < C; ++c) o[c] = 0.0f;
        for (int64_t iy = 0; iy < gy; ++iy) {
          const float yy = y1 + py * bin_h + (iy + 0.5f) * bin_h / gy;
          for (int64_t ix = 0; ix < gx; ++ix) {
            const float xx = x1 + px * bin_w + (ix + 0.5f) * bin_w / gx;
            for (int64_t c = 0; c < C; ++c) {
              o[c] += bilinear(f, H, W, C, yy, xx, c);
            }
          }
        }
        for (int64_t c = 0; c < C; ++c) o[c] /= cnt;
      }
    }
  }
}

}  // extern "C"
