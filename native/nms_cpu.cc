// Greedy NMS — CPU oracle for parity-testing the TPU implementation.
//
// Same algorithm/conventions as the reference kernels
// (/root/reference/Detection/support/src/cpu/nms_cpu.cpp:5-75): boxes are
// visited in score-descending order; a live box suppresses every later box
// whose IoU >= threshold; areas optionally use the legacy "+1 pixel"
// convention ((x2-x1+1)*(y2-y1+1)). Written fresh against that spec with a
// C ABI for ctypes (the reference binds through pybind11/ATen instead).
#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// boxes: n*4 floats [x1,y1,x2,y2]; scores: n floats.
// keep_out: caller-allocated int64[n]; returns number of kept indices,
// written score-descending into keep_out.
int64_t afan_nms_cpu(const float* boxes, const float* scores, int64_t n,
                     float threshold, int plus_one, int64_t* keep_out) {
  if (n <= 0) return 0;
  const float off = plus_one ? 1.0f : 0.0f;

  std::vector<int64_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return scores[a] > scores[b];
  });

  std::vector<float> areas(n);
  for (int64_t i = 0; i < n; ++i) {
    const float* b = boxes + i * 4;
    areas[i] = (b[2] - b[0] + off) * (b[3] - b[1] + off);
  }

  std::vector<uint8_t> suppressed(n, 0);
  int64_t num_kept = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[num_kept++] = i;
    const float* bi = boxes + i * 4;
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + j * 4;
      const float xx1 = std::max(bi[0], bj[0]);
      const float yy1 = std::max(bi[1], bj[1]);
      const float xx2 = std::min(bi[2], bj[2]);
      const float yy2 = std::min(bi[3], bj[3]);
      const float w = std::max(0.0f, xx2 - xx1 + off);
      const float h = std::max(0.0f, yy2 - yy1 + off);
      const float inter = w * h;
      const float iou = inter / (areas[i] + areas[j] - inter);
      if (iou >= threshold) suppressed[j] = 1;
    }
  }
  return num_kept;
}

}  // extern "C"
