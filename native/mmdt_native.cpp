// mmdt_native: host-side native kernels for mm-distillnet-tpu.
//
// The reference leans on torchvision's C++/CUDA NMS (reference
// src/YetAnotherEfficientDet.py:15-16, src/utils/utils.py:205) and runs its
// metric inner loops (TP assignment across a 9-point IoU sweep over the
// 113k-frame eval set, reference src/utils/utils.py:1058-1136) in Python.
// On the TPU build the *device* pipeline never leaves XLA, but the host
// metric path still wants native speed: these kernels are exposed through
// ctypes (see mm_distillnet_tpu/utils/native.py) with numpy fallbacks.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Greedy class-agnostic NMS over xyxy boxes, descending-score order.
// boxes: (n, 4) row-major, scores: (n,). keep_out must hold n ints.
// Returns number of kept indices (written in selection order).
int mmdt_nms(const float* boxes, const float* scores, int n,
             float iou_threshold, int* keep_out) {
  std::vector<int> order(n);
  for (int i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] > scores[b]; });
  std::vector<char> suppressed(n, 0);
  std::vector<float> areas(n);
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    areas[i] = (b[2] - b[0]) * (b[3] - b[1]);
  }
  int n_keep = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep_out[n_keep++] = i;
    const float* bi = boxes + 4 * i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float* bj = boxes + 4 * j;
      float x1 = std::max(bi[0], bj[0]);
      float y1 = std::max(bi[1], bj[1]);
      float x2 = std::min(bi[2], bj[2]);
      float y2 = std::min(bi[3], bj[3]);
      float inter = std::max(0.f, x2 - x1) * std::max(0.f, y2 - y1);
      float uni = areas[i] + areas[j] - inter;
      if (uni > 1e-8f && inter / uni > iou_threshold) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// True-positive assignment for one image at one IoU threshold, with the
// reference's exact semantics (src/utils/utils.py:1058-1136): iterate
// predictions in given (score-sorted) order; a prediction is a TP if its
// best-IoU target (>= threshold, +1 pixel area convention) has not been
// consumed yet AND its label matches some target label.
// preds: (n_pred, >=6) rows [x1,y1,x2,y2,score,label]; targets: (n_t, 5)
// rows [x1,y1,x2,y2,label]. tp_out: n_pred floats (0/1).
void mmdt_batch_statistics(const float* preds, int n_pred, int pred_stride,
                           const float* targets, int n_t,
                           float iou_threshold, float* tp_out) {
  std::vector<char> detected(n_t, 0);
  int n_detected = 0;
  for (int p = 0; p < n_pred; ++p) {
    tp_out[p] = 0.f;
    if (n_detected == n_t) break;
    const float* pr = preds + pred_stride * p;
    float plabel = pr[5];
    bool label_in_targets = false;
    for (int t = 0; t < n_t; ++t) {
      if (targets[5 * t + 4] == plabel) { label_in_targets = true; break; }
    }
    if (!label_in_targets) continue;
    float best_iou = -1.f;
    int best_t = -1;
    float pa = (pr[2] - pr[0] + 1) * (pr[3] - pr[1] + 1);
    for (int t = 0; t < n_t; ++t) {
      const float* tg = targets + 5 * t;
      float x1 = std::max(pr[0], tg[0]);
      float y1 = std::max(pr[1], tg[1]);
      float x2 = std::min(pr[2], tg[2]);
      float y2 = std::min(pr[3], tg[3]);
      float inter = std::max(0.f, x2 - x1 + 1) * std::max(0.f, y2 - y1 + 1);
      float ta = (tg[2] - tg[0] + 1) * (tg[3] - tg[1] + 1);
      float iou = inter / (pa + ta - inter + 1e-16f);
      if (iou > best_iou) { best_iou = iou; best_t = t; }
    }
    if (best_t >= 0 && best_iou >= iou_threshold && !detected[best_t]) {
      tp_out[p] = 1.f;
      detected[best_t] = 1;
      ++n_detected;
    }
  }
}

// Central-distance matching for one image (src/utils/utils.py:993-1055):
// greedy closest-point matching of (w, h) vectors per class; unmatched
// targets contribute their own size. Returns the (mean dx, mean dy) pair.
void mmdt_central_distances(const float* preds, int n_pred, int pred_stride,
                            const float* targets, int n_t,
                            float* mean_dx, float* mean_dy) {
  std::vector<float> plabels(n_pred);
  for (int p = 0; p < n_pred; ++p)
    plabels[p] = preds[pred_stride * p + 5];
  double sum_dx = 0, sum_dy = 0;
  for (int t = 0; t < n_t; ++t) {
    const float* tg = targets + 5 * t;
    float tw = tg[2] - tg[0];
    float th = tg[3] - tg[1];
    float tl = tg[4];
    int best = -1;
    float best_d = 0;
    for (int p = 0; p < n_pred; ++p) {
      if (plabels[p] != tl) continue;
      const float* pr = preds + pred_stride * p;
      float pw = pr[2] - pr[0];
      float ph = pr[3] - pr[1];
      float d = (pw - tw) * (pw - tw) + (ph - th) * (ph - th);
      if (best < 0 || d < best_d) { best = p; best_d = d; }
    }
    if (best < 0) {
      sum_dx += tw;
      sum_dy += th;
    } else {
      const float* pr = preds + pred_stride * best;
      sum_dx += std::fabs(tw - (pr[2] - pr[0]));
      sum_dy += std::fabs(th - (pr[3] - pr[1]));
      plabels[best] = -1.f;  // consume
    }
  }
  *mean_dx = n_t ? static_cast<float>(sum_dx / n_t) : 0.f;
  *mean_dy = n_t ? static_cast<float>(sum_dy / n_t) : 0.f;
}

}  // extern "C"
