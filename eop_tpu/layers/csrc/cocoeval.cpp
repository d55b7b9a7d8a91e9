// Fast COCO evaluation core — C++ implementation of the greedy
// detection↔ground-truth matcher, the O(T·D·G) hot loop of COCO AP.
//
// Native-parity counterpart of the reference's pybind11 torch extension
// (/root/reference/yolox/layers/csrc/cocoeval/cocoeval.cpp:16-140:
// SortInstancesByDetectionScore / SortInstancesByIgnore /
// MatchDetectionsToGroundTruth / EvaluateImages).  This build exposes a
// flat extern "C" ABI so Python binds via ctypes — no pybind11/torch
// dependency (neither exists in this image).
//
// Matching semantics follow COCOeval exactly:
//  * detections pre-sorted by descending score, GTs with ignores last;
//  * for each IoU threshold t and each detection d (best first): pick the
//    unmatched GT with the highest IoU >= t, preferring non-ignored GTs —
//    once a non-ignored candidate exists, an ignored GT can only take the
//    match if no non-ignored GT clears the threshold;
//  * crowd ("ignore") GTs may be matched by multiple detections;
//  * a detection matched to an ignored GT, or unmatched with an
//    out-of-area-range area, is marked ignored.

#include <cstdint>
#include <vector>

extern "C" {

// One (image, category) cell.
//   T: number of IoU thresholds; D: detections; G: ground truths.
//   iou:        [D, G] row-major IoU matrix (dt-major)
//   gt_ignore:  [G]    1 if this GT is ignored for the current area range
//   gt_iscrowd: [G]    1 if crowd (multi-match allowed)
//   dt_out_of_range: [D] 1 if the detection's area falls outside the range
// Outputs (caller-allocated):
//   dt_matches: [T, D] matched gt index + 1, 0 = unmatched
//   gt_matches: [T, G] matched dt index + 1, 0 = unmatched
//   dt_ignores: [T, D] 1 if the detection does not count for PR curves
void cocoeval_match_image(
    int64_t num_thresholds,
    int64_t num_dt,
    int64_t num_gt,
    const double* iou_thresholds,
    const double* iou,
    const int32_t* gt_ignore,
    const int32_t* gt_iscrowd,
    const int32_t* dt_out_of_range,
    int64_t* dt_matches,
    int64_t* gt_matches,
    int32_t* dt_ignores) {
  for (int64_t t = 0; t < num_thresholds; ++t) {
    const double thr = iou_thresholds[t];
    int64_t* dtm = dt_matches + t * num_dt;
    int64_t* gtm = gt_matches + t * num_gt;
    int32_t* dti = dt_ignores + t * num_dt;
    for (int64_t d = 0; d < num_dt; ++d) {
      // pycocotools: initial acceptance bar is min(t, 1 - 1e-10)
      double best_iou = thr < 1.0 - 1e-10 ? thr : 1.0 - 1e-10;
      int64_t best_g = -1;
      for (int64_t g = 0; g < num_gt; ++g) {
        // GT already claimed by a better detection (crowds can re-match)
        if (gtm[g] > 0 && !gt_iscrowd[g]) continue;
        // GTs are sorted ignores-last: once we hold a non-ignored match,
        // stop at the first ignored GT — it cannot improve the match.
        if (best_g >= 0 && !gt_ignore[best_g] && gt_ignore[g]) break;
        const double v = iou[d * num_gt + g];
        if (v < best_iou) continue;
        best_iou = v;
        best_g = g;
      }
      if (best_g >= 0) {
        dtm[d] = best_g + 1;
        gtm[best_g] = d + 1;
        dti[d] = gt_ignore[best_g];
      } else {
        dtm[d] = 0;
        dti[d] = 0;
      }
    }
    // unmatched detections outside the area range are ignored
    for (int64_t d = 0; d < num_dt; ++d) {
      if (dtm[d] == 0 && dt_out_of_range[d]) dti[d] = 1;
    }
  }
}

// Batched variant: evaluate many (image, category) cells in one call to
// amortize the FFI crossing.  Arrays are the concatenation of the per-cell
// arrays above; offsets give each cell's slice.
void cocoeval_match_images(
    int64_t num_cells,
    int64_t num_thresholds,
    const double* iou_thresholds,
    const int64_t* dt_counts,     // [num_cells]
    const int64_t* gt_counts,     // [num_cells]
    const int64_t* iou_offsets,   // [num_cells] start into `iou`
    const int64_t* dt_offsets,    // [num_cells] start into dt arrays
    const int64_t* gt_offsets,    // [num_cells] start into gt arrays
    const double* iou,
    const int32_t* gt_ignore,
    const int32_t* gt_iscrowd,
    const int32_t* dt_out_of_range,
    int64_t* dt_matches,          // [T, total_dt] cell-sliced
    int64_t* gt_matches,          // [T, total_gt]
    int32_t* dt_ignores,          // [T, total_dt]
    int64_t total_dt,
    int64_t total_gt) {
  for (int64_t c = 0; c < num_cells; ++c) {
    const int64_t nd = dt_counts[c];
    const int64_t ng = gt_counts[c];
    if (nd == 0) continue;
    // Per-cell views into the [T, total] output lattices.
    for (int64_t t = 0; t < num_thresholds; ++t) {
      const double thr = iou_thresholds[t];
      int64_t* dtm = dt_matches + t * total_dt + dt_offsets[c];
      int64_t* gtm = gt_matches + t * total_gt + gt_offsets[c];
      int32_t* dti = dt_ignores + t * total_dt + dt_offsets[c];
      const double* cell_iou = iou + iou_offsets[c];
      const int32_t* g_ign = gt_ignore + gt_offsets[c];
      const int32_t* g_crowd = gt_iscrowd + gt_offsets[c];
      for (int64_t d = 0; d < nd; ++d) {
        double best_iou = thr < 1.0 - 1e-10 ? thr : 1.0 - 1e-10;
        int64_t best_g = -1;
        for (int64_t g = 0; g < ng; ++g) {
          if (gtm[g] > 0 && !g_crowd[g]) continue;
          if (best_g >= 0 && !g_ign[best_g] && g_ign[g]) break;
          const double v = cell_iou[d * ng + g];
          if (v < best_iou) continue;
          best_iou = v;
          best_g = g;
        }
        if (best_g >= 0) {
          dtm[d] = best_g + 1;
          gtm[best_g] = d + 1;
          dti[d] = g_ign[best_g];
        }
      }
      const int32_t* d_oor = dt_out_of_range + dt_offsets[c];
      for (int64_t d = 0; d < nd; ++d) {
        if (dtm[d] == 0 && d_oor[d]) dti[d] = 1;
      }
    }
  }
}

}  // extern "C"
