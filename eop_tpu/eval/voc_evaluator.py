"""VOC mAP evaluator (batched eval loop -> per-class all_boxes -> voc_eval).

Parity target: `VOCEvaluator`
(`/root/reference/yolox/evaluators/voc_evaluator.py:19-208`).  Like the
COCO evaluator, the model handle is a jitted ``infer_fn`` returning
fixed-capacity `Detections`; conversion rescales to original image size and
buckets rows per class as ``all_boxes[class][image]`` arrays of
``[x1, y1, x2, y2, score]``.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np

from .postprocess import Detections


class VOCEvaluator:
    """VOC AP50/AP50:95 evaluation (ref `VOCEvaluator`)."""

    def __init__(self, dataloader, img_size, confthre, nmsthre,
                 num_classes: int):
        self.dataloader = dataloader
        self.img_size = img_size
        self.confthre = confthre
        self.nmsthre = nmsthre
        self.num_classes = num_classes
        self.num_images = len(dataloader.dataset)

    def evaluate(self, infer_fn: Callable, distributed: bool = False,
                 half: bool = False, decode_fn: Callable | None = None):
        """Returns (mAP50:95, mAP50, summary) (ref `evaluate:48-119`).

        ``infer_fn`` MUST be pure/idempotent — the first batch is run an
        extra time as a compile warm-up before its timed call.

        ``decode_fn`` restores the fwd-vs-NMS timing split; see
        `COCOEvaluator.evaluate`."""
        import jax

        data_dict = {}
        inference_time = 0.0
        n_batches = 0
        est_imgs = None  # first (full-sized) batch — see COCOEvaluator
        for batch in self.dataloader:
            imgs, _, info_imgs, ids = batch
            imgs_np = np.asarray(imgs, np.float32)
            if est_imgs is None:
                est_imgs = imgs_np
                # warm: keep the one-off XLA compile out of the timers
                jax.device_get(infer_fn(imgs_np))
            start = time.time()
            dets = infer_fn(imgs_np)
            dets = jax.device_get(dets)
            inference_time += time.time() - start
            n_batches += 1
            data_dict.update(
                self.convert_to_voc_format(dets, info_imgs, ids)
            )

        if distributed:
            # merge per-host detection dicts (parallel.dist.all_gather
            # handles arbitrary picklable payloads of differing sizes)
            from ..parallel.dist import all_gather

            merged = {}
            for part in all_gather(data_dict):
                merged.update(part)
            data_dict = merged

        nms_time = 0.0
        if decode_fn is not None and est_imgs is not None:
            from .coco_evaluator import COCOEvaluator

            nms_time = min(
                COCOEvaluator._estimate_nms_time(
                    infer_fn, decode_fn, est_imgs
                ) * n_batches,
                inference_time,
            )

        all_boxes = [
            [[] for _ in range(self.num_images)]
            for _ in range(self.num_classes)
        ]
        for img_num in range(self.num_images):
            bboxes, cls, scores = data_dict.get(
                img_num, (np.empty((0, 4)), np.empty((0,)), np.empty((0,)))
            )
            if bboxes.shape[0] == 0:
                for j in range(self.num_classes):
                    all_boxes[j][img_num] = np.empty([0, 5], dtype=np.float32)
                continue
            for j in range(self.num_classes):
                mask_c = cls == j
                c_dets = np.hstack(
                    (bboxes[mask_c], scores[mask_c][:, None])
                ).astype(np.float32)
                all_boxes[j][img_num] = c_dets

        mean_ap_5095, mean_ap_50 = (
            self.dataloader.dataset.evaluate_detections(all_boxes)
        )
        a_total = 1000 * inference_time / max(n_batches, 1)
        a_nms = 1000 * nms_time / max(n_batches, 1)
        summary = (
            f"Average forward time per batch: {a_total - a_nms:.2f} ms, "
            f"Average NMS time per batch: {a_nms:.2f} ms, "
            f"Average inference time per batch: {a_total:.2f} ms\n"
        )
        return mean_ap_5095, mean_ap_50, summary

    def convert_to_voc_format(self, dets: Detections, info_imgs, ids):
        """(ref `convert_to_voc_format:121-149`)."""
        predictions = {}
        rows = np.asarray(dets.rows)
        valid = np.asarray(dets.valid)
        img_hs, img_ws = info_imgs[0], info_imgs[1]
        ids = np.asarray(ids).reshape(-1)
        for b in range(rows.shape[0]):
            ok = valid[b].astype(bool)
            r = rows[b][ok]
            img_h, img_w = int(img_hs[b]), int(img_ws[b])
            scale = min(
                self.img_size[0] / float(img_h),
                self.img_size[1] / float(img_w),
            )
            bboxes = r[:, 0:4] / scale
            scores = r[:, 4] * r[:, 5]
            cls = r[:, 6].astype(np.int64)
            predictions[int(ids[b])] = (bboxes, cls, scores)
        return predictions
