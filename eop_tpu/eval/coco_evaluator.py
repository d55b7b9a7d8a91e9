"""COCO AP evaluator: batched eval loop -> COCO-format json -> COCOeval.

Parity target: `COCOEvaluator`
(`/root/reference/yolox/evaluators/coco_evaluator.py:78-289`) including the
per-class AP/AR tables (`:30-75`) and fwd/NMS timing split.

TPU adaptations:
* the model handle is a jitted ``infer_fn(images) -> Detections`` that owns
  forward + decode + NMS in one XLA program, so the reference's separate
  forward/NMS timers collapse into one inference timer (NMS time is
  reported as part of it);
* fixed-capacity `Detections` (rows + valid mask) replace ragged per-image
  tensors — one fixed-size host transfer per batch;
* distributed gather uses `jax.experimental.multihost_utils` when running
  multi-host (the reference pickles through a gloo side-group).
"""

from __future__ import annotations

import contextlib
import io
import itertools
import json
import time
from typing import Callable, List, Optional

import numpy as np
from tabulate import tabulate

from ..data.coco_classes import COCO_CLASSES
from .coco_eval import COCOeval
from .postprocess import Detections


def per_class_AR_table(coco_eval, class_names=COCO_CLASSES,
                       headers=["class", "AR"], colums=6):
    """Markdown AR-per-class table (ref `per_class_AR_table:30-50`)."""
    per_class_AR = {}
    recalls = coco_eval.eval["recall"]
    assert len(class_names) == recalls.shape[1]
    for idx, name in enumerate(class_names):
        recall = recalls[:, idx, 0, -1]
        recall = recall[recall > -1]
        ar = np.mean(recall) if recall.size else float("nan")
        per_class_AR[name] = float(ar * 100)
    num_cols = min(colums, len(per_class_AR) * len(headers))
    result_pair = [x for pair in per_class_AR.items() for x in pair]
    row_pair = itertools.zip_longest(
        *[result_pair[i::num_cols] for i in range(num_cols)]
    )
    table_headers = headers * (num_cols // len(headers))
    return tabulate(
        row_pair, tablefmt="pipe", floatfmt=".3f",
        headers=table_headers, numalign="left",
    )


def per_class_AP_table(coco_eval, class_names=COCO_CLASSES,
                       headers=["class", "AP"], colums=6):
    """Markdown AP-per-class table (ref `per_class_AP_table:53-75`)."""
    per_class_AP = {}
    precisions = coco_eval.eval["precision"]
    assert len(class_names) == precisions.shape[2]
    for idx, name in enumerate(class_names):
        precision = precisions[:, :, idx, 0, -1]
        precision = precision[precision > -1]
        ap = np.mean(precision) if precision.size else float("nan")
        per_class_AP[name] = float(ap * 100)
    num_cols = min(colums, len(per_class_AP) * len(headers))
    result_pair = [x for pair in per_class_AP.items() for x in pair]
    row_pair = itertools.zip_longest(
        *[result_pair[i::num_cols] for i in range(num_cols)]
    )
    table_headers = headers * (num_cols // len(headers))
    return tabulate(
        row_pair, tablefmt="pipe", floatfmt=".3f",
        headers=table_headers, numalign="left",
    )


class COCOEvaluator:
    """COCO AP evaluation over a val dataloader (ref `COCOEvaluator`)."""

    def __init__(
        self,
        dataloader,
        img_size,
        confthre: float,
        nmsthre: float,
        num_classes: int,
        testdev: bool = False,
        per_class_AP: bool = False,
        per_class_AR: bool = False,
    ):
        self.dataloader = dataloader
        self.img_size = img_size
        self.confthre = confthre
        self.nmsthre = nmsthre
        self.num_classes = num_classes
        self.testdev = testdev
        self.per_class_AP = per_class_AP
        self.per_class_AR = per_class_AR

    def evaluate(self, infer_fn: Callable, distributed: bool = False,
                 half: bool = False, decode_fn: Optional[Callable] = None):
        """Run ``infer_fn`` over the loader and compute AP.

        Returns (ap50_95, ap50, summary_str) like the reference
        (`evaluate:115-197`).

        ``decode_fn`` (forward + decode, no NMS) restores the reference's
        forward-vs-NMS timing split: NMS cannot be timed inside the fused
        program, so it is estimated once per eval as the difference between
        the full pipeline and the decode-only pipeline on the last batch
        (the reference instead accumulates the two timers every batch,
        `coco_evaluator.py:161-189`).
        """
        import jax

        data_list: List[dict] = []
        inference_time = 0.0
        n_batches = 0
        est_imgs = None  # first (full-sized) batch; drop_last=False can
        # shrink only the LAST batch, which would force fresh compiles

        for cur_iter, batch in enumerate(self.dataloader):
            imgs, _, info_imgs, ids = batch
            imgs_np = np.asarray(imgs, np.float32)
            if est_imgs is None:
                est_imgs = imgs_np
                # warm: keep the one-off XLA compile out of the timers
                # (the reference accumulates steady-state timers only)
                jax.device_get(infer_fn(imgs_np))
            start = time.time()
            dets = infer_fn(imgs_np)
            dets = jax.device_get(dets)
            inference_time += time.time() - start
            n_batches += 1
            data_list.extend(
                self.convert_to_coco_format(dets, info_imgs, ids)
            )

        nms_time = 0.0
        if decode_fn is not None and est_imgs is not None:
            # clamp: the separately-estimated NMS share can never exceed
            # the loop-measured total (tunnel noise otherwise produces a
            # negative forward time in the summary)
            nms_time = min(
                self._estimate_nms_time(infer_fn, decode_fn, est_imgs)
                * n_batches,
                inference_time,
            )

        if distributed:
            # padded-pickle object all_gather (parallel.dist): a raw
            # ``process_allgather`` on a list of result dicts would treat
            # the dicts as pytrees (yielding their KEYS when chained) and
            # requires identical structures across hosts — per-host
            # detection lists differ in length
            from ..parallel.dist import all_gather

            data_list = list(itertools.chain(*all_gather(data_list)))

        statistics = (inference_time, nms_time, max(n_batches, 1))
        return self.evaluate_prediction(data_list, statistics)

    @staticmethod
    def _estimate_nms_time(infer_fn, decode_fn, imgs, reps: int = 3):
        """Per-batch NMS cost ~= t(forward+decode+NMS) - t(forward+decode).
        Both handles are timed warm (first call compiles), synchronized by
        a *small* host fetch (fetching the full Detections pytree would
        attribute its transfer time to NMS), and take the best of ``reps``
        — the tunnel sporadically injects multi-second stalls that would
        otherwise swamp the difference."""
        import jax

        def small_fetch(out):
            # one element of the first leaf: syncs without bulk transfer
            leaf = jax.tree.leaves(out)[0]
            jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf)

        def timed(fn):
            small_fetch(fn(imgs))  # warm / compile
            best = float("inf")
            for _ in range(reps):
                start = time.time()
                small_fetch(fn(imgs))
                best = min(best, time.time() - start)
            return best

        return max(0.0, timed(infer_fn) - timed(decode_fn))

    def convert_to_coco_format(self, dets: Detections, info_imgs, ids):
        """Detections -> COCO result dicts, rescaled to original image size
        (ref `convert_to_coco_format:199-229`)."""
        data_list = []
        rows = np.asarray(dets.rows)
        valid = np.asarray(dets.valid)
        img_hs, img_ws = info_imgs[0], info_imgs[1]
        class_ids = getattr(
            self.dataloader.dataset, "class_ids",
            list(range(self.num_classes)),
        )
        ids = np.asarray(ids).reshape(-1)
        for b in range(rows.shape[0]):
            img_h = int(img_hs[b])
            img_w = int(img_ws[b])
            img_id = int(ids[b])
            scale = min(
                self.img_size[0] / float(img_h),
                self.img_size[1] / float(img_w),
            )
            for r, ok in zip(rows[b], valid[b]):
                if not ok:
                    continue
                x1, y1, x2, y2, obj, cls_conf, cls_pred = r[:7]
                bbox = [
                    float(x1 / scale), float(y1 / scale),
                    float((x2 - x1) / scale), float((y2 - y1) / scale),
                ]
                data_list.append(
                    {
                        "image_id": img_id,
                        "category_id": class_ids[int(cls_pred)],
                        "bbox": bbox,
                        "score": float(obj * cls_conf),
                        "segmentation": [],
                    }
                )
        return data_list

    def evaluate_prediction(self, data_dict, statistics):
        """json -> COCOeval -> (ap50_95, ap50, summary)
        (ref `evaluate_prediction:231-289`)."""
        annType = ["segm", "bbox", "keypoints"]
        inference_time, nms_time, n_samples = statistics
        denom = (
            n_samples * self.dataloader.batch_size
            if getattr(self.dataloader, "batch_size", None)
            else n_samples
        )
        a_infer_time = 1000 * (inference_time - nms_time) / denom
        a_nms_time = 1000 * nms_time / denom
        time_info = ", ".join(
            [
                "Average forward time: {:.2f} ms".format(a_infer_time),
                "Average NMS time: {:.2f} ms".format(a_nms_time),
                "Average inference time: {:.2f} ms".format(
                    a_infer_time + a_nms_time
                ),
            ]
        )
        info = time_info + "\n"

        if len(data_dict) == 0:
            return 0.0, 0.0, info

        cocoGt = self.dataloader.dataset.coco
        if self.testdev:
            json.dump(data_dict, open("./yolox_testdev_2017.json", "w"))
            cocoDt = cocoGt.loadRes("./yolox_testdev_2017.json")
        else:
            cocoDt = cocoGt.loadRes(data_dict)
        cocoEval = COCOeval(cocoGt, cocoDt, annType[1])
        cocoEval.evaluate()
        cocoEval.accumulate()
        redirect_string = io.StringIO()
        with contextlib.redirect_stdout(redirect_string):
            cocoEval.summarize()
        info += redirect_string.getvalue()

        cat_ids = list(cocoGt.cats.keys())
        cat_names = [cocoGt.cats[catId]["name"] for catId in sorted(cat_ids)]
        if self.per_class_AP:
            info += "per class AP:\n" + per_class_AP_table(
                cocoEval, class_names=cat_names
            ) + "\n"
        if self.per_class_AR:
            info += "per class AR:\n" + per_class_AR_table(
                cocoEval, class_names=cat_names
            ) + "\n"
        return cocoEval.stats[0], cocoEval.stats[1], info
