"""PASCAL VOC detection dataset (torch-free).

Parity target: `/root/reference/yolox/data/datasets/voc.py:24-366` — xml
`AnnotationTransform`, the VOCdevkit directory layout, pre-scaled
annotations, memmap cache, results-file writing, and
``evaluate_detections`` sweeping IoU 0.5:0.95 over `voc_eval`.
"""

from __future__ import annotations

import os
import pickle
import xml.etree.ElementTree as ET
from multiprocessing.pool import ThreadPool

import cv2
import numpy as np

from ..eval.voc_eval import voc_eval
from .datasets_wrapper import Dataset
from .voc_classes import VOC_CLASSES


class AnnotationTransform:
    """VOC xml -> [[x1, y1, x2, y2, label], ...] (ref `:24-81`)."""

    def __init__(self, class_to_ind=None, keep_difficult=True):
        self.class_to_ind = class_to_ind or dict(
            zip(VOC_CLASSES, range(len(VOC_CLASSES)))
        )
        self.keep_difficult = keep_difficult

    def __call__(self, target):
        res = np.empty((0, 5))
        for obj in target.iter("object"):
            difficult = obj.find("difficult")
            difficult = (
                int(difficult.text) == 1 if difficult is not None else False
            )
            if not self.keep_difficult and difficult:
                continue
            name = obj.find("name").text.strip()
            bbox = obj.find("bndbox")
            bndbox = [
                int(float(bbox.find(pt).text)) - 1
                for pt in ("xmin", "ymin", "xmax", "ymax")
            ]
            bndbox.append(self.class_to_ind[name])
            res = np.vstack((res, bndbox))
        width = int(target.find("size").find("width").text)
        height = int(target.find("size").find("height").text)
        return res, (height, width)


class VOCDetection(Dataset):
    """VOC detection dataset (ref `VOCDetection:83-366`)."""

    def __init__(
        self,
        data_dir,
        image_sets=(("2007", "trainval"), ("2012", "trainval")),
        img_size=(416, 416),
        preproc=None,
        target_transform=None,
        dataset_name="VOC0712",
        cache=False,
    ):
        super().__init__(img_size)
        self.root = data_dir
        self.image_set = list(image_sets)
        self.img_size = img_size
        self.preproc = preproc
        self.target_transform = target_transform or AnnotationTransform()
        self.name = dataset_name
        self._annopath = os.path.join("%s", "Annotations", "%s.xml")
        self._imgpath = os.path.join("%s", "JPEGImages", "%s.jpg")
        self._classes = VOC_CLASSES
        self.ids = []
        for (year, name) in self.image_set:
            self._year = year
            rootpath = os.path.join(self.root, "VOC" + year)
            with open(
                os.path.join(rootpath, "ImageSets", "Main", name + ".txt")
            ) as f:
                for line in f:
                    self.ids.append((rootpath, line.strip()))
        self.annotations = [
            self.load_anno_from_ids(i) for i in range(len(self.ids))
        ]
        self.imgs = None
        if cache:
            self._cache_images()

    def __len__(self):
        return len(self.ids)

    def _cache_images(self):
        max_h, max_w = self.img_size
        cache_file = os.path.join(
            self.root, f"img_resized_cache_{self.name}.array"
        )
        if not os.path.exists(cache_file):
            self.imgs = np.memmap(
                cache_file, shape=(len(self.ids), max_h, max_w, 3),
                dtype=np.uint8, mode="w+",
            )
            n_threads = min(8, os.cpu_count() or 1)
            loaded = ThreadPool(n_threads).imap(
                self.load_resized_img, range(len(self.annotations))
            )
            for k, out in enumerate(loaded):
                self.imgs[k][: out.shape[0], : out.shape[1], :] = out.copy()
            self.imgs.flush()
        self.imgs = np.memmap(
            cache_file, shape=(len(self.ids), max_h, max_w, 3),
            dtype=np.uint8, mode="r+",
        )

    def load_anno_from_ids(self, index):
        img_id = self.ids[index]
        target = ET.parse(self._annopath % img_id).getroot()
        res, img_info = self.target_transform(target)
        height, width = img_info
        r = min(self.img_size[0] / height, self.img_size[1] / width)
        res[:, :4] *= r
        resized_info = (int(height * r), int(width * r))
        return (res, img_info, resized_info)

    def load_anno(self, index):
        return self.annotations[index][0]

    def load_resized_img(self, index):
        img = self.load_image(index)
        r = min(
            self.img_size[0] / img.shape[0], self.img_size[1] / img.shape[1]
        )
        return cv2.resize(
            img,
            (int(img.shape[1] * r), int(img.shape[0] * r)),
            interpolation=cv2.INTER_LINEAR,
        ).astype(np.uint8)

    def load_image(self, index):
        img_id = self.ids[index]
        img = cv2.imread(self._imgpath % img_id, cv2.IMREAD_COLOR)
        assert img is not None
        return img

    def pull_item(self, index):
        if self.imgs is not None:
            target, img_info, resized_info = self.annotations[index]
            pad_img = self.imgs[index]
            img = pad_img[: resized_info[0], : resized_info[1], :].copy()
        else:
            img = self.load_resized_img(index)
            target, img_info, _ = self.annotations[index]
        return img, target, img_info, index

    @Dataset.mosaic_getitem
    def __getitem__(self, index):
        img, target, img_info, img_id = self.pull_item(index)
        if self.preproc is not None:
            img, target = self.preproc(img, target, self.input_dim)
        return img, target, img_info, img_id

    # ------------------------------------------------------------------

    def evaluate_detections(self, all_boxes, output_dir=None):
        """mAP over IoU 0.5:0.95 (ref `evaluate_detections:246-266`)."""
        self._write_voc_results_file(all_boxes)
        iou_thrs = np.linspace(
            0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1, endpoint=True
        )
        mAPs = [self._do_python_eval(output_dir, iou) for iou in iou_thrs]
        print("-" * 62)
        print("map_5095:", np.mean(mAPs))
        print("map_50:", mAPs[0])
        print("-" * 62)
        return np.mean(mAPs), mAPs[0]

    def _get_voc_results_file_template(self):
        filedir = os.path.join(
            self.root, "results", "VOC" + self._year, "Main"
        )
        os.makedirs(filedir, exist_ok=True)
        return os.path.join(filedir, "comp4_det_test_{:s}.txt")

    def _write_voc_results_file(self, all_boxes):
        for cls_ind, cls in enumerate(VOC_CLASSES):
            filename = self._get_voc_results_file_template().format(cls)
            with open(filename, "wt") as f:
                for im_ind, index in enumerate(self.ids):
                    index = index[1]
                    dets = all_boxes[cls_ind][im_ind]
                    if len(dets) == 0:
                        continue
                    for k in range(dets.shape[0]):
                        f.write(
                            "{:s} {:.3f} {:.1f} {:.1f} {:.1f} {:.1f}\n".format(
                                index, dets[k, -1],
                                dets[k, 0] + 1, dets[k, 1] + 1,
                                dets[k, 2] + 1, dets[k, 3] + 1,
                            )
                        )

    def _do_python_eval(self, output_dir="output", iou=0.5):
        rootpath = os.path.join(self.root, "VOC" + self._year)
        name = self.image_set[0][1]
        annopath = os.path.join(rootpath, "Annotations", "{:s}.xml")
        imagesetfile = os.path.join(
            rootpath, "ImageSets", "Main", name + ".txt"
        )
        cachedir = os.path.join(
            self.root, "annotations_cache", "VOC" + self._year, name
        )
        os.makedirs(cachedir, exist_ok=True)
        aps = []
        use_07_metric = int(self._year) < 2010
        if output_dir is not None and not os.path.isdir(output_dir):
            os.mkdir(output_dir)
        for i, cls in enumerate(VOC_CLASSES):
            filename = self._get_voc_results_file_template().format(cls)
            rec, prec, ap = voc_eval(
                filename, annopath, imagesetfile, cls, cachedir,
                ovthresh=iou, use_07_metric=use_07_metric,
            )
            aps += [ap]
            if iou == 0.5:
                print("AP for {} = {:.4f}".format(cls, ap))
            if output_dir is not None:
                with open(
                    os.path.join(output_dir, cls + "_pr.pkl"), "wb"
                ) as f:
                    pickle.dump({"rec": rec, "prec": prec, "ap": ap}, f)
        if iou == 0.5:
            print("Mean AP = {:.4f}".format(np.mean(aps)))
        return np.mean(aps)
