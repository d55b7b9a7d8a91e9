"""COCO detection dataset (torch-free, own COCO API).

Parity target: `/root/reference/yolox/data/datasets/coco.py` — pre-scaled
xyxy+cls annotations, pre-resized image loading, optional np.memmap image
cache, ``remove_useless_info`` RAM saver.
"""

from __future__ import annotations

import os
from multiprocessing.pool import ThreadPool

import cv2
import numpy as np

from .coco_api import COCO
from .datasets_wrapper import Dataset


def get_datadir() -> str:
    """Dataset root: $EOP_DATADIR or <repo>/datasets
    (ref `get_yolox_datadir`, dataloading.py:19-30)."""
    datadir = os.getenv("EOP_DATADIR") or os.getenv("YOLOX_DATADIR")
    if datadir is None:
        import eop_tpu

        pkg_root = os.path.dirname(os.path.dirname(eop_tpu.__file__))
        datadir = os.path.join(pkg_root, "datasets")
    return datadir


def remove_useless_info(coco: COCO):
    """Strip segmentation/licenses to save ~30% RAM (ref `:16-31`)."""
    dataset = coco.dataset
    dataset.pop("info", None)
    dataset.pop("licenses", None)
    for img in dataset.get("images", []):
        img.pop("license", None)
        img.pop("coco_url", None)
        img.pop("date_captured", None)
        img.pop("flickr_url", None)
    for anno in dataset.get("annotations", []):
        anno.pop("segmentation", None)


class COCODataset(Dataset):
    """COCO dataset (ref `COCODataset:34-233`)."""

    def __init__(
        self,
        data_dir=None,
        json_file="instances_train2017.json",
        name="train2017",
        img_size=(416, 416),
        preproc=None,
        cache=False,
    ):
        super().__init__(img_size)
        if data_dir is None:
            data_dir = os.path.join(get_datadir(), "COCO")
        self.data_dir = data_dir
        self.json_file = json_file

        self.coco = COCO(os.path.join(data_dir, "annotations", json_file))
        remove_useless_info(self.coco)
        self.ids = self.coco.getImgIds()
        self.class_ids = sorted(self.coco.getCatIds())
        cats = self.coco.loadCats(self.coco.getCatIds())
        self._classes = tuple(c["name"] for c in cats)
        self.imgs = None
        self.name = name
        self.img_size = img_size
        self.preproc = preproc
        self.annotations = [self.load_anno_from_ids(i) for i in self.ids]
        if cache:
            self._cache_images()

    def __len__(self):
        return len(self.ids)

    def _cache_images(self):
        """np.memmap cache of pre-resized images (ref `:86-133`)."""
        max_h, max_w = self.img_size
        cache_file = os.path.join(
            self.data_dir, f"img_resized_cache_{self.name}.array"
        )
        if not os.path.exists(cache_file):
            self.imgs = np.memmap(
                cache_file,
                shape=(len(self.ids), max_h, max_w, 3),
                dtype=np.uint8,
                mode="w+",
            )
            n_threads = min(8, os.cpu_count() or 1)
            loaded = ThreadPool(n_threads).imap(
                self.load_resized_img, range(len(self.annotations))
            )
            for k, out in enumerate(loaded):
                self.imgs[k][: out.shape[0], : out.shape[1], :] = out.copy()
            self.imgs.flush()
        self.imgs = np.memmap(
            cache_file,
            shape=(len(self.ids), max_h, max_w, 3),
            dtype=np.uint8,
            mode="r+",
        )

    def load_anno_from_ids(self, id_):
        im_ann = self.coco.loadImgs(id_)[0]
        width = im_ann["width"]
        height = im_ann["height"]
        anno_ids = self.coco.getAnnIds(imgIds=[int(id_)], iscrowd=False)
        annotations = self.coco.loadAnns(anno_ids)
        objs = []
        for obj in annotations:
            x1 = np.max((0, obj["bbox"][0]))
            y1 = np.max((0, obj["bbox"][1]))
            x2 = np.min((width, x1 + np.max((0, obj["bbox"][2]))))
            y2 = np.min((height, y1 + np.max((0, obj["bbox"][3]))))
            if obj["area"] > 0 and x2 >= x1 and y2 >= y1:
                obj["clean_bbox"] = [x1, y1, x2, y2]
                objs.append(obj)

        res = np.zeros((len(objs), 5))
        for ix, obj in enumerate(objs):
            res[ix, 0:4] = obj["clean_bbox"]
            res[ix, 4] = self.class_ids.index(obj["category_id"])

        r = min(self.img_size[0] / height, self.img_size[1] / width)
        res[:, :4] *= r
        img_info = (height, width)
        resized_info = (int(height * r), int(width * r))
        file_name = im_ann.get("file_name", f"{id_:012}.jpg")
        return (res, img_info, resized_info, file_name)

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
        file_name = self.annotations[index][3]
        img_file = os.path.join(self.data_dir, self.name, file_name)
        img = cv2.imread(img_file)
        assert img is not None, f"image {img_file} not found"
        return img

    def pull_item(self, index):
        id_ = self.ids[index]
        res, img_info, resized_info, _ = self.annotations[index]
        if self.imgs is not None:
            pad_img = self.imgs[index]
            img = pad_img[: resized_info[0], : resized_info[1], :].copy()
        else:
            img = self.load_resized_img(index)
        return img, res.copy(), img_info, np.array([id_])

    @Dataset.mosaic_getitem
    def __getitem__(self, index):
        img, target, img_info, img_id = self.pull_item(index)
        if self.preproc is not None:
            img, target = self.preproc(img, target, self.input_dim)
        return img, target, img_info, img_id
