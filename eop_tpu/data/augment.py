"""Host-side augmentation pipeline (bbox family), numpy + cv2, NHWC.

Parity target: `/root/reference/yolox/data/data_augment.py` — HSV jitter,
random affine (rotation/scale/shear/translate), horizontal mirror,
letterbox ``preproc`` (top-left aligned, pad 114), `TrainTransform`
(labels -> padded ``[max_labels, 5]`` rows of ``[cls, cx, cy, w, h]``) and
`ValTransform`.

Differences by design: images stay HWC/NHWC end-to-end (no CHW ``swap`` —
a torch-ism), and every random draw goes through an explicit
``np.random.Generator`` so the pipeline is reproducible and per-worker
seedable (the reference leans on the global ``random`` module).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import cv2
import numpy as np


def xyxy2cxcywh_np(bboxes: np.ndarray) -> np.ndarray:
    bboxes = bboxes.copy()
    bboxes[:, 2] = bboxes[:, 2] - bboxes[:, 0]
    bboxes[:, 3] = bboxes[:, 3] - bboxes[:, 1]
    bboxes[:, 0] = bboxes[:, 0] + bboxes[:, 2] * 0.5
    bboxes[:, 1] = bboxes[:, 1] + bboxes[:, 3] * 0.5
    return bboxes


def augment_hsv(img, rng: np.random.Generator, hgain=5, sgain=30, vgain=30):
    """In-place HSV jitter (ref `augment_hsv:21-31`)."""
    hsv_augs = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain]
    hsv_augs *= rng.integers(0, 2, 3)
    hsv_augs = hsv_augs.astype(np.int16)
    img_hsv = cv2.cvtColor(img, cv2.COLOR_BGR2HSV).astype(np.int16)
    img_hsv[..., 0] = (img_hsv[..., 0] + hsv_augs[0]) % 180
    img_hsv[..., 1] = np.clip(img_hsv[..., 1] + hsv_augs[1], 0, 255)
    img_hsv[..., 2] = np.clip(img_hsv[..., 2] + hsv_augs[2], 0, 255)
    cv2.cvtColor(img_hsv.astype(img.dtype), cv2.COLOR_HSV2BGR, dst=img)


def get_aug_params(value, rng: np.random.Generator, center=0.0):
    if isinstance(value, (int, float)):
        return rng.uniform(center - value, center + value)
    if len(value) == 2:
        return rng.uniform(value[0], value[1])
    raise ValueError(
        "Affine params should be either a sequence of two values or a "
        f"single float. Got {value}"
    )


def get_affine_matrix(target_size, rng, degrees=10, translate=0.1,
                      scales=0.1, shear=10):
    """Rotation+scale+shear+translate matrix (ref `get_affine_matrix:48-81`)."""
    twidth, theight = target_size
    angle = get_aug_params(degrees, rng)
    scale = get_aug_params(scales, rng, center=1.0)
    if scale <= 0.0:
        raise ValueError("Argument scale should be positive")
    R = cv2.getRotationMatrix2D(angle=angle, center=(0, 0), scale=scale)
    M = np.ones([2, 3])
    shear_x = math.tan(get_aug_params(shear, rng) * math.pi / 180)
    shear_y = math.tan(get_aug_params(shear, rng) * math.pi / 180)
    M[0] = R[0] + shear_y * R[1]
    M[1] = R[1] + shear_x * R[0]
    M[0, 2] = get_aug_params(translate, rng) * twidth
    M[1, 2] = get_aug_params(translate, rng) * theight
    return M, scale


def apply_affine_to_bboxes(targets, target_size, M):
    """Warp box corners, re-box, clip (ref `apply_affine_to_bboxes:84-113`)."""
    num_gts = len(targets)
    twidth, theight = target_size
    corner_points = np.ones((4 * num_gts, 3))
    corner_points[:, :2] = targets[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(
        4 * num_gts, 2
    )
    corner_points = corner_points @ M.T
    corner_points = corner_points.reshape(num_gts, 8)
    xs = corner_points[:, 0::2]
    ys = corner_points[:, 1::2]
    new_bboxes = (
        np.concatenate((xs.min(1), ys.min(1), xs.max(1), ys.max(1)))
        .reshape(4, num_gts)
        .T
    )
    new_bboxes[:, 0::2] = new_bboxes[:, 0::2].clip(0, twidth)
    new_bboxes[:, 1::2] = new_bboxes[:, 1::2].clip(0, theight)
    targets[:, :4] = new_bboxes
    return targets


def random_affine(img, targets=(), target_size=(640, 640), degrees=10,
                  translate=0.1, scales=0.1, shear=10,
                  rng: Optional[np.random.Generator] = None):
    rng = rng or np.random.default_rng()
    M, scale = get_affine_matrix(target_size, rng, degrees, translate,
                                 scales, shear)
    img = cv2.warpAffine(img, M, dsize=target_size,
                         borderValue=(114, 114, 114))
    if len(targets) > 0:
        targets = apply_affine_to_bboxes(targets, target_size, M)
    return img, targets


def mirror(image, boxes, prob, rng: np.random.Generator):
    """Horizontal flip (ref `_mirror:136-141`)."""
    _, width, _ = image.shape
    if rng.random() < prob:
        image = image[:, ::-1]
        boxes = boxes.copy()
        boxes[:, 0::2] = width - boxes[:, 2::-2]
    return image, boxes


def preproc(img, input_size) -> Tuple[np.ndarray, float]:
    """Letterbox: top-left aligned, pad 114, float32 HWC
    (ref `preproc:144-160`, minus the CHW swap)."""
    if len(img.shape) == 3:
        padded_img = np.ones(
            (input_size[0], input_size[1], 3), dtype=np.uint8
        ) * 114
    else:
        padded_img = np.ones(input_size, dtype=np.uint8) * 114
    r = min(input_size[0] / img.shape[0], input_size[1] / img.shape[1])
    resized = cv2.resize(
        img,
        (int(img.shape[1] * r), int(img.shape[0] * r)),
        interpolation=cv2.INTER_LINEAR,
    ).astype(np.uint8)
    padded_img[: int(img.shape[0] * r), : int(img.shape[1] * r)] = resized
    return np.ascontiguousarray(padded_img, dtype=np.float32), r


class TrainTransform:
    """HSV + flip + letterbox; labels -> [max_labels, 5] of
    [cls, cx, cy, w, h] absolute pixels (ref `TrainTransform:163-212`)."""

    def __init__(self, max_labels=50, flip_prob=0.5, hsv_prob=1.0,
                 seed: Optional[int] = None):
        self.max_labels = max_labels
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob
        self.rng = np.random.default_rng(seed)

    def reseed(self, seed):
        self.rng = np.random.default_rng(seed)

    def __call__(self, image, targets, input_dim):
        boxes = targets[:, :4].copy()
        labels = targets[:, 4].copy()
        if len(boxes) == 0:
            targets = np.zeros((self.max_labels, 5), dtype=np.float32)
            image, _ = preproc(image, input_dim)
            return image, targets

        image_o = image.copy()
        boxes_o = xyxy2cxcywh_np(targets[:, :4])
        labels_o = targets[:, 4].copy()

        if self.rng.random() < self.hsv_prob:
            augment_hsv(image, self.rng)
        image_t, boxes = mirror(image, boxes, self.flip_prob, self.rng)
        image_t, r_ = preproc(image_t, input_dim)
        boxes = xyxy2cxcywh_np(boxes)
        boxes *= r_

        mask_b = np.minimum(boxes[:, 2], boxes[:, 3]) > 1
        boxes_t = boxes[mask_b]
        labels_t = labels[mask_b]

        if len(boxes_t) == 0:
            image_t, r_o = preproc(image_o, input_dim)
            boxes_t = boxes_o * r_o
            labels_t = labels_o

        targets_t = np.hstack((np.expand_dims(labels_t, 1), boxes_t))
        padded_labels = np.zeros((self.max_labels, 5), dtype=np.float32)
        padded_labels[: min(len(targets_t), self.max_labels)] = targets_t[
            : self.max_labels
        ]
        return image_t, np.ascontiguousarray(padded_labels, np.float32)


class ValTransform:
    """Letterbox only; optional legacy 0-1 + ImageNet normalization
    (ref `ValTransform:215-245`). NHWC, RGB flip under legacy."""

    def __init__(self, legacy: bool = False):
        self.legacy = legacy

    def __call__(self, img, res, input_size):
        img, _ = preproc(img, input_size)
        if self.legacy:
            img = img[:, :, ::-1].copy()  # BGR -> RGB
            img /= 255.0
            img -= np.array([0.485, 0.456, 0.406]).reshape(1, 1, 3)
            img /= np.array([0.229, 0.224, 0.225]).reshape(1, 1, 3)
        return img, np.zeros((1, 5), dtype=np.float32)
