"""Host-side augmentation pipeline (bbox family): numpy + cv2, NHWC.

Capability parity with `/root/reference/yolox/data/data_augment.py:21-245`
(HSV jitter, random affine, horizontal mirror, top-left letterbox with pad
114, Train/Val transforms producing ``[max_labels, 5]`` rows of
``[cls, cx, cy, w, h]``), with an independent design:

- the affine is composed from explicit homogeneous matrices
  (translate @ shear @ rotation-scale) instead of patched cv2 rows;
- HSV jitter applies per-channel 256-entry lookup tables;
- box warping runs on an ``[N, 4, 2]`` corner tensor;
- images stay HWC end-to-end (no CHW swap — a torch-ism);
- all randomness flows through an explicit ``np.random.Generator`` so the
  pipeline is reproducible and per-worker seedable (the reference draws
  from the global ``random`` module).

The letterbox (`preproc`) keeps bit-identical output with the reference —
pinned by `tests/test_e2e_fixture.py`.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import cv2
import numpy as np

_PAD_VALUE = 114
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def xyxy2cxcywh_np(bboxes: np.ndarray) -> np.ndarray:
    """Corner boxes -> center boxes, out of place."""
    out = np.empty_like(bboxes)
    out[:, 2:4] = bboxes[:, 2:4] - bboxes[:, 0:2]
    out[:, 0:2] = bboxes[:, 0:2] + 0.5 * out[:, 2:4]
    if bboxes.shape[1] > 4:
        out[:, 4:] = bboxes[:, 4:]
    return out


# ---------------------------------------------------------------------------
# photometric
# ---------------------------------------------------------------------------

def augment_hsv(img, rng: np.random.Generator, hgain=5, sgain=30, vgain=30):
    """In-place additive HSV jitter.

    Each channel independently gets a 50% chance of a uniform offset in
    ±gain (hue wraps mod 180, sat/val saturate), applied through lookup
    tables on the uint8 HSV planes.

    Documented divergence from the reference (`data_augment.py:21-34`):
    when all three deltas truncate to zero (~17% of calls) this returns
    the image untouched, while the reference still runs the lossy uint8
    BGR→HSV→BGR round-trip and so stamps hue-quantization noise onto a
    no-op jitter.  Skipping is both faster and strictly less lossy; the
    nonzero-delta outputs are byte-identical to the reference's.
    """
    deltas = (
        rng.uniform(-1.0, 1.0, 3) * (hgain, sgain, vgain)
        * rng.integers(0, 2, 3)
    ).astype(np.int16)
    if not deltas.any():
        return
    ramp = np.arange(256, dtype=np.int16)
    tables = (
        ((ramp + deltas[0]) % 180).astype(np.uint8),
        np.clip(ramp + deltas[1], 0, 255).astype(np.uint8),
        np.clip(ramp + deltas[2], 0, 255).astype(np.uint8),
    )
    # one 3-channel LUT call (cv2 applies column c to channel c) — same
    # bytes as per-plane split/LUT/merge, ~1 ms less per 640² image
    lut3 = np.stack(tables, axis=-1).reshape(1, 256, 3)
    jittered = cv2.LUT(cv2.cvtColor(img, cv2.COLOR_BGR2HSV), lut3)
    cv2.cvtColor(jittered, cv2.COLOR_HSV2BGR, dst=img)


# ---------------------------------------------------------------------------
# geometric
# ---------------------------------------------------------------------------

def get_aug_params(value, rng: np.random.Generator, center=0.0):
    """Uniform draw in ``center ± value`` (scalar) or ``[lo, hi]`` (pair)."""
    if isinstance(value, (int, float)):
        lo, hi = center - value, center + value
    elif len(value) == 2:
        lo, hi = value
    else:
        raise ValueError(
            "Affine params should be either a sequence of two values or a "
            f"single float. Got {value}"
        )
    return rng.uniform(lo, hi)


def _rot_scale_mat(angle_deg: float, scale: float) -> np.ndarray:
    """Homogeneous rotation(+CCW angle)·scale about the origin."""
    c = scale * math.cos(math.radians(angle_deg))
    s = scale * math.sin(math.radians(angle_deg))
    return np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])


def _shear_mat(shear_x_deg: float, shear_y_deg: float) -> np.ndarray:
    return np.array([
        [1.0, math.tan(math.radians(shear_y_deg)), 0.0],
        [math.tan(math.radians(shear_x_deg)), 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ])


def get_affine_matrix(target_size, rng, degrees=10, translate=0.1,
                      scales=0.1, shear=10):
    """Sample a 2x3 affine: shear∘(rotation·scale), then translate by a
    fraction of the target extent."""
    angle = get_aug_params(degrees, rng)
    scale = get_aug_params(scales, rng, center=1.0)
    if scale <= 0.0:
        raise ValueError("Argument scale should be positive")
    warp = _shear_mat(
        get_aug_params(shear, rng), get_aug_params(shear, rng)
    ) @ _rot_scale_mat(angle, scale)
    warp[0, 2] = get_aug_params(translate, rng) * target_size[0]
    warp[1, 2] = get_aug_params(translate, rng) * target_size[1]
    return warp[:2], scale


def apply_affine_to_bboxes(targets, target_size, M):
    """Warp all 4 corners of each box, take the axis-aligned hull, clip."""
    quad = targets[:, [[0, 1], [2, 3], [0, 3], [2, 1]]]  # [N, 4, 2]
    warped = quad @ M[:, :2].T + M[:, 2]
    hull = np.concatenate([warped.min(axis=1), warped.max(axis=1)], axis=1)
    limit = np.asarray(target_size, dtype=hull.dtype)
    targets[:, :4] = np.clip(hull, 0.0, np.tile(limit, 2))
    return targets


def random_affine(img, targets=(), target_size=(640, 640), degrees=10,
                  translate=0.1, scales=0.1, shear=10,
                  rng: Optional[np.random.Generator] = None):
    rng = rng or np.random.default_rng()
    M, _ = get_affine_matrix(target_size, rng, degrees, translate,
                             scales, shear)
    img = cv2.warpAffine(
        img, M, dsize=target_size, borderValue=(_PAD_VALUE,) * 3
    )
    if len(targets) > 0:
        targets = apply_affine_to_bboxes(targets, target_size, M)
    return img, targets


def mirror(image, boxes, prob, rng: np.random.Generator):
    """Horizontal flip of image and xyxy boxes with probability ``prob``."""
    if rng.random() < prob:
        width = image.shape[1]
        image = image[:, ::-1]
        flipped = boxes.copy()
        flipped[:, 0] = width - boxes[:, 2]
        flipped[:, 2] = width - boxes[:, 0]
        boxes = flipped
    return image, boxes


def preproc(img, input_size) -> Tuple[np.ndarray, float]:
    """Letterbox: scale to fit, paste top-left on a 114-gray canvas, float32
    HWC.  Bit-identical to the reference letterbox (minus its CHW swap)."""
    r = min(input_size[0] / img.shape[0], input_size[1] / img.shape[1])
    if r == 1.0 and img.shape[:2] == tuple(input_size[:2]):
        # already letterbox-sized (every post-mosaic sample): identity
        # resize + full-canvas paste would copy the image twice for the
        # same bytes
        return np.ascontiguousarray(img, dtype=np.float32), r
    channels = (3,) if img.ndim == 3 else ()
    canvas = np.full((*input_size[:2], *channels), _PAD_VALUE, dtype=np.uint8)
    scaled = cv2.resize(
        img,
        (int(img.shape[1] * r), int(img.shape[0] * r)),
        interpolation=cv2.INTER_LINEAR,
    ).astype(np.uint8)
    canvas[: scaled.shape[0], : scaled.shape[1]] = scaled
    return np.ascontiguousarray(canvas, dtype=np.float32), r


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def _pad_rows(rows: np.ndarray, capacity: int, width: int) -> np.ndarray:
    out = np.zeros((capacity, width), dtype=np.float32)
    n = min(len(rows), capacity)
    out[:n] = rows[:n]
    return out


class TrainTransform:
    """HSV + flip + letterbox; emits ``[max_labels, 5]`` rows of
    ``[cls, cx, cy, w, h]`` in letterboxed absolute pixels.

    Degenerate boxes (min side <= 1 px post-scale) are dropped; if that
    drops everything, the unaugmented image and its full label set are
    returned instead so no sample ever trains empty.
    """

    def __init__(self, max_labels=50, flip_prob=0.5, hsv_prob=1.0,
                 seed: Optional[int] = None):
        self.max_labels = max_labels
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob
        self.rng = np.random.default_rng(seed)

    def reseed(self, seed):
        self.rng = np.random.default_rng(seed)

    def __call__(self, image, targets, input_dim):
        if len(targets) == 0:
            image, _ = preproc(image, input_dim)
            return image, np.zeros((self.max_labels, 5), dtype=np.float32)

        # snapshot for the all-degenerate fallback
        original = (image.copy(), xyxy2cxcywh_np(targets[:, :4]),
                    targets[:, 4].copy())

        if self.rng.random() < self.hsv_prob:
            augment_hsv(image, self.rng)
        image, boxes = mirror(image, targets[:, :4].copy(),
                              self.flip_prob, self.rng)
        image, ratio = preproc(image, input_dim)
        boxes = xyxy2cxcywh_np(boxes) * ratio
        classes = targets[:, 4]

        healthy = boxes[:, 2:4].min(axis=1) > 1
        boxes, classes = boxes[healthy], classes[healthy]
        if len(boxes) == 0:
            image, ratio = preproc(original[0], input_dim)
            boxes, classes = original[1] * ratio, original[2]

        rows = np.concatenate([classes[:, None], boxes], axis=1)
        return image, _pad_rows(rows, self.max_labels, 5)


class ValTransform:
    """Letterbox only; optional legacy 0-1 + ImageNet normalization.
    NHWC; legacy mode also flips BGR -> RGB."""

    def __init__(self, legacy: bool = False):
        self.legacy = legacy

    def __call__(self, img, res, input_size):
        img, _ = preproc(img, input_size)
        if self.legacy:
            img = img[:, :, ::-1] / 255.0
            img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
            img = np.ascontiguousarray(img, dtype=np.float32)
        return img, np.zeros((1, 5), dtype=np.float32)
