"""Image preprocessing: letterbox resize (host and on-device variants).

Parity target: `preproc` (`/root/reference/yolox/data/data_augment.py:144-160`)
— scale by ``r = min(H/h, W/w)`` (bilinear), paste top-left on a
114-valued canvas, no normalization (the reference's ValTransform legacy
normalization is off by default).

The on-device variant runs inside jit so eval/bench pipelines can fuse
preprocessing with the model (north-star requirement); it uses
``jax.image.resize`` bilinear which matches cv2.INTER_LINEAR
(half-pixel centers) to ~1e-6.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp

PAD_VALUE = 114.0


def letterbox(img: np.ndarray, input_size: Tuple[int, int], swap=None):
    """Host-side letterbox. img HWC uint8/float BGR, input_size (H, W).

    Returns (padded float32 HWC, ratio). Channel order untouched (NHWC
    end-to-end; the reference's CHW ``swap`` is a torch-ism).
    """
    h, w = img.shape[:2]
    in_h, in_w = input_size
    padded = np.full((in_h, in_w, 3), PAD_VALUE, dtype=np.float32)
    r = min(in_h / h, in_w / w)
    nh, nw = int(h * r), int(w * r)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    padded[:nh, :nw] = resized.astype(np.float32)
    return padded, r


def letterbox_batch_device(imgs, src_hw, input_size: Tuple[int, int]):
    """On-device letterbox for a batch of same-shape images.

    Args:
      imgs: [B, H, W, 3] float; src_hw: static (H, W) of the source;
      input_size: static (H', W') target.
    Returns ([B, H', W', 3], ratio float).
    Jit-compatible (all shapes static).
    """
    h, w = src_hw
    in_h, in_w = input_size
    r = min(in_h / h, in_w / w)
    nh, nw = int(h * r), int(w * r)
    resized = jax.image.resize(
        imgs, (imgs.shape[0], nh, nw, 3), method="bilinear"
    )
    padded = jnp.full(
        (imgs.shape[0], in_h, in_w, 3), PAD_VALUE, dtype=imgs.dtype
    )
    padded = padded.at[:, :nh, :nw, :].set(resized)
    return padded, r
