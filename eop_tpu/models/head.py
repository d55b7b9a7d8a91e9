"""Decoupled YOLOX heads (bbox and 24-point) + pure decode functions.

Parity targets: `YOLOXHead` (`/root/reference/yolox/models/yolo_head.py:18-251`)
and the 26-channel 24p variant
(`/root/reference/yolox_24p/models/yolo_head_24p.py:16-256`).

TPU-first re-design:
* the flax module computes only the conv trunk — per-scale raw (reg, obj,
  cls) maps.  Grid decode, sigmoid, loss and SimOTA are *pure functions*
  over those maps, so one jitted train step owns everything and XLA fuses
  decode into the head's last conv.  (The reference buries the whole loss
  inside ``head.forward`` and caches grids as module state.)
* grids/strides are computed from static shapes at trace time — no cached
  buffers, no ``device='cuda'`` pinning (ref `yolo_head_24p.py:176`).
* class/objectness prior-prob bias init (-log((1-p)/p), ref
  `initialize_biases:132-141`) is declared at construction.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.blocks import BaseConv, DWConv

Dtype = Any


def _prior_bias(prior_prob: float):
    value = -math.log((1.0 - prior_prob) / prior_prob)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


class YOLOXHead(nn.Module):
    """Decoupled head; ``reg_dim=4`` is the bbox head, ``reg_dim=26`` the
    24-point head (center xy + 24 radii).

    ``__call__`` returns a list (one per FPN scale) of raw NHWC maps with
    channels ordered ``[reg(reg_dim), obj(1), cls(num_classes)]`` — the
    reference's channel order, undecoded and un-sigmoided.
    """

    num_classes: int = 80
    width: float = 1.0
    strides: Sequence[int] = (8, 16, 32)
    in_channels: Sequence[int] = (256, 512, 1024)
    act: str = "silu"
    depthwise: bool = False
    reg_dim: int = 4
    prior_prob: float = 1e-2
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, xin: Sequence[jnp.ndarray], train: bool = False):
        hidden = int(256 * self.width)
        Conv = DWConv if self.depthwise else BaseConv
        kw = dict(act=self.act, dtype=self.dtype, bn_axis_name=self.bn_axis_name)

        def pred_conv(features, name, bias_init=nn.initializers.zeros):
            return nn.Conv(
                features, (1, 1), use_bias=True, bias_init=bias_init,
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )

        outputs = []
        for k in range(len(self.in_channels)):
            x = BaseConv(hidden, 1, 1, name=f"stem_{k}", **kw)(xin[k], train)

            cls_feat = Conv(hidden, 3, 1, name=f"cls_conv_{k}_0", **kw)(x, train)
            cls_feat = Conv(hidden, 3, 1, name=f"cls_conv_{k}_1", **kw)(cls_feat, train)
            cls_out = pred_conv(self.num_classes, f"cls_pred_{k}",
                                _prior_bias(self.prior_prob))(cls_feat)

            reg_feat = Conv(hidden, 3, 1, name=f"reg_conv_{k}_0", **kw)(x, train)
            reg_feat = Conv(hidden, 3, 1, name=f"reg_conv_{k}_1", **kw)(reg_feat, train)
            obj_out = pred_conv(1, f"obj_pred_{k}",
                                _prior_bias(self.prior_prob))(reg_feat)
            reg_out = pred_conv(self.reg_dim, f"reg_pred_{k}")(reg_feat)

            outputs.append(
                jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
            )
        return outputs


def make_grids_and_strides(
    hw: Sequence[Tuple[int, int]], strides: Sequence[int], dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Anchor-point grid per scale, flattened and concatenated.

    Returns ``grids [A, 2]`` (x, y cell indices, row-major per scale — the
    reference's meshgrid order, `yolo_head.py:239-247`) and
    ``strides_flat [A]``.
    """
    grid_list, stride_list = [], []
    for (h, w), s in zip(hw, strides):
        xv, yv = np.meshgrid(np.arange(w), np.arange(h))  # row-major
        grid = np.stack([xv, yv], axis=-1).reshape(-1, 2)
        grid_list.append(grid)
        stride_list.append(np.full((grid.shape[0],), s))
    grids = jnp.asarray(np.concatenate(grid_list, 0), dtype)
    strides_flat = jnp.asarray(np.concatenate(stride_list, 0), dtype)
    return grids, strides_flat


def flatten_head_outputs(outputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Per-scale NHWC maps -> one [B, A, C] tensor (scale-major, row-major
    within each scale — matching the reference's flatten order)."""
    flats = [o.reshape(o.shape[0], -1, o.shape[-1]) for o in outputs]
    return jnp.concatenate(flats, axis=1)


def decode_outputs(
    flat: jnp.ndarray,
    grids: jnp.ndarray,
    strides: jnp.ndarray,
    reg_dim: int = 4,
    apply_sigmoid: bool = True,
) -> jnp.ndarray:
    """Grid decode: ``xy = (p + grid)·stride``; sizes/radii ``= exp(p)·stride``
    (ref `decode_outputs`, `yolo_head.py:236-251` / `yolo_head_24p.py:239-256`).

    ``apply_sigmoid`` applies sigmoid to obj/cls (inference path); the
    training path decodes reg only and keeps obj/cls as logits.
    """
    s = strides[None, :, None]
    xy = (flat[..., :2] + grids[None]) * s
    # exp clamp: raw logits can spike early in training; exp(>88) is inf in
    # f32 and its square NaNs the circle/box losses.  ±30 cannot alter any
    # legitimate box (log(640/8) ≈ 4.4) but keeps exp and exp² finite.
    sizes = jnp.exp(jnp.clip(flat[..., 2:reg_dim], -30.0, 30.0)) * s
    rest = flat[..., reg_dim:]
    if apply_sigmoid:
        rest = jax.nn.sigmoid(rest)
    return jnp.concatenate([xy, sizes, rest], axis=-1)
