"""Top-level YOLOX model wrapper + the functional forward helpers.

Parity targets: `YOLOX` (`/root/reference/yolox/models/yolox.py:11-49`,
returns ``(outputs, fpn_outs)`` so the feature-map harness can inspect the
neck) and the 24p variant (`yolox_24p/models/yolox.py:7-34`).

Here the module's ``__call__`` always returns
``(head_raw_outputs, fpn_outs)`` — raw per-scale maps plus the 6-tuple
(pan_out2, pan_out1, pan_out0, x2, x1, x0).  Decode / loss are pure
functions (see `head.py`, `eop_tpu.losses`) applied by the caller; this is
what lets a single ``jax.jit`` own forward+loss+grad on TPU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .head import (
    YOLOXHead,
    decode_outputs,
    flatten_head_outputs,
    make_grids_and_strides,
)
from .pafpn import YOLOFPN, YOLOPAFPN

Dtype = Any


class YOLOX(nn.Module):
    """Backbone(neck) -> head composition."""

    backbone_type: str = "darknet"
    depth: float = 1.0
    width: float = 1.0
    num_classes: int = 80
    act: str = "silu"
    depthwise: bool = False
    reg_dim: int = 4  # 4 = bbox head; 26 = 24-point head
    strides: Sequence[int] = (8, 16, 32)
    in_channels: Sequence[int] = (256, 512, 1024)
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    # Gradient checkpointing of the backbone+neck: trades ~30% step time
    # for activation memory (jax.checkpoint / nn.remat) — enables larger
    # per-chip batches at 640px.
    remat: bool = False
    # Run the sub-128-channel early backbone stages in the space-to-depth
    # packed layout (ops/packed.py) — TPU MXU-lane optimization, exact.
    # False | True | "train" (packed layout for training calls only; the
    # parameters are layout-independent).
    packed_early: bool | str = False
    # leading packed stages when packed_early engages (2 = stem+dark2;
    # 3 = +dark3, the width-0.5 lane-boundary experiment)
    packed_depth: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        Backbone = (
            nn.remat(YOLOPAFPN, static_argnums=(2,))
            if self.remat
            else YOLOPAFPN
        )
        fpn_outs = Backbone(
            backbone_type=self.backbone_type,
            depth=self.depth,
            width=self.width,
            in_channels=self.in_channels,
            depthwise=self.depthwise,
            act=self.act,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            packed_early=self.packed_early,
            packed_depth=self.packed_depth,
            name="backbone",
        )(x, train)
        head_outs = YOLOXHead(
            num_classes=self.num_classes,
            width=self.width,
            strides=self.strides,
            in_channels=self.in_channels,
            act=self.act,
            depthwise=self.depthwise,
            reg_dim=self.reg_dim,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="head",
        )(fpn_outs[:3], train)
        return head_outs, fpn_outs


class YOLOv3(nn.Module):
    """YOLOFPN + YOLOXHead with lrelu / depthwise config — the `yolov3` exp
    (`/root/reference/exps/default/yolov3.py:19-37`)."""

    num_classes: int = 80
    width: float = 1.0
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        fpn_outs = YOLOFPN(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                           name="backbone")(x, train)
        head_outs = YOLOXHead(
            num_classes=self.num_classes,
            width=self.width,
            in_channels=(128, 256, 512),
            act="lrelu",
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="head",
        )(fpn_outs, train)
        return head_outs, fpn_outs


def head_hw(head_outs: Sequence[jnp.ndarray]):
    """Static (H, W) list of the head's per-scale maps."""
    return [o.shape[1:3] for o in head_outs]


def inference_outputs(
    head_outs: Sequence[jnp.ndarray],
    strides: Sequence[int] = (8, 16, 32),
    reg_dim: int = 4,
    out_dtype=None,
) -> jnp.ndarray:
    """Raw per-scale maps -> decoded [B, A, reg_dim+1+C] predictions with
    sigmoided obj/cls (the reference's eval forward,
    `yolo_head.py:187-213`).

    ``out_dtype`` folds the postprocess upcast into the decode pass
    (pass float32) instead of spending a separate full [B, A, C] HBM
    round trip on ``decoded.astype`` afterwards.
    """
    flat = flatten_head_outputs(head_outs)
    if out_dtype is not None:
        flat = flat.astype(out_dtype)
    grids, strides_flat = make_grids_and_strides(
        head_hw(head_outs), strides, flat.dtype
    )
    return decode_outputs(flat, grids, strides_flat, reg_dim,
                          apply_sigmoid=True)


def training_outputs(
    head_outs: Sequence[jnp.ndarray],
    strides: Sequence[int] = (8, 16, 32),
    reg_dim: int = 4,
):
    """Raw maps -> (decoded-reg outputs [B,A,C] with logit obj/cls,
    raw reg [B,A,reg_dim] for the L1 loss, grids [A,2], strides [A]) —
    the training-path quantities of `get_output_and_grid`
    (`yolo_head.py:216-234`)."""
    flat = flatten_head_outputs(head_outs)
    grids, strides_flat = make_grids_and_strides(
        head_hw(head_outs), strides, flat.dtype
    )
    decoded = decode_outputs(flat, grids, strides_flat, reg_dim,
                             apply_sigmoid=False)
    origin_reg = flat[..., :reg_dim]
    return decoded, origin_reg, grids, strides_flat
