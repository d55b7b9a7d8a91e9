"""PAN feature pyramid necks (NHWC flax).

Parity targets:
* `YOLOPAFPN` with swappable backbone and 6-tuple output (fpn outs + raw
  backbone taps for the feature-map study) —
  `/root/reference/yolox/models/yolo_pafpn.py:15-128`; the 24p variant
  (`yolox_24p/models/yolo_pafpn.py`) is the same network returning only the
  3 FPN maps, which callers get by slicing the tuple.
* `YOLOFPN`, the classic YOLOv3 neck over Darknet-53 —
  `/root/reference/yolox/models/yolo_fpn.py:12-84`.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import BaseConv, CSPLayer, DWConv
from .darknet import CSPDarknet, Darknet
from .densenet import densenet121
from .resnet import resnet50
from .vgg import vgg19

Dtype = Any

BACKBONE_TYPES = ("darknet", "vgg", "resnet", "densenet")


def upsample2x_nearest(x):
    """2x nearest-neighbour upsample, NHWC (torch `nn.Upsample(2)`)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _build_backbone(backbone_type, depth, width, depthwise, act, dtype,
                    bn_axis_name, packed_early=False, packed_depth=2):
    if backbone_type == "darknet":
        return CSPDarknet(depth, width, depthwise=depthwise, act=act,
                          dtype=dtype, bn_axis_name=bn_axis_name,
                          packed_early=packed_early,
                          packed_depth=packed_depth, name="backbone")
    if backbone_type == "vgg":
        return vgg19(dtype=dtype, bn_axis_name=bn_axis_name, name="backbone")
    if backbone_type == "resnet":
        return resnet50(dtype=dtype, bn_axis_name=bn_axis_name, name="backbone")
    if backbone_type == "densenet":
        return densenet121(dtype=dtype, bn_axis_name=bn_axis_name,
                           name="backbone")
    raise ValueError(
        f"unknown backbone_type {backbone_type!r}; expected {BACKBONE_TYPES}"
    )


class YOLOPAFPN(nn.Module):
    """PAN neck over a swappable backbone (ref `YOLOPAFPN`).

    Returns ``(pan_out2, pan_out1, pan_out0, x2, x1, x0)`` — FPN maps at
    strides 8/16/32 plus the raw backbone taps, exactly the reference's
    6-tuple used by the feature-map exploration harness
    (`yolo_pafpn.py:127`).
    """

    backbone_type: str = "darknet"
    depth: float = 1.0
    width: float = 1.0
    in_features: Sequence[str] = ("dark3", "dark4", "dark5")
    in_channels: Sequence[int] = (256, 512, 1024)
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    packed_early: bool | str = False
    packed_depth: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = _build_backbone(
            self.backbone_type, self.depth, self.width, self.depthwise,
            self.act, self.dtype, self.bn_axis_name,
            packed_early=self.packed_early,
            packed_depth=self.packed_depth,
        )
        feats = backbone(x, train)
        x2, x1, x0 = [feats[f] for f in self.in_features]

        w = self.width
        c0, c1, c2 = [int(c * w) for c in self.in_channels]
        n = round(3 * self.depth)
        Conv = DWConv if self.depthwise else BaseConv
        kw = dict(act=self.act, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        csp_kw = dict(shortcut=False, depthwise=self.depthwise, **kw)

        fpn_out0 = BaseConv(c1, 1, 1, name="lateral_conv0", **kw)(x0, train)
        f_out0 = upsample2x_nearest(fpn_out0)
        f_out0 = jnp.concatenate([f_out0, x1], axis=-1)
        f_out0 = CSPLayer(c1, n=n, name="C3_p4", **csp_kw)(f_out0, train)

        fpn_out1 = BaseConv(c0, 1, 1, name="reduce_conv1", **kw)(f_out0, train)
        f_out1 = upsample2x_nearest(fpn_out1)
        f_out1 = jnp.concatenate([f_out1, x2], axis=-1)
        pan_out2 = CSPLayer(c0, n=n, name="C3_p3", **csp_kw)(f_out1, train)

        p_out1 = Conv(c0, 3, 2, name="bu_conv2", **kw)(pan_out2, train)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = CSPLayer(c1, n=n, name="C3_n3", **csp_kw)(p_out1, train)

        p_out0 = Conv(c1, 3, 2, name="bu_conv1", **kw)(pan_out1, train)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = CSPLayer(c2, n=n, name="C3_n4", **csp_kw)(p_out0, train)

        return (pan_out2, pan_out1, pan_out0, x2, x1, x0)


class _Embedding(nn.Module):
    """5-conv 1/3/1/3/1 embedding (ref `_make_embedding`, yolo_fpn.py:41-51)."""

    filters: Sequence[int]  # (f0, f1)
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f0, f1 = self.filters
        kw = dict(act="lrelu", dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = BaseConv(f0, 1, 1, name="cbl0", **kw)(x, train)
        x = BaseConv(f1, 3, 1, name="cbl1", **kw)(x, train)
        x = BaseConv(f0, 1, 1, name="cbl2", **kw)(x, train)
        x = BaseConv(f1, 3, 1, name="cbl3", **kw)(x, train)
        x = BaseConv(f0, 1, 1, name="cbl4", **kw)(x, train)
        return x


class YOLOFPN(nn.Module):
    """Classic YOLOv3 FPN over Darknet-53 (ref `YOLOFPN`).

    Returns ``(out_dark3, out_dark4, x0)`` with 128/256/512 channels.
    """

    depth: int = 53
    in_features: Sequence[str] = ("dark3", "dark4", "dark5")
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = Darknet(self.depth, dtype=self.dtype,
                        bn_axis_name=self.bn_axis_name,
                        name="backbone")(x, train)
        x2, x1, x0 = [feats[f] for f in self.in_features]
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)

        x1_in = BaseConv(256, 1, 1, act="lrelu", name="out1_cbl", **kw)(x0, train)
        x1_in = upsample2x_nearest(x1_in)
        x1_in = jnp.concatenate([x1_in, x1], axis=-1)
        out_dark4 = _Embedding((256, 512), name="out1", **kw)(x1_in, train)

        x2_in = BaseConv(128, 1, 1, act="lrelu", name="out2_cbl", **kw)(
            out_dark4, train)
        x2_in = upsample2x_nearest(x2_in)
        x2_in = jnp.concatenate([x2_in, x2], axis=-1)
        out_dark3 = _Embedding((128, 256), name="out2", **kw)(x2_in, train)

        return (out_dark3, out_dark4, x0)
