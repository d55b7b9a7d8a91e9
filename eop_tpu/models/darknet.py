"""Darknet backbones (TPU-native NHWC flax re-design).

Parity targets: classic `Darknet` 21/53 (`/root/reference/yolox/models/darknet.py:9-93`)
and `CSPDarknet` (`darknet.py:95-177`). Emits the same named feature taps
(stem, dark2..dark5) with the same channel progression so the PAFPN / FPN
necks and the reference weight importer line up 1:1.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import (
    BaseConv,
    CSPLayer,
    DWConv,
    Focus,
    ResLayer,
    SPPBottleneck,
)

Dtype = Any

DEPTH2BLOCKS = {21: (1, 2, 2, 1), 53: (2, 8, 8, 4)}


class _GroupLayer(nn.Module):
    """stride conv + ``num_blocks`` ResLayers (ref `make_group_layer:58-63`)."""

    out_channels: int
    num_blocks: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BaseConv(self.out_channels, 3, self.stride, act="lrelu",
                     dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                     name="conv")(x, train)
        for i in range(self.num_blocks):
            x = ResLayer(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                         name=f"res_{i}")(x, train)
        return x


class _SPPBlock(nn.Module):
    """conv1x1/conv3x3/SPP/conv3x3/conv1x1 tail (ref `make_spp_block:65-79`)."""

    filters: Tuple[int, int]
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f0, f1 = self.filters
        kw = dict(act="lrelu", dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x = BaseConv(f0, 1, 1, name="conv0", **kw)(x, train)
        x = BaseConv(f1, 3, 1, name="conv1", **kw)(x, train)
        x = SPPBottleneck(f0, act="lrelu", dtype=self.dtype,
                          bn_axis_name=self.bn_axis_name, name="spp")(x, train)
        x = BaseConv(f1, 3, 1, name="conv2", **kw)(x, train)
        x = BaseConv(f0, 1, 1, name="conv3", **kw)(x, train)
        return x


class Darknet(nn.Module):
    """YOLOv3-style residual backbone (ref `Darknet`, depths 21/53)."""

    depth: int = 53
    stem_out_channels: int = 32
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        nb = DEPTH2BLOCKS[self.depth]
        c = self.stem_out_channels

        outputs = {}
        x = BaseConv(c, 3, 1, act="lrelu", name="stem_conv", **kw)(x, train)
        x = _GroupLayer(c * 2, 1, stride=2, name="stem_group", **kw)(x, train)
        outputs["stem"] = x
        c *= 2  # 64
        x = _GroupLayer(c * 2, nb[0], stride=2, name="dark2", **kw)(x, train)
        outputs["dark2"] = x
        c *= 2  # 128
        x = _GroupLayer(c * 2, nb[1], stride=2, name="dark3", **kw)(x, train)
        outputs["dark3"] = x
        c *= 2  # 256
        x = _GroupLayer(c * 2, nb[2], stride=2, name="dark4", **kw)(x, train)
        outputs["dark4"] = x
        c *= 2  # 512
        x = _GroupLayer(c * 2, nb[3], stride=2, name="dark5_group", **kw)(x, train)
        x = _SPPBlock((c, c * 2), name="dark5_spp", **kw)(x, train)
        outputs["dark5"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


class CSPDarknet(nn.Module):
    """CSPDarknet-53 (ref `CSPDarknet:95-177`): Focus stem, 4 CSP stages,
    SPP in dark5. ``dep_mul``/``wid_mul`` follow the yolox scaling table."""

    dep_mul: float = 1.0
    wid_mul: float = 1.0
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    # False | True | "train": run the sub-128-channel early stages in the
    # space-to-depth packed layout (ops/packed.py).  "train" applies it to
    # training calls only — measured on v5e the packed layout wins the
    # fwd+bwd step (2.3x on the early segment) but loses the forward-only
    # inference at large batch, and parameters are layout-independent so
    # the same weights can train packed and serve fine.
    packed_early: bool | str = False
    # how many leading stages run packed when packed_early engages:
    # 2 = stem + dark2 (the sub-128-channel stages — default), 3 = also
    # dark3_conv + dark3_csp (an MXU-lane experiment: at width 0.5 dark3
    # sits exactly at the 128-lane boundary; see BASELINE.md round 5)
    packed_depth: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        base_ch = int(self.wid_mul * 64)
        base_depth = max(round(self.dep_mul * 3), 1)
        Conv = DWConv if self.depthwise else BaseConv
        kw = dict(act=self.act, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        csp_kw = dict(depthwise=self.depthwise, **kw)

        use_packed = (
            self.packed_early is True
            or (self.packed_early == "train" and train)
        )
        outputs = {}
        if use_packed and not self.depthwise:
            # TPU small-channel path: run the sub-128-channel stages in the
            # space-to-depth packed layout (ops/packed.py) so both forward
            # and backward use XLA's wide-channel conv emitters.  Measured
            # 2.3x on the early-segment fwd+bwd @640 B=32 bf16 (BASELINE.md
            # round 3); exact same parameters/outputs as the fine path.
            from eop_tpu.ops.packed import unpack_nhwc

            x = Focus(base_ch, ksize=3, name="stem", out_layout="packed",
                      **kw)(x, train)
            if "stem" in self.out_features:
                outputs["stem"] = unpack_nhwc(x)
            # stay packed only while channels are below the 128 MXU lanes
            d2_packed = base_ch * 2 < 128
            d2l = "packed" if d2_packed else "fine"
            x = Conv(base_ch * 2, 3, 2, name="dark2_conv",
                     in_layout="packed", out_layout=d2l, **kw)(x, train)
            x = CSPLayer(base_ch * 2, n=base_depth, name="dark2_csp",
                         layout=d2l, **csp_kw)(x, train)
            if "dark2" in self.out_features:
                outputs["dark2"] = unpack_nhwc(x) if d2_packed else x
            d3_packed = self.packed_depth >= 3 and d2_packed
            d3l = "packed" if d3_packed else "fine"
            x = Conv(base_ch * 4, 3, 2, name="dark3_conv",
                     in_layout=d2l, out_layout=d3l, **kw)(x, train)
            if d3_packed:
                x = CSPLayer(base_ch * 4, n=base_depth * 3,
                             name="dark3_csp", layout="packed",
                             **csp_kw)(x, train)
                x = unpack_nhwc(x)
                outputs["dark3"] = x
                return self._tail_from_dark4(x, outputs, base_ch,
                                             base_depth, csp_kw, kw, train)
            return self._tail(x, outputs, base_ch, base_depth, csp_kw, kw,
                              train)

        x = Focus(base_ch, ksize=3, name="stem", **kw)(x, train)
        outputs["stem"] = x

        x = Conv(base_ch * 2, 3, 2, name="dark2_conv", **kw)(x, train)
        x = CSPLayer(base_ch * 2, n=base_depth, name="dark2_csp", **csp_kw)(x, train)
        outputs["dark2"] = x

        x = Conv(base_ch * 4, 3, 2, name="dark3_conv", **kw)(x, train)
        return self._tail(x, outputs, base_ch, base_depth, csp_kw, kw, train)

    def _tail(self, x, outputs, base_ch, base_depth, csp_kw, kw, train):
        """dark3_csp onward — shared by the fine and packed-early paths
        (both arrive here in fine layout with >=128 channels)."""
        x = CSPLayer(base_ch * 4, n=base_depth * 3, name="dark3_csp", **csp_kw)(x, train)
        outputs["dark3"] = x
        return self._tail_from_dark4(x, outputs, base_ch, base_depth,
                                     csp_kw, kw, train)

    def _tail_from_dark4(self, x, outputs, base_ch, base_depth, csp_kw,
                         kw, train):
        Conv = DWConv if self.depthwise else BaseConv
        x = Conv(base_ch * 8, 3, 2, name="dark4_conv", **kw)(x, train)
        x = CSPLayer(base_ch * 8, n=base_depth * 3, name="dark4_csp", **csp_kw)(x, train)
        outputs["dark4"] = x

        # Under spatial partitioning, gather the space axis before dark5:
        # at 1/32 resolution the grid is tiny (20x20 at 640 px) and the
        # SPP k=13 pools' 6-row halos rival the shard extent, so halo
        # traffic exceeds what the stage's few FLOPs justify (see
        # parallel/mesh.py::unshard_space).  No-op on 1-D meshes.
        from eop_tpu.parallel.mesh import unshard_space

        x = unshard_space(x)
        x = Conv(base_ch * 16, 3, 2, name="dark5_conv", **kw)(x, train)
        x = SPPBottleneck(base_ch * 16, act=self.act, dtype=self.dtype,
                          bn_axis_name=self.bn_axis_name, name="dark5_spp")(x, train)
        x = CSPLayer(base_ch * 16, n=base_depth, shortcut=False,
                     name="dark5_csp", **csp_kw)(x, train)
        outputs["dark5"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}
