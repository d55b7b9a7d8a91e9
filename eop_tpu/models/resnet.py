"""Half-width ResNet50 backbone with YOLOX-compatible taps (NHWC flax).

Parity target: `/root/reference/yolox/models/resnet.py` — a torchvision-style
ResNet but with ``inplanes=32`` and stage planes (32, 64, 128, 256), so the
Bottleneck ×4 expansion lands the (dark3, dark4, dark5) taps on
(256, 512, 1024) channels.  The reference also defines ``baseconv1-3`` and a
classifier head that its forward never calls (`resnet.py:143-160`, dead
code); we deliberately do not reproduce dead parameters.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import batch_norm

Dtype = Any


def _conv(x, features, ksize, stride, name, dtype):
    pad = (ksize - 1) // 2
    return nn.Conv(
        features, (ksize, ksize), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], use_bias=False,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )(x)


class BasicBlock(nn.Module):
    """3x3-3x3 residual block (ref `BasicBlock`, resnet.py:13-51)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(x, self.planes, 3, self.stride, "conv1", self.dtype)
        out = batch_norm(out, train, name="bn1", dtype=self.dtype,
                        axis_name=self.bn_axis_name)
        out = nn.relu(out)
        out = _conv(out, self.planes, 3, 1, "conv2", self.dtype)
        out = batch_norm(out, train, name="bn2", dtype=self.dtype,
                        axis_name=self.bn_axis_name)
        if self.downsample:
            identity = _conv(x, self.planes * self.expansion, 1, self.stride,
                             "down_conv", self.dtype)
            identity = batch_norm(identity, train, name="down_bn", dtype=self.dtype,
                                 axis_name=self.bn_axis_name)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 bottleneck (ref `Bottleneck`, resnet.py:53-96)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(x, self.planes, 1, 1, "conv1", self.dtype)
        out = batch_norm(out, train, name="bn1", dtype=self.dtype,
                        axis_name=self.bn_axis_name)
        out = nn.relu(out)
        out = _conv(out, self.planes, 3, self.stride, "conv2", self.dtype)
        out = batch_norm(out, train, name="bn2", dtype=self.dtype,
                        axis_name=self.bn_axis_name)
        out = nn.relu(out)
        out = _conv(out, self.planes * self.expansion, 1, 1, "conv3", self.dtype)
        out = batch_norm(out, train, name="bn3", dtype=self.dtype,
                        axis_name=self.bn_axis_name)
        if self.downsample:
            identity = _conv(x, self.planes * self.expansion, 1, self.stride,
                             "down_conv", self.dtype)
            identity = batch_norm(identity, train, name="down_bn", dtype=self.dtype,
                                 axis_name=self.bn_axis_name)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Half-width ResNet trunk (ref `ResNet`, resnet.py:98-246)."""

    block_counts: Sequence[int] = (3, 4, 6, 3)
    inplanes: int = 32
    stage_planes: Sequence[int] = (32, 64, 128, 256)
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    def _layer(self, x, planes, blocks, stride, in_ch, name, train):
        exp = Bottleneck.expansion
        down = stride != 1 or in_ch != planes * exp
        x = Bottleneck(planes, stride, down, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name,
                       name=f"{name}_block0")(x, train)
        for i in range(1, blocks):
            x = Bottleneck(planes, 1, False, dtype=self.dtype,
                           bn_axis_name=self.bn_axis_name,
                           name=f"{name}_block{i}")(x, train)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        outputs = {}
        x = nn.Conv(self.inplanes, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = batch_norm(x, train, name="bn1", dtype=self.dtype,
                      axis_name=self.bn_axis_name)
        x = nn.relu(x)
        outputs["stem"] = x

        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])
        exp = Bottleneck.expansion
        p = self.stage_planes
        in_ch = self.inplanes
        x = self._layer(x, p[0], self.block_counts[0], 1, in_ch, "layer1", train)
        outputs["dark2"] = x
        x = self._layer(x, p[1], self.block_counts[1], 2, p[0] * exp, "layer2", train)
        outputs["dark3"] = x
        x = self._layer(x, p[2], self.block_counts[2], 2, p[1] * exp, "layer3", train)
        outputs["dark4"] = x
        x = self._layer(x, p[3], self.block_counts[3], 2, p[2] * exp, "layer4", train)
        outputs["dark5"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


def resnet50(**kwargs) -> ResNet:
    return ResNet(block_counts=(3, 4, 6, 3), **kwargs)
