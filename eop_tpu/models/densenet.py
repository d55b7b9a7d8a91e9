"""DenseNet121 backbone with YOLOX-compatible taps (NHWC flax).

Parity target: `/root/reference/yolox/models/densenet.py` — growth rate 32,
blocks (6, 12, 24, 16), transitions halving channels, channel-wise dropout
0.3 inside dense layers, and 1×1 ``baseconv1/2`` projections so the taps
are dark3=256 (from D2's 512), dark4=512 (from D3's 1024), dark5=1024 (D4).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import batch_norm

Dtype = Any


class BaseConvDN(nn.Module):
    """Conv -> BN -> ReLU (ref `BaseConv_DN`, densenet.py:7-18)."""

    out_channels: int
    ksize: int
    stride: int = 1
    padding: int = 0
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (self.ksize, self.ksize),
                    strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2,
                    use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        x = batch_norm(x, train, dtype=self.dtype, axis_name=self.bn_axis_name)
        return nn.relu(x)


class ConvBlock(nn.Module):
    """BN -> ReLU -> Conv (pre-activation; ref `ConvBlock`, densenet.py:21-32)."""

    out_channels: int
    ksize: int
    padding: int = 0
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = batch_norm(x, train, dtype=self.dtype, axis_name=self.bn_axis_name)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (self.ksize, self.ksize),
                       padding=[(self.padding, self.padding)] * 2,
                       use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


class DenseLayer(nn.Module):
    """1x1 (4k) -> 3x3 (k) with channel dropout (ref `DenseLayer`, :48-65)."""

    growth_rate: int = 32
    bn_size: int = 4
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.bn_size * self.growth_rate, 1, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name, name="conv1")(x, train)
        x = ConvBlock(self.growth_rate, 3, padding=1, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name, name="conv2")(x, train)
        if self.drop_rate > 0:
            # torch Dropout2d drops whole channels: broadcast over H, W.
            x = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2))(
                x, deterministic=not train
            )
        return x


class DenseBlock(nn.Module):
    """Concatenating dense block (ref `DenseBlock`, densenet.py:69-85)."""

    num_layers: int
    growth_rate: int = 32
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            y = DenseLayer(self.growth_rate, drop_rate=self.drop_rate,
                           dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                           name=f"layer{i}")(x, train)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class Transition(nn.Module):
    """1x1 conv (half channels) + 2x2 avg pool (ref `Transition`, :37-45)."""

    out_channels: int
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.out_channels, 1, dtype=self.dtype,
                      bn_axis_name=self.bn_axis_name, name="conv")(x, train)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNet(nn.Module):
    """DenseNet trunk with YOLOX taps (ref `DenseNet`, densenet.py:90-154)."""

    growth_rate: int = 32
    block_layers: Sequence[int] = (6, 12, 24, 16)
    num_init_channels: int = 64
    drop_rate: float = 0.3
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.growth_rate
        bl = self.block_layers
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name)

        t1 = self.num_init_channels + bl[0] * g        # 256
        t2 = t1 // 2 + bl[1] * g                       # 512
        t3 = t2 // 2 + bl[2] * g                       # 1024

        outputs = {}
        x = BaseConvDN(self.num_init_channels, 7, 2, padding=3,
                       name="stem_conv", **kw)(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outputs["stem"] = x

        x = DenseBlock(bl[0], g, self.drop_rate, name="D1", **kw)(x, train)
        outputs["dark2"] = x
        x = Transition(t1 // 2, name="T1", **kw)(x, train)
        x = DenseBlock(bl[1], g, self.drop_rate, name="D2", **kw)(x, train)
        outputs["dark3"] = BaseConvDN(t2 // 2, 1, name="baseconv1", **kw)(x, train)
        x = Transition(t2 // 2, name="T2", **kw)(x, train)
        x = DenseBlock(bl[2], g, self.drop_rate, name="D3", **kw)(x, train)
        outputs["dark4"] = BaseConvDN(t3 // 2, 1, name="baseconv2", **kw)(x, train)
        x = Transition(t3 // 2, name="T3", **kw)(x, train)
        x = DenseBlock(bl[3], g, self.drop_rate, name="D4", **kw)(x, train)
        outputs["dark5"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


def densenet121(**kwargs) -> DenseNet:
    return DenseNet(growth_rate=32, block_layers=(6, 12, 24, 16), **kwargs)
