"""VGG19 backbone with YOLOX-compatible taps (NHWC flax).

Parity target: `/root/reference/yolox/models/vgg.py` — five conv-pool stages
with layer counts [2, 2, 4, 4, 4], plus a 1×1 ``conv_add`` (512→1024) so the
(dark3, dark4, dark5) taps carry (256, 512, 1024) channels matching yolox-l.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import batch_norm

Dtype = Any


class ConvBNReLU(nn.Module):
    """Conv -> BN -> ReLU (ref `ConvBNReLU`, vgg.py:4-17)."""

    out_channels: int
    ksize: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_channels,
            (self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = batch_norm(x, train, dtype=self.dtype, axis_name=self.bn_axis_name)
        return nn.relu(x)


class VGG(nn.Module):
    """VGG with conv-pool stages (ref `VGG`, vgg.py:19-74)."""

    layers: Sequence[int] = (2, 2, 4, 4, 4)
    out_features: Sequence[str] = ("dark3", "dark4", "dark5")
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    def _stage(self, x, out_ch: int, n_layers: int, name: str, train: bool):
        for i in range(n_layers):
            x = ConvBNReLU(out_ch, dtype=self.dtype,
                           bn_axis_name=self.bn_axis_name,
                           name=f"{name}_conv{i}")(x, train)
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    @nn.compact
    def __call__(self, x, train: bool = False):
        base = 64
        outputs = {}
        x = self._stage(x, base, self.layers[0], "conv_pool1", train)
        outputs["stem"] = x
        x = self._stage(x, base * 2, self.layers[1], "conv_pool2", train)
        outputs["dark2"] = x
        x = self._stage(x, base * 4, self.layers[2], "conv_pool3", train)
        outputs["dark3"] = x
        x = self._stage(x, base * 8, self.layers[3], "conv_pool4", train)
        outputs["dark4"] = x
        x = self._stage(x, base * 8, self.layers[4], "conv_pool5", train)
        # 1x1 channel lift 512 -> 1024 so dark5 matches yolox-l (ref :40).
        x = ConvBNReLU(base * 16, ksize=1, padding=0, dtype=self.dtype,
                       bn_axis_name=self.bn_axis_name, name="conv_add")(x, train)
        outputs["dark5"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


def vgg19(**kwargs) -> VGG:
    return VGG(layers=(2, 2, 4, 4, 4), **kwargs)
