"""Network building blocks (TPU-native, NHWC, flax.linen).

Capability parity with the reference block zoo
(`/root/reference/yolox/models/network_blocks.py:9-210`): SiLU / ReLU /
LeakyReLU activations, Conv-BN-act (`BaseConv`), depthwise-separable conv
(`DWConv`), `Bottleneck`, YOLOv3 `ResLayer`, `SPPBottleneck`, `CSPLayer`
(C3), and the `Focus` space-to-depth stem.

TPU-first design notes:

* tensors are NHWC — the native XLA TPU convolution layout; the reference's
  NCHW is a CUDA/cuDNN convention we do not copy.
* convolutions carry an explicit ``(k-1)//2`` symmetric padding, which for
  odd kernels is exactly PyTorch's "same" padding — pinned so that weight
  imports from reference checkpoints are bit-compatible.
* BatchNorm uses eps 1e-3 / torch-momentum 0.03 (the values the reference
  stamps onto every BN via ``init_yolo``, `yolox/exp/yolox_base.py:76-80`);
  flax's momentum convention is ``1 - torch_momentum``.  An optional
  ``bn_axis_name`` turns every BN into a cross-replica sync-BN (``pmean``
  over the mesh data axis) — strictly stronger than the reference's
  periodic pre-eval all-reduce.
* compute dtype is a parameter (bf16 on TPU for speed; params stay fp32).
* ``Focus`` is expressed as a space-to-depth reshape so XLA lowers it to a
  pure layout change fused into the following conv.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Torch BN momentum 0.03 == flax momentum 0.97 (flax: ema = m*ema + (1-m)*x).
BN_MOMENTUM = 0.97
BN_EPS = 1e-3


def silu(x):
    return x * jax.nn.sigmoid(x)


def get_activation(name: str = "silu") -> Callable:
    """Activation registry mirroring `network_blocks.py:17-26`."""
    if name == "silu":
        return silu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return functools.partial(jax.nn.leaky_relu, negative_slope=0.1)
    raise AttributeError(f"Unsupported act type: {name}")


def batch_norm(
    x,
    train: bool = False,
    name: str = "bn",
    dtype: Dtype = jnp.float32,
    axis_name: str | None = None,
    momentum: float = BN_MOMENTUM,
    epsilon: float = BN_EPS,
):
    """BatchNorm2d with the reference's eps/momentum and optional sync-BN.

    Must be called inside a parent module's ``@nn.compact`` — the BN params
    live directly under the parent at ``<name>/`` so flax paths mirror torch
    state_dict keys 1:1 (e.g. ``conv1/bn/scale`` ↔ ``conv1.bn.weight``).
    """
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=epsilon,
        dtype=dtype,
        param_dtype=jnp.float32,
        axis_name=axis_name if train else None,
        name=name,
    )(x)


def batch_norm_packed(
    x,
    train: bool = False,
    name: str = "bn",
    dtype: Dtype = jnp.float32,
    axis_name: str | None = None,
    momentum: float = BN_MOMENTUM,
    epsilon: float = BN_EPS,
):
    """BatchNorm over a packed-layout tensor (``ops/packed.py``): params and
    running stats stay per *fine* channel (shape [C], same paths/shapes as
    :func:`batch_norm`, so checkpoints are layout-independent), while the
    reduction additionally spans the 4 spatial phases.  Channel-major
    packing makes the ``[..., 4C] <-> [..., C, 4]`` reshape a bitcast, so
    this costs nothing over fine BN.
    """
    b, h, w, c4 = x.shape
    x = x.reshape(b, h, w, c4 // 4, 4)
    x = nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=epsilon,
        dtype=dtype,
        param_dtype=jnp.float32,
        axis_name=axis_name if train else None,
        axis=-2,
        name=name,
    )(x)
    return x.reshape(b, h, w, c4)


class BaseConv(nn.Module):
    """Conv2d -> BatchNorm -> activation (reference `BaseConv`, :29-54).

    NHWC, explicit torch-"same" padding ``(k-1)//2``, no conv bias.

    TPU: ``in_layout``/``out_layout`` select the space-to-depth *packed*
    layout re-expression (``ops/packed.py``) used by the small-channel
    early backbone stages — parameters keep their fine shapes and paths
    (``conv/kernel`` [k,k,Ci,Co], ``bn/*`` [Co]) in every layout, so
    checkpoints, torch import/export, EMA and weight decay are unaffected.
    """

    out_channels: int
    ksize: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    in_layout: str = "fine"
    out_layout: str = "fine"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.ksize - 1) // 2
        if self.in_layout == "fine" and self.out_layout == "fine":
            x = nn.Conv(
                features=self.out_channels,
                kernel_size=(self.ksize, self.ksize),
                strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=self.groups,
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
            x = batch_norm(x, train, dtype=self.dtype,
                           axis_name=self.bn_axis_name)
            return get_activation(self.act)(x)

        if self.groups != 1 or self.use_bias:
            raise NotImplementedError(
                "packed layouts support plain bias-free convs only")
        from .packed import packed_conv  # local import avoids a cycle

        mode = {("fine", "packed"): "fp",
                ("packed", "packed"): "pp",
                ("packed", "fine"): "pf"}[(self.in_layout, self.out_layout)]
        ci = x.shape[-1] // (4 if self.in_layout == "packed" else 1)
        w = _FocusKernel(
            (self.ksize, self.ksize, ci, self.out_channels), name="conv")()
        # int8 PTQ composition (ops/quant.py): the executed conv's channel
        # dims are the packed ones — 4x the fine counts on packed axes —
        # so early stages that stay bf16 in the fine layout clear the
        # MXU-utilization gate here
        from .quant import packed_act_scale

        out_ch = (self.out_channels * 4 if self.out_layout == "packed"
                  else self.out_channels)
        s_x = packed_act_scale(self, x.shape[-1], out_ch)
        y = packed_conv(x.astype(self.dtype), w.astype(self.dtype),
                        self.stride, pad, mode=mode, act_scale=s_x)
        if self.out_layout == "packed":
            y = batch_norm_packed(y, train, dtype=self.dtype,
                                  axis_name=self.bn_axis_name)
        else:
            y = batch_norm(y, train, dtype=self.dtype,
                           axis_name=self.bn_axis_name)
        return get_activation(self.act)(y)


class DWConv(nn.Module):
    """Depthwise conv + pointwise conv (reference `DWConv`, :57-76)."""

    out_channels: int
    ksize: int
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = BaseConv(
            in_ch, self.ksize, self.stride, groups=in_ch, act=self.act,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="dconv",
        )(x, train)
        x = BaseConv(
            self.out_channels, 1, 1, act=self.act,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="pconv",
        )(x, train)
        return x


class Bottleneck(nn.Module):
    """Standard bottleneck (reference `Bottleneck`, :79-101)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    layout: str = "fine"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.layout != "fine" and self.depthwise:
            raise NotImplementedError(
                "packed layout supports plain convs only — a DWConv has "
                "no layout-aware path and would mix spatial phases")
        hidden = int(self.out_channels * self.expansion)
        lkw = dict(in_layout=self.layout, out_layout=self.layout)
        y = BaseConv(
            hidden, 1, 1, act=self.act, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="conv1", **lkw,
        )(x, train)
        Conv = DWConv if self.depthwise else BaseConv
        y = Conv(
            self.out_channels, 3, 1, act=self.act, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name, name="conv2",
            **({} if self.depthwise else lkw),
        )(y, train)
        if self.shortcut and y.shape[-1] == x.shape[-1]:
            y = y + x
        return y


class ResLayer(nn.Module):
    """YOLOv3 residual layer (reference `ResLayer`, :104-119)."""

    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = in_ch // 2
        y = BaseConv(mid, 1, 1, act="lrelu", dtype=self.dtype,
                     bn_axis_name=self.bn_axis_name, name="layer1")(x, train)
        y = BaseConv(in_ch, 3, 1, act="lrelu", dtype=self.dtype,
                     bn_axis_name=self.bn_axis_name, name="layer2")(y, train)
        return x + y


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _maxpool1d(x, ksize: int, axis: int):
    """stride-1 max pool along one spatial axis, torch ks//2 padding.

    Custom VJP: XLA's default max-pool backward is ``select_and_scatter``,
    which walks the window positions sequentially — at SPP's k=13 it was
    ~9% of the whole 24p train step on v5e.  The replacement computes
    ``dx[i] = Σ_u (g[i+u]/ties[i+u]) · (x[i] == y[i+u])`` over the k
    window offsets as one fused elementwise pipeline, where ``ties[w]``
    counts the window's maxima.  Tie semantics differ from torch (the
    gradient splits equally across all window maxima instead of going to
    the first one — total mass is conserved; relevant in bf16, where
    exact ties are realistic); forward values are identical.
    """
    return _maxpool1d_fwd_raw(x, ksize, axis)


def _maxpool1d_fwd_raw(x, ksize: int, axis: int):
    pad = ksize // 2
    window = [1] * x.ndim
    window[axis] = ksize
    padding = [(0, 0)] * x.ndim
    padding[axis] = (pad, pad)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window, [1] * x.ndim, padding
    )


def _maxpool1d_fwd(x, ksize: int, axis: int):
    y = _maxpool1d_fwd_raw(x, ksize, axis)
    return y, (x, y)


def _maxpool1d_bwd(ksize: int, axis: int, res, g):
    x, y = res
    pad = ksize // 2
    padding = [(0, 0)] * x.ndim
    padding[axis] = (pad, pad)
    n = x.shape[axis]

    def win(arr, u):
        s = [0] * arr.ndim
        l = list(arr.shape)
        s[axis] = u
        l[axis] = u + n
        return jax.lax.slice(arr, s, l)

    # ties[w] = #{i in window w : x[i] == y[w]} >= 1; NaN pad never
    # compares equal, so out-of-bounds positions contribute nothing
    xp = jnp.pad(x, padding, constant_values=jnp.nan)
    ties = jnp.zeros_like(y)
    for u in range(ksize):
        ties = ties + (win(xp, u) == y).astype(y.dtype)

    gp = jnp.pad(g / ties, padding)
    yp = jnp.pad(y, padding, constant_values=jnp.nan)
    dx = jnp.zeros_like(x)
    for u in range(ksize):
        dx = dx + jnp.where(x == win(yp, u), win(gp, u), 0.0)
    return (dx,)


_maxpool1d.defvjp(_maxpool1d_fwd, _maxpool1d_bwd)


def _maxpool_same(x, ksize: int):
    """stride-1 k×k max pool with torch's ks//2 padding, separably
    decomposed (max over rows ∘ max over cols — identical values, and the
    custom backward touches 2k window offsets instead of k²)."""
    return _maxpool1d(_maxpool1d(x, ksize, 2), ksize, 1)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (reference `SPPBottleneck`, :122-144)."""

    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from eop_tpu.parallel.mesh import unshard_space

        hidden = x.shape[-1] // 2
        x = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype,
                     bn_axis_name=self.bn_axis_name, name="conv1")(x, train)
        # Under spatial partitioning, fence the pool block to batch-only
        # sharding (no-op otherwise — parallel/mesh.py::unshard_space):
        # the wide pool windows (k=13 ⇒ 6-row halos) rival the shard
        # extent at this 1/32-resolution grid, so halos cost more than
        # the gather, and the padded windows are near-tie-rich (f32
        # argmax flips under sharded reduction order — see unshard_space).
        # The pin sits on conv1's output so the pools, the concat, and
        # the saved backward residuals all consume the batch-only tensor.
        x = unshard_space(x)
        pools = [_maxpool_same(x, ks) for ks in self.kernel_sizes]
        x = jnp.concatenate([x] + pools, axis=-1)
        x = BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype,
                     bn_axis_name=self.bn_axis_name, name="conv2")(x, train)
        return x


class CSPLayer(nn.Module):
    """C3 CSP bottleneck with 3 convs (reference `CSPLayer`, :147-185)."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    layout: str = "fine"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.layout != "fine" and self.depthwise:
            raise NotImplementedError(
                "packed layout supports plain convs only — a DWConv has "
                "no layout-aware path and would mix spatial phases")
        hidden = int(self.out_channels * self.expansion)
        kw = dict(act=self.act, dtype=self.dtype,
                  bn_axis_name=self.bn_axis_name,
                  in_layout=self.layout, out_layout=self.layout)
        x1 = BaseConv(hidden, 1, 1, name="conv1", **kw)(x, train)
        x2 = BaseConv(hidden, 1, 1, name="conv2", **kw)(x, train)
        for i in range(self.n):
            x1 = Bottleneck(
                hidden, self.shortcut, 1.0, self.depthwise,
                act=self.act, dtype=self.dtype,
                bn_axis_name=self.bn_axis_name, layout=self.layout,
                name=f"m_{i}",
            )(x1, train)
        # channel-major packing keeps fine channel-concat == packed concat
        x = jnp.concatenate([x1, x2], axis=-1)
        return BaseConv(self.out_channels, 1, 1, name="conv3", **kw)(x, train)


def space_to_depth_2x2(x):
    """2x2 space-to-depth with the reference's channel order
    (top-left, bottom-left, top-right, bottom-right —
    `network_blocks.py:195-209`), NHWC.
    """
    tl = x[:, ::2, ::2, :]
    bl = x[:, 1::2, ::2, :]
    tr = x[:, ::2, 1::2, :]
    br = x[:, 1::2, 1::2, :]
    return jnp.concatenate([tl, bl, tr, br], axis=-1)


class _FocusKernel(nn.Module):
    """Holds the Focus conv kernel at the BaseConv-compatible param path
    (``conv/kernel`` with shape [k, k, 4*cin, cout]) so torch imports and
    existing checkpoints are unaffected by the folded compute path."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.shape,
            jnp.float32,
        )


@functools.lru_cache(maxsize=None)
def _focus_fold_const(k: int):
    """[k, k, 4, 2k, 2k] 0/1 scatter tensor: folds s2d-group kernel taps
    into their 2k x 2k stride-2 kernel positions."""
    import numpy as _np

    t = _np.zeros((k, k, 4, 2 * k, 2 * k), _np.float32)
    for g, (di, dj) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        for a in range(k):
            for b in range(k):
                t[a, b, g, 2 * a + di, 2 * b + dj] = 1.0
    return t


class _FoldedFocusConv(nn.Module):
    """BaseConv-compatible (param paths ``conv/kernel`` + ``bn/*``) conv
    that folds the preceding 2x2 space-to-depth into a 2k×2k stride-2
    convolution with rearranged weights."""

    out_channels: int
    ksize: int
    act: str
    dtype: Dtype
    bn_axis_name: str | None
    out_layout: str = "fine"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        k = self.ksize
        w3 = _FocusKernel(
            (k, k, 4 * cin, self.out_channels), name="conv"
        )()
        # s2d group g=(di, dj) channel c sits at original pixel offset
        # (2u+di, 2v+dj); group order matches space_to_depth_2x2's concat
        # (tl, bl, tr, br).  Built as a tensordot against a constant 0/1
        # scatter tensor — strided .at[].set scatters measurably slow the
        # step when run in-graph every call.
        w3r = w3.reshape(k, k, 4, cin, self.out_channels)
        w6 = jnp.tensordot(jnp.asarray(_focus_fold_const(k), w3.dtype),
                           w3r, axes=((0, 1, 2), (0, 1, 2)))
        pad = 2 * ((k - 1) // 2)  # (k-1)//2 on the s2d grid = 2x in pixels
        if self.out_layout == "packed":
            # fold the output packing into the conv as well: the raw image
            # is read directly and the stem lands in packed layout.
            from .packed import packed_conv

            y = packed_conv(x.astype(self.dtype), w6.astype(self.dtype),
                            2, pad, mode="fp")
            y = batch_norm_packed(y, train, dtype=self.dtype,
                                  axis_name=self.bn_axis_name)
            return get_activation(self.act)(y)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w6.astype(self.dtype),
            window_strides=(2, 2),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = batch_norm(y, train, dtype=self.dtype,
                       axis_name=self.bn_axis_name)
        return get_activation(self.act)(y)


class Focus(nn.Module):
    """Focus w/h info into channel space (reference `Focus`, :188-210).

    TPU note: materializing the 2x2 space-to-depth costs ~30% of the whole
    640px forward in strided-slice relayout fusions (profiled on v5e).
    Since s2d followed by a k×k conv is linearly identical to a 2k×2k
    stride-2 conv with rearranged weights, ``fold_s2d=True`` (default)
    computes that equivalent convolution directly — same parameters, same
    FLOPs, no relayout.
    """

    out_channels: int
    ksize: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32
    bn_axis_name: str | None = None
    fold_s2d: bool = True
    out_layout: str = "fine"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not self.fold_s2d or self.stride != 1:
            if self.out_layout != "fine":
                raise NotImplementedError(
                    "packed Focus requires the folded path")
            x = space_to_depth_2x2(x)
            return BaseConv(
                self.out_channels, self.ksize, self.stride, act=self.act,
                dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                name="conv",
            )(x, train)

        return _FoldedFocusConv(
            self.out_channels, self.ksize, self.act, self.dtype,
            self.bn_axis_name, out_layout=self.out_layout, name="conv",
        )(x, train)
