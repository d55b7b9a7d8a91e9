"""Space-to-depth *packed layout* re-expression of small-channel convs.

Why this exists (TPU): the early CSPDarknet stages of the s/tiny models run
at C=32/64 — the MXU contracts 128 lanes, so XLA's conv emitters on these
shapes reach only a fraction of peak (measured 1.25-5 TF/s on v5e,
BASELINE.md round-3 table), and the per-op Pallas route is bounded by a
~25 GB/s relayout floor for narrow NHWC blocks.  Instead of fighting the
emitter per-op, this module changes the *layout the network computes in*:

    fine  [B, H, W, C]   <->   packed  [B, H/2, W/2, 4C]

with channel-major phase order (packed channel = ``c*4 + pi*2 + pj`` where
``(pi, pj)`` is the pixel's position inside its 2x2 cell).  Every fine conv
has an exactly-equivalent conv on packed tensors whose weights are a fixed
linear scatter of the fine weights into a (structurally zero-padded) packed
kernel.  The packed convs have >=128 channels, so XLA's good wide-channel
emitters handle them — forward *and*, because they are plain
``lax.conv_general_dilated`` calls, backward via autodiff.  The trade is
~1.8-4x structural-zero FLOPs for a 3-10x better emitter, and it removes
the narrow-C relayouts entirely (the pack itself can be folded into the
stem conv: see ``pack_weights_fine_to_packed``).

Channel-major order is load-bearing:
  * fine channel-concat == packed channel-concat (CSP concat stays free);
  * ``[..., 4C] -> [..., C, 4]`` is a bitcast reshape, so per-fine-channel
    BatchNorm reduces/broadcasts over the trailing phase axis for free.

Equivalence is exact in fp32 and tested per-shape (tests/test_packed.py).

Reference semantics being re-expressed: the early stages of
`/root/reference/yolox/models/network_blocks.py:29-54,95-210` (BaseConv /
Bottleneck / CSPLayer / Focus) and `darknet.py:95-177`.  The reference runs
these as ordinary cuDNN convs; the packed layout is TPU-only engineering
with no reference counterpart.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "pack_nhwc",
    "unpack_nhwc",
    "pack_weights_packed_to_packed",
    "pack_weights_packed_to_fine",
    "pack_weights_fine_to_packed",
    "packed_conv",
]


def pack_nhwc(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C], channel-major phase order."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # -> [B, H/2, W/2, C, pi, pj]; packed channel = c*4 + pi*2 + pj
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unpack_nhwc(xp):
    """Inverse of :func:`pack_nhwc`."""
    b, hp, wp, c4 = xp.shape
    assert c4 % 4 == 0, c4
    c = c4 // 4
    xp = xp.reshape(b, hp, wp, c, 2, 2)
    xp = xp.transpose(0, 1, 4, 2, 5, 3)
    return xp.reshape(b, hp * 2, wp * 2, c)


def _axis_map_packed_in(k: int, stride: int, pad: int):
    """Per-axis map (q_out_phase, d_fine_tap) -> (D_packed_tap, r_in_phase).

    Fine row read by packed-output row I, phase q, tap d:
        f = stride*(2I + q) + d - pad = 2*stride*I + t,   t = stride*q + d - pad
    so on the packed grid: offset D = t//2, input phase r = t % 2, and the
    packed conv keeps the fine stride.
    """
    entries = []
    tmin, tmax = -pad, stride + k - 1 - pad
    dmin, dmax = tmin // 2, tmax // 2
    for q in (0, 1):
        for d in range(k):
            t = stride * q + d - pad
            entries.append((q, d, t // 2 - dmin, t % 2))
    return entries, dmax - dmin + 1, -dmin


# The weight transforms below are applied IN-GRAPH every call (training
# needs grads to flow back to the fine parameters, which is also what keeps
# the structural zeros structural — packed positions with no fine
# counterpart never become free parameters).  They are therefore built as
# one tensordot against a tiny constant 0/1 scatter tensor + a transpose,
# not as element scatters: the naive `.at[...].set` form measured +10 ms
# fwd / +48 ms bwd on the early 24p-s segment (v5e, B=32), the tensordot
# form is noise.


@functools.lru_cache(maxsize=None)
def _pp_const(k: int, stride: int, pad: int):
    ent, kk, pl = _axis_map_packed_in(k, stride, pad)
    t = np.zeros((k, k, kk, kk, 4, 4), np.float32)
    for qi, di, Di, ri in ent:
        for qj, dj, Dj, rj in ent:
            t[di, dj, Di, Dj, ri * 2 + rj, qi * 2 + qj] = 1.0
    return t, kk, pl


@functools.lru_cache(maxsize=None)
def _pf_const(k: int, pad: int):
    tmin, tmax = -pad, k - 1 - pad
    dmin, dmax = tmin // 2, tmax // 2
    kk = dmax - dmin + 1
    t = np.zeros((k, k, kk, kk, 4), np.float32)
    for di in range(k):
        ti = di - pad
        for dj in range(k):
            tj = dj - pad
            t[di, dj, ti // 2 - dmin, tj // 2 - dmin,
              (ti % 2) * 2 + (tj % 2)] = 1.0
    return t, kk, -dmin


@functools.lru_cache(maxsize=None)
def _fp_const(k: int, stride: int):
    kt = stride + k
    t = np.zeros((k, k, kt, kt, 4), np.float32)
    for qi in (0, 1):
        for qj in (0, 1):
            for di in range(k):
                for dj in range(k):
                    t[di, dj, stride * qi + di, stride * qj + dj,
                      qi * 2 + qj] = 1.0
    return t, kt


def pack_weights_packed_to_packed(w, stride: int, pad: int):
    """Fine HWIO kernel -> packed HWIO kernel, packed in/out tensors.

    Returns ``(wp [K,K,4Ci,4Co], stride, pad_lo)`` such that
    ``conv(pack(x), wp)`` == ``pack(conv(x, w))``.
    """
    k, k2, ci, co = w.shape
    assert k == k2
    t, kk, pl = _pp_const(k, stride, pad)
    # [K,K,4r,4q,ci,co] -> [K,K,ci,4r,co,4q] -> [K,K,4ci,4co] (channel-major)
    wp = jnp.tensordot(jnp.asarray(t, w.dtype), w, axes=((0, 1), (0, 1)))
    wp = wp.transpose(0, 1, 4, 2, 5, 3).reshape(kk, kk, 4 * ci, 4 * co)
    return wp, stride, pl


def pack_weights_packed_to_fine(w, stride: int, pad: int):
    """Fine HWIO kernel -> kernel consuming packed input, fine output.

    Only stride-2 fine convs admit this form (odd-stride output rows mix
    packed-grid parities).  Returns ``(wp [K,K,4Ci,Co], 1, pad_lo)`` — the
    packed conv has stride 1 because the fine stride 2 equals the packing
    factor.
    """
    k, k2, ci, co = w.shape
    assert k == k2 and stride == 2, "packed->fine needs fine stride 2"
    t, kk, pl = _pf_const(k, pad)
    wp = jnp.tensordot(jnp.asarray(t, w.dtype), w, axes=((0, 1), (0, 1)))
    # [K,K,4r,ci,co] -> [K,K,ci,4r,co] -> [K,K,4ci,co]
    wp = wp.transpose(0, 1, 3, 2, 4).reshape(kk, kk, 4 * ci, co)
    return wp, 1, pl


def pack_weights_fine_to_packed(w, stride: int, pad: int):
    """Fine HWIO kernel -> kernel consuming fine input, packed output.

    Used for the stem: the packing itself is folded into the conv, so the
    raw NHWC image is read directly (no relayout).  The returned conv has
    stride ``2*stride`` and kernel extent ``stride + k``.
    """
    k, k2, ci, co = w.shape
    assert k == k2
    t, kt = _fp_const(k, stride)
    wp = jnp.tensordot(jnp.asarray(t, w.dtype), w, axes=((0, 1), (0, 1)))
    # [Kt,Kt,4q,ci,co] -> [Kt,Kt,ci,co,4q] -> [Kt,Kt,ci,4co]
    wp = wp.transpose(0, 1, 3, 4, 2).reshape(kt, kt, ci, 4 * co)
    return wp, 2 * stride, pad


def _out_size(h: int, k: int, s: int, pad: int) -> int:
    return (h + 2 * pad - k) // s + 1


def packed_conv(x, w, stride: int, pad: int, mode: str = "pp",
                fine_hw=None, act_scale=None):
    """Run the fine conv ``(w, stride, pad)`` in packed space.

    mode: "pp" packed in/out, "pf" packed in / fine out (stride-2 only),
    "fp" fine in / packed out (stem).  ``x`` is already in the mode's input
    layout.  ``fine_hw`` gives the fine input H, W (needed to size the
    right-edge padding exactly); defaults to the layout-implied size.

    ``act_scale`` (int8 PTQ composition, `ops/quant.py`): when given, the
    conv runs on the MXU int8 path — activations per-tensor symmetric
    int8 at that scale, the PACKED kernel per-output-channel int8, int32
    accumulation, fused dequant tail.  For modes "pp" and "pf" packing
    is a permutation and the packed kernel an exact scatter of the fine
    kernel, so each packed output channel's absmax equals its fine
    channel's absmax and the int8 products are the same products — the
    packed int8 conv is bit-identical to the fine int8 conv (pinned by
    test for both modes).  Mode "fp" is the exception: each packed
    output channel holds only a spatial-phase SUBSET of the fine
    kernel's taps, so its per-channel weight scale differs from the fine
    conv's and the quantization grid is different (still a valid int8
    quantization, just not bit-matched to the fine one; unreachable
    today anyway — the stem's 3/12 input channels sit under the gate).
    This is the
    composition the round-3 VERDICT asked for: packing multiplies the
    early stages' channels 4x, which lifts them over the int8 path's
    channel gate that keeps them bf16 in the fine layout.
    """
    k = w.shape[0]
    if mode == "pp":
        wp, s2, pl = pack_weights_packed_to_packed(w, stride, pad)
        hf = (fine_hw or (x.shape[1] * 2, x.shape[2] * 2))
        oh, ow = _out_size(hf[0], k, stride, pad), _out_size(hf[1], k,
                                                             stride, pad)
        assert oh % 2 == 0 and ow % 2 == 0, (
            f"packed output needs an even fine conv output, got "
            f"{(oh, ow)} (mode=pp, fine_hw={hf}, k={k}, s={stride}, "
            f"p={pad}) — an odd size would silently drop the last row")
        out_h, out_w = oh // 2, ow // 2
        in_h, in_w = x.shape[1], x.shape[2]
    elif mode == "pf":
        wp, s2, pl = pack_weights_packed_to_fine(w, stride, pad)
        hf = (fine_hw or (x.shape[1] * 2, x.shape[2] * 2))
        out_h = _out_size(hf[0], k, stride, pad)
        out_w = _out_size(hf[1], k, stride, pad)
        in_h, in_w = x.shape[1], x.shape[2]
    elif mode == "fp":
        wp, s2, pl = pack_weights_fine_to_packed(w, stride, pad)
        hf = (fine_hw or (x.shape[1], x.shape[2]))
        oh, ow = _out_size(hf[0], k, stride, pad), _out_size(hf[1], k,
                                                             stride, pad)
        assert oh % 2 == 0 and ow % 2 == 0, (
            f"packed output needs an even fine conv output, got "
            f"{(oh, ow)} (mode=fp, fine_hw={hf}, k={k}, s={stride}, "
            f"p={pad}) — an odd size would silently drop the last row")
        out_h, out_w = oh // 2, ow // 2
        in_h, in_w = x.shape[1], x.shape[2]
    else:
        raise ValueError(mode)
    kk = wp.shape[0]
    ph = (out_h - 1) * s2 + kk - pl - in_h
    pw = (out_w - 1) * s2 + kk - pl - in_w
    assert ph >= 0 and pw >= 0, (ph, pw, mode, k, stride, pad)
    if act_scale is not None:
        wp32 = wp.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(wp32), axis=(0, 1, 2))  # [O_packed]
        s_w = jnp.where(absmax > 0.0, absmax / 127.0, 1.0)
        q_w = jnp.clip(jnp.round(wp32 / s_w), -127.0, 127.0).astype(jnp.int8)
        q_x = jnp.clip(
            jnp.round(x.astype(jnp.float32) / act_scale), -127.0, 127.0
        ).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            q_x, q_w,
            window_strides=(s2, s2),
            padding=[(pl, ph), (pl, pw)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * (act_scale * s_w)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype),
        window_strides=(s2, s2),
        padding=[(pl, ph), (pl, pw)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
