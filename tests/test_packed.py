"""Exactness of the packed-layout conv re-expression (ops/packed.py).

Every case used by the packed early-stage path must be bit-comparable to
the fine conv in fp32: pack/unpack roundtrip, packed-in/packed-out convs
(stride 1 and 2), packed-in/fine-out (dark3 entry), fine-in/packed-out
(stem), and gradient equivalence through a small conv chain.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eop_tpu.ops.packed import (
    pack_nhwc,
    unpack_nhwc,
    packed_conv,
)


def _fine_conv(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_pack_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 3), jnp.float32)
    xp = pack_nhwc(x)
    assert xp.shape == (2, 4, 6, 12)
    np.testing.assert_array_equal(np.asarray(unpack_nhwc(xp)), np.asarray(x))


def test_pack_channel_major_order():
    # packed channel = c*4 + pi*2 + pj
    x = np.zeros((1, 4, 4, 2), np.float32)
    x[0, 1, 0, 1] = 7.0  # c=1, cell (0,0), phase (pi=1, pj=0) -> ch 1*4+2=6
    xp = np.asarray(pack_nhwc(jnp.asarray(x)))
    assert xp[0, 0, 0, 6] == 7.0
    assert xp.sum() == 7.0


CASES_PP = [
    # (H, W, Ci, Co, k, stride, pad)  — the dark2 shapes at toy size
    (16, 16, 3, 8, 6, 2, 2),    # stem-like
    (16, 16, 8, 16, 3, 2, 1),   # dark2_conv
    (16, 16, 16, 8, 1, 1, 0),   # csp 1x1
    (16, 16, 8, 8, 3, 1, 1),    # bottleneck 3x3
    (20, 12, 8, 8, 3, 1, 1),    # non-square
    (16, 16, 8, 8, 5, 1, 2),    # 5x5 (SPP-adjacent sanity)
]


@pytest.mark.parametrize("h,w,ci,co,k,s,p", CASES_PP)
def test_packed_to_packed(h, w, ci, co, k, s, p):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
    wgt = jnp.asarray(rng.randn(k, k, ci, co), jnp.float32)
    ref = _fine_conv(x, wgt, s, p)
    out = packed_conv(pack_nhwc(x), wgt, s, p, mode="pp", fine_hw=(h, w))
    assert out.shape == (2, ref.shape[1] // 2, ref.shape[2] // 2, 4 * co)
    np.testing.assert_allclose(
        np.asarray(unpack_nhwc(out)), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,w,ci,co,k,s,p", [
    (16, 16, 16, 32, 3, 2, 1),   # dark3_conv: packed in, fine out
    (24, 16, 8, 8, 6, 2, 2),
])
def test_packed_to_fine(h, w, ci, co, k, s, p):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
    wgt = jnp.asarray(rng.randn(k, k, ci, co), jnp.float32)
    ref = _fine_conv(x, wgt, s, p)
    out = packed_conv(pack_nhwc(x), wgt, s, p, mode="pf", fine_hw=(h, w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("h,w,ci,co,k,s,p", [
    (32, 32, 3, 8, 6, 2, 2),     # the folded stem: fine image in, packed out
    (16, 24, 3, 8, 3, 2, 1),
])
def test_fine_to_packed(h, w, ci, co, k, s, p):
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
    wgt = jnp.asarray(rng.randn(k, k, ci, co), jnp.float32)
    ref = _fine_conv(x, wgt, s, p)
    out = packed_conv(x, wgt, s, p, mode="fp", fine_hw=(h, w))
    np.testing.assert_allclose(
        np.asarray(unpack_nhwc(out)), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradient_equivalence_chain():
    """stem -> dark2_conv -> 1x1 -> 3x3 chain: same loss, same weight grads."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    w_stem = jnp.asarray(rng.randn(6, 6, 3, 8) * 0.1, jnp.float32)
    w_down = jnp.asarray(rng.randn(3, 3, 8, 16) * 0.1, jnp.float32)
    w_pw = jnp.asarray(rng.randn(1, 1, 16, 8) * 0.1, jnp.float32)
    w_b3 = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)

    def fine(ws):
        a, b, c, d = ws
        y = jax.nn.silu(_fine_conv(x, a, 2, 2))
        y = jax.nn.silu(_fine_conv(y, b, 2, 1))
        y = jax.nn.silu(_fine_conv(y, c, 1, 0))
        y = jax.nn.silu(_fine_conv(y, d, 1, 1))
        return jnp.sum(y * y)

    def packed(ws):
        a, b, c, d = ws
        hw = (x.shape[1], x.shape[2])
        y = jax.nn.silu(packed_conv(x, a, 2, 2, mode="fp", fine_hw=hw))
        hw = (hw[0] // 2, hw[1] // 2)
        y = jax.nn.silu(packed_conv(y, b, 2, 1, mode="pp", fine_hw=hw))
        hw = (hw[0] // 2, hw[1] // 2)
        y = jax.nn.silu(packed_conv(y, c, 1, 0, mode="pp", fine_hw=hw))
        y = jax.nn.silu(packed_conv(y, d, 1, 1, mode="pp", fine_hw=hw))
        return jnp.sum(y * y)

    ws = (w_stem, w_down, w_pw, w_b3)
    lf, gf = jax.value_and_grad(fine)(ws)
    lp, gp = jax.value_and_grad(packed)(ws)
    np.testing.assert_allclose(float(lf), float(lp), rtol=1e-5)
    for a, b in zip(gf, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
