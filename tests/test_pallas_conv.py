"""Correctness of the Pallas phase-matmul conv vs lax.conv (interpret
mode on CPU; the real-chip perf comparison lives in BASELINE.md)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from eop_tpu.ops.pallas import phase_conv


def _lax_conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


CASES = [
    # (k, stride, padding, H, W, C, Co)  — the stages this kernel targets
    (1, 1, 0, 20, 20, 64, 32),           # CSP 1x1
    (3, 1, 1, 16, 24, 32, 32),           # bottleneck 3x3 s1
    (3, 2, 1, 32, 40, 32, 64),           # dark2 down conv
    (6, 2, 2, 32, 32, 3, 32),            # folded Focus stem
    (3, 2, 1, 16, 16, 64, 128),          # dark3 down conv (C' = 256 lanes)
]


@pytest.mark.parametrize("k,s,p,h,w,c,co", CASES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_phase_conv_matches_lax(k, s, p, h, w, c, co, dtype):
    rng = np.random.RandomState(k * 10 + s)
    x = jnp.asarray(rng.randn(2, h, w, c), dtype)
    wgt = jnp.asarray(rng.randn(k, k, c, co) * 0.1, dtype)
    with pltpu.force_tpu_interpret_mode():
        got = phase_conv(x, wgt, stride=s, padding=p)
    want = _lax_conv(x, wgt, s, p)
    assert got.shape == want.shape, (got.shape, want.shape)
    tol = 1e-4 if dtype == jnp.float32 else 2e-1
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol,
    )


def test_phase_conv_rejects_unsupported():
    x = jnp.zeros((1, 8, 8, 4))
    w = jnp.zeros((5, 5, 4, 8))
    with pytest.raises(AssertionError):
        phase_conv(x, w, stride=2, padding=0)
