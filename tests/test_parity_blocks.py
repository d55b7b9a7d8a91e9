"""fp32 output parity of network blocks vs the PyTorch reference
(`yolox/models/network_blocks.py`), with weights imported torch -> flax."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from eop_tpu.ops import blocks as jblocks
from eop_tpu.utils.torch_import import convert_state_dict, merge_into_variables

import ref_loader

RTOL, ATOL = 1e-5, 1e-5


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def run_pair(torch_mod, flax_mod, x_nchw, train=False):
    torch_mod = ref_loader.apply_init_yolo(torch_mod).eval()
    with torch.no_grad():
        ref_out = torch_mod(torch.from_numpy(x_nchw)).numpy()

    x = jnp.asarray(to_nhwc(x_nchw))
    template = flax_mod.init(jax.random.PRNGKey(0), x, False)
    converted = convert_state_dict(
        {k: v.numpy() for k, v in torch_mod.state_dict().items()}
    )
    variables, report = merge_into_variables(template, converted)
    assert not report["missing"], report["missing"]
    assert not report["unexpected"], report["unexpected"]
    out = np.asarray(flax_mod.apply(variables, x, train))
    return to_nhwc(ref_out), out


def test_base_conv():
    rb = ref_loader.ref_module("network_blocks")
    x = np.random.RandomState(0).randn(2, 8, 16, 16).astype(np.float32)
    ref, ours = run_pair(
        rb.BaseConv(8, 16, ksize=3, stride=2),
        jblocks.BaseConv(16, 3, 2),
        x,
    )
    np.testing.assert_allclose(ref, ours, rtol=RTOL, atol=ATOL)


def test_dwconv():
    rb = ref_loader.ref_module("network_blocks")
    x = np.random.RandomState(1).randn(1, 8, 12, 12).astype(np.float32)
    ref, ours = run_pair(
        rb.DWConv(8, 16, ksize=3, stride=1),
        jblocks.DWConv(16, 3, 1),
        x,
    )
    np.testing.assert_allclose(ref, ours, rtol=RTOL, atol=ATOL)


def test_csp_layer():
    rb = ref_loader.ref_module("network_blocks")
    x = np.random.RandomState(2).randn(1, 16, 8, 8).astype(np.float32)
    ref, ours = run_pair(
        rb.CSPLayer(16, 16, n=2),
        jblocks.CSPLayer(16, n=2),
        x,
    )
    np.testing.assert_allclose(ref, ours, rtol=RTOL, atol=ATOL)


def test_spp_bottleneck():
    rb = ref_loader.ref_module("network_blocks")
    x = np.random.RandomState(3).randn(1, 16, 16, 16).astype(np.float32)
    ref, ours = run_pair(
        rb.SPPBottleneck(16, 32),
        jblocks.SPPBottleneck(32),
        x,
    )
    np.testing.assert_allclose(ref, ours, rtol=RTOL, atol=ATOL)


def test_focus():
    rb = ref_loader.ref_module("network_blocks")
    x = np.random.RandomState(4).randn(1, 3, 16, 16).astype(np.float32)
    ref, ours = run_pair(
        rb.Focus(3, 16, ksize=3),
        jblocks.Focus(16, ksize=3),
        x,
    )
    np.testing.assert_allclose(ref, ours, rtol=RTOL, atol=ATOL)


def test_res_layer():
    rb = ref_loader.ref_module("network_blocks")
    x = np.random.RandomState(5).randn(1, 16, 8, 8).astype(np.float32)
    ref, ours = run_pair(
        rb.ResLayer(16),
        jblocks.ResLayer(),
        x,
    )
    np.testing.assert_allclose(ref, ours, rtol=RTOL, atol=ATOL)


def test_bottleneck_shortcut():
    rb = ref_loader.ref_module("network_blocks")
    x = np.random.RandomState(6).randn(1, 16, 8, 8).astype(np.float32)
    ref, ours = run_pair(
        rb.Bottleneck(16, 16, shortcut=True),
        jblocks.Bottleneck(16, shortcut=True),
        x,
    )
    np.testing.assert_allclose(ref, ours, rtol=RTOL, atol=ATOL)


def test_maxpool_same_custom_vjp_matches_select_and_scatter():
    """The fused max-pool backward must equal XLA's select_and_scatter
    gradient (no ties in random fp32 input)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from eop_tpu.ops.blocks import _maxpool_same

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 9, 9, 7).astype(np.float32))
    ct = jnp.asarray(rng.randn(2, 9, 9, 7).astype(np.float32))

    for k in (3, 5, 9, 13):
        pad = k // 2

        def ref_pool(z):
            return nn.max_pool(z, (k, k), strides=(1, 1),
                               padding=[(pad, pad), (pad, pad)])

        y, ref_vjp = jax.vjp(ref_pool, x)
        y2, our_vjp = jax.vjp(lambda z: _maxpool_same(z, k), x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
        np.testing.assert_allclose(
            np.asarray(ref_vjp(ct)[0]), np.asarray(our_vjp(ct)[0]),
            rtol=1e-6, atol=1e-6, err_msg=f"k={k}",
        )


def test_maxpool_same_tie_gradient_mass_conserved():
    """With exact ties (realistic in bf16) the gradient must SPLIT across
    window maxima, not duplicate: total mass is conserved."""
    import jax
    import jax.numpy as jnp

    from eop_tpu.ops.blocks import _maxpool_same

    # constant input: every window is an all-tie
    x = jnp.ones((1, 6, 6, 2), jnp.float32)
    ct = jnp.asarray(
        np.arange(72, dtype=np.float32).reshape(1, 6, 6, 2)
    )
    for k in (3, 5):
        _, vjp = jax.vjp(lambda z: _maxpool_same(z, k), x)
        dx = np.asarray(vjp(ct)[0])
        np.testing.assert_allclose(dx.sum(), float(ct.sum()), rtol=1e-5)

    # mixed: one tie pair in an otherwise unique row
    x2 = jnp.asarray(
        np.array([[5.0, 1.0, 5.0, 0.0, 2.0]], np.float32)
    )[:, :, None, None]  # [1, 5, 1, 1]
    ct2 = jnp.ones_like(x2)
    _, vjp2 = jax.vjp(lambda z: _maxpool_same(z, 3), x2)
    dx2 = np.asarray(vjp2(ct2)[0]).ravel()
    np.testing.assert_allclose(dx2.sum(), 5.0, rtol=1e-6)  # mass of ct
    # window at index 1 ([5,1,5]) has a tie: its unit mass splits .5/.5
    # windows 0 ([-,5,1]->5) and 2 ([1,5? ...]) contribute fully to maxima
    assert dx2[1] == 0.0 and dx2[3] == 0.0  # never the max anywhere
