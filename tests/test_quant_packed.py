"""int8 PTQ x packed-layout composition (round-4 VERDICT item 2).

The fine layout keeps the sub-128-channel early stages bf16 (below the
int8 channel gate, `ops/quant.py::_eligible`); the packed layout
(`ops/packed.py`) multiplies those stages' channels 4x, so the same
convs clear the gate when the program is built packed.  These tests pin
the composition mechanics:

* the packed int8 conv is BIT-IDENTICAL to the fine int8 conv at the
  same activation scale — packing is a permutation, the packed kernel an
  exact scatter, so each packed output channel's absmax equals its fine
  channel's absmax and the int32 accumulators sum the same products;
* scale keys are layout-invariant (``<module>/conv``), so one fine-layout
  calibration serves programs of both layouts;
* the context gate (`quant.packed_act_scale`): no quant outside
  ``quantized()``, channel gate on the PACKED dims, fallthrough without
  a calibrated scale;
* e2e: the 24p exp's quantized inference program in the packed layout
  stays close to fp and actually engages int8 on the early segment.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from eop_tpu.ops import quant
from eop_tpu.ops.packed import pack_nhwc, packed_conv, unpack_nhwc


def _fine_int8(x, w, stride, pad, s_x):
    """Reference fine-layout int8 conv (`ops/quant.py` scheme)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=(0, 1, 2))
    s_w = jnp.where(absmax > 0.0, absmax / 127.0, 1.0)
    q_w = jnp.clip(jnp.round(w32 / s_w), -127.0, 127.0).astype(jnp.int8)
    q_x = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                   -127.0, 127.0).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        q_x, q_w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (s_x * s_w)


@pytest.mark.parametrize("stride,pad,k", [(1, 1, 3), (2, 1, 3), (1, 0, 1)])
def test_packed_int8_bit_identical_to_fine_int8(stride, pad, k):
    rng = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(rng)
    x = jax.random.normal(kx, (2, 16, 16, 32), jnp.float32) * 3.0
    w = jax.random.normal(kw, (k, k, 32, 32), jnp.float32)
    s_x = float(jnp.max(jnp.abs(x))) / 127.0

    fine = _fine_int8(x, w, stride, pad, s_x)
    packed = packed_conv(pack_nhwc(x), w, stride, pad, mode="pp",
                         act_scale=s_x)
    got = unpack_nhwc(packed)
    # same int32 sums, same (s_x * s_w[c]) dequant multiplies -> bitwise
    np.testing.assert_array_equal(np.asarray(got), np.asarray(fine))


def test_packed_int8_pf_mode_matches_fine(
):
    """The packed->fine stride-2 exit conv (dark2 -> dark3 transition)."""
    rng = jax.random.PRNGKey(1)
    kx, kw = jax.random.split(rng)
    x = jax.random.normal(kx, (2, 16, 16, 64), jnp.float32) * 2.0
    w = jax.random.normal(kw, (3, 3, 64, 128), jnp.float32)
    s_x = float(jnp.max(jnp.abs(x))) / 127.0
    fine = _fine_int8(x, w, 2, 1, s_x)
    got = packed_conv(pack_nhwc(x), w, 2, 1, mode="pf", act_scale=s_x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(fine))


def test_packed_act_scale_context_and_gates():
    from eop_tpu.ops.blocks import BaseConv

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return BaseConv(32, 3, 1, in_layout="packed",
                            out_layout="packed", name="c")(x, train)

    model = Net()
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 128)) * 2.0
    variables = model.init(jax.random.PRNGKey(0), x)
    quant_path_scales = {"c/conv": 0.05}

    # outside the quantized() context: no scale, fp path
    y_fp = model.apply(variables, x)
    assert quant._PACKED_QUANT.get() is None

    # inside: eligible (128/128 packed channels >= 64) -> quantized
    @jax.jit
    def run_q(x):
        with quant.quantized(quant_path_scales, 64):
            return model.apply(variables, x)

    y_q = run_q(x)
    assert not np.allclose(np.asarray(y_fp), np.asarray(y_q),
                           atol=1e-7), "int8 path never engaged"
    assert np.allclose(np.asarray(y_fp), np.asarray(y_q), atol=0.2), (
        "int8 error implausibly large")

    # channel gate on PACKED dims: min_channels above 128 -> fp
    @jax.jit
    def run_gated(x):
        with quant.quantized(quant_path_scales, 256):
            return model.apply(variables, x)

    np.testing.assert_allclose(np.asarray(run_gated(x)),
                               np.asarray(y_fp), atol=1e-6)

    # no calibrated scale for this module -> fp fallthrough
    @jax.jit
    def run_nokey(x):
        with quant.quantized({"other/conv": 0.05}, 64):
            return model.apply(variables, x)

    np.testing.assert_allclose(np.asarray(run_nokey(x)),
                               np.asarray(y_fp), atol=1e-6)


def test_scale_keys_align_across_layouts():
    """One fine-layout calibration must produce keys the packed program
    looks up: the fine inner ``nn.Conv`` and the packed kernel holder
    both sit at ``<module>/conv``."""
    from eop_tpu.models import YOLOX, init_model

    model_fine = YOLOX(depth=0.33, width=0.25, num_classes=3, reg_dim=26,
                       packed_early=False)
    model_packed = model_fine.clone(packed_early=True)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3),
                           jnp.float32, 0, 255)
    variables = init_model(model_fine, jax.random.PRNGKey(1), x)

    def observe(batch):
        with nn.intercept_methods(quant.observe_interceptor(16)):
            _, stats = model_fine.apply(
                variables, batch, False, mutable=[quant.QUANT_STATS]
            )
        return jax.device_get(stats)

    scales = quant.calibrate_act_scales(observe, [x])
    # fine C=32 early convs observed at the lowered gate
    assert any("dark2" in p for p in scales), sorted(scales)[:10]

    # the packed program must consume those very keys: count the packed
    # convs that find a scale by monkeypatching the lookup
    hits = []
    real = quant.packed_act_scale

    def spy(mod, in_ch, out_ch):
        s = real(mod, in_ch, out_ch)
        if s is not None:
            hits.append(quant._module_path(mod))
        return s

    quant.packed_act_scale = spy
    try:
        with quant.quantized(scales, 64):
            model_packed.apply(variables, x, False)
    finally:
        quant.packed_act_scale = real
    assert len(hits) >= 4, hits  # the packed early segment engaged
    assert all("dark" in h or "stem" in h for h in hits), hits


def test_24p_exp_quant_packed_e2e():
    """The exp-level quantized inference program at a packed-eligible
    batch: builds packed (per `_infer_model`), engages int8 on the early
    segment, and its detections stay close to the fp program's."""
    from eop_tpu.exp.yolox_24p_base import Exp24P

    class TinyExp(Exp24P):
        def __init__(self):
            super().__init__()
            self.num_classes = 3
            self.depth, self.width = 0.33, 0.25
            self.test_size = (64, 64)
            self.test_conf = 0.01

    exp = TinyExp()
    model = exp.get_model()
    assert getattr(model, "packed_early", False), (
        "24p exp no longer builds a packed-early model — this test "
        "needs updating")
    from eop_tpu.models import init_model

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3),
                           jnp.float32, 0, 255)
    variables = init_model(model, jax.random.PRNGKey(3), x)

    infer_fp = exp.get_infer_fn(model, variables)
    ref = jax.device_get(infer_fp(x))

    hits = []
    real = quant.packed_act_scale

    def spy(mod, in_ch, out_ch):
        s = real(mod, in_ch, out_ch)
        if s is not None:
            hits.append(quant._module_path(mod))
        return s

    quant.packed_act_scale = spy
    try:
        infer_q, scales = exp.get_quant_infer_fn(
            model, variables, [x], min_channels=64
        )
        got = jax.device_get(infer_q(x))
    finally:
        quant.packed_act_scale = real
    assert hits, "quantized packed program never took the int8 path"
    # same candidate structure, close scores on an untrained model
    assert ref.rows.shape == got.rows.shape
    assert np.mean(np.asarray(ref.valid) == np.asarray(got.valid)) > 0.95
