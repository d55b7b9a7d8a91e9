"""int8 post-training quantization (eop_tpu/ops/quant.py).

Covers: eligibility selection (channel threshold, grouped convs),
calibration via the observer interceptor, closeness of the quantized
forward to fp on both exp families, fallthrough when scales are missing,
and the quantized serving program through the StableHLO export
roundtrip.  (Capability beyond the reference — it has no quantized
path; its fastest eval mode is fp16 autocast,
`yolox/evaluators/coco_evaluator.py:139-142`.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from eop_tpu.exp import Exp
from eop_tpu.exp.yolox_24p_base import Exp24P
from eop_tpu.models import init_model
from eop_tpu.ops import quant
from eop_tpu.ops.blocks import BaseConv, DWConv


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = BaseConv(32, 3, 1, name="wide1")(x, train)
        x = DWConv(32, 3, 1, name="dw")(x, train)
        x = BaseConv(32, 3, 2, name="wide2")(x, train)
        x = BaseConv(8, 1, 1, name="narrow")(x, train)
        return x


def _calibrated(model, variables, batches, min_channels):
    def observe(batch):
        with nn.intercept_methods(quant.observe_interceptor(min_channels)):
            _, stats = model.apply(
                variables, batch, False, mutable=[quant.QUANT_STATS]
            )
        return stats

    return quant.calibrate_act_scales(observe, batches)


def test_eligibility_and_calibration():
    model = _Net()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32))
    variables = model.init(jax.random.PRNGKey(1), x)
    scales = _calibrated(model, variables, [x], min_channels=16)
    paths = set(scales)
    # wide1 input has 32 ch, wide2 input 32 ch -> eligible.
    assert "wide1/conv" in paths and "wide2/conv" in paths
    # narrow conv (8 out) and both halves of the depthwise block are out:
    # the depthwise conv is grouped; its 1x1 pointwise (32->32) qualifies.
    assert "narrow/conv" not in paths
    assert not any(p.startswith("dw/") and "dconv" in p for p in paths)
    assert all(s > 0 for s in scales.values())


def test_calibration_takes_max_over_batches():
    model = _Net()
    x1 = jnp.ones((1, 8, 8, 32)) * 0.5
    x2 = jnp.ones((1, 8, 8, 32)) * 2.0
    variables = model.init(jax.random.PRNGKey(0), x1)
    s_two = _calibrated(model, variables, [x1, x2], 16)
    s_big = _calibrated(model, variables, [x2], 16)
    assert s_two["wide1/conv"] == pytest.approx(s_big["wide1/conv"])


def test_quantized_forward_close_and_fallthrough():
    model = _Net()
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 32))
    variables = model.init(jax.random.PRNGKey(3), x)
    ref = model.apply(variables, x, False)
    scales = _calibrated(model, variables, [x], 16)

    def qfwd(xx):
        with quant.quantized(scales, 16):
            return model.apply(variables, xx, False)

    out = jax.jit(qfwd)(x)
    rel = float(
        jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9)
    )
    assert rel < 0.1, rel

    # empty scales -> bitwise identical to the fp path
    def nofwd(xx):
        with quant.quantized({}, 16):
            return model.apply(variables, xx, False)

    np.testing.assert_array_equal(np.asarray(jax.jit(nofwd)(x)),
                                  np.asarray(ref))


def _tiny(exp):
    exp.depth, exp.width = 0.33, 0.25
    exp.num_classes = 3
    exp.input_size = exp.test_size = (64, 64)
    exp.test_conf = 0.05
    model = exp.get_model()
    variables = init_model(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    return exp, model, variables


@pytest.mark.parametrize("family", ["bbox", "24p"])
def test_quant_infer_fn_family(family):
    exp, model, variables = _tiny(Exp() if family == "bbox" else Exp24P())
    imgs = np.random.RandomState(0).randint(
        0, 255, (2, 64, 64, 3), np.uint8
    )
    qvars, scales = exp.quantize_for_inference(
        model, variables, [imgs], min_channels=16
    )
    assert scales, "no convs calibrated at width 0.25 / min_channels 16"

    # decoded head outputs stay close to the fp path (pre-NMS: detection
    # sets at a random init are threshold-noise; raw decode is stable)
    from eop_tpu.models import inference_outputs

    reg_dim = 26 if family == "24p" else 4

    def decode(v, q):
        def f(im):
            im = im.astype(jnp.float32)
            head_outs, _ = exp._forward(model, v, im, q, 16)
            return inference_outputs(head_outs, reg_dim=reg_dim,
                                     out_dtype=jnp.float32)
        return jax.jit(f)

    ref = decode(qvars, None)(imgs)
    out = decode(qvars, scales)(imgs)
    # objectness/class scores live in [0,1]; geometry is in pixels
    np.testing.assert_allclose(
        np.asarray(out[..., reg_dim:]), np.asarray(ref[..., reg_dim:]),
        atol=0.05
    )
    # geometry: the 24p radii decode through exp(), which amplifies
    # logit-level quant error multiplicatively at a random init — bound
    # the error relative to the prediction magnitude, not in pixels
    geo_out = np.asarray(out[..., :reg_dim])
    geo_ref = np.asarray(ref[..., :reg_dim])
    geo_rel = np.max(np.abs(geo_out - geo_ref)) / (
        np.max(np.abs(geo_ref)) + 1e-9
    )
    assert geo_rel < 0.15, geo_rel

    # the full quant handle (forward+decode+NMS) runs and returns the
    # same structure as the fp one
    infer, scales2 = exp.get_quant_infer_fn(
        model, variables, [imgs], min_channels=16
    )
    det = infer(imgs)
    assert scales2 == scales
    fp_det = exp.get_infer_fn(model, qvars)(imgs)
    assert np.asarray(det.rows).shape == np.asarray(fp_det.rows).shape


def test_quant_serving_export_roundtrip(tmp_path):
    from eop_tpu.utils.serving_export import (
        export_serving,
        load_serving_artifact,
        save_serving_artifact,
    )

    exp, model, variables = _tiny(Exp24P())
    src_hw = (48, 80)
    raw = np.random.RandomState(1).randint(
        0, 255, (2, *src_hw, 3), np.uint8
    )
    # calibrate on letterboxed inputs exactly as serving will see them
    from eop_tpu.data.transforms import letterbox_batch_device

    calib, _ = letterbox_batch_device(
        jnp.asarray(raw, jnp.float32), src_hw, exp.test_size
    )
    qvars, scales = exp.quantize_for_inference(
        model, variables, [calib], min_channels=16
    )
    exported = export_serving(
        exp, model, qvars, batch_size=2, src_hw=src_hw,
        platforms=("cpu",), quant_scales=scales, quant_min_channels=16,
    )
    path = str(tmp_path / "quant.stablehlo")
    assert save_serving_artifact(exported, path) > 1000

    live = exp.get_serving_fn(
        model, qvars, src_hw, quant_scales=scales, quant_min_channels=16
    )(raw)
    out = load_serving_artifact(path).call(raw)
    np.testing.assert_array_equal(
        np.asarray(out["valid"]), np.asarray(live.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(out["rows"]), np.asarray(live.rows)
    )


def test_sharded_quant_inference_matches_single_device():
    """int8 + multi-chip compose: the mesh-sharded quantized program
    must reproduce the single-device quantized detections."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from eop_tpu.parallel import make_mesh, shard_batch

    exp, model, variables = _tiny(Exp24P())
    exp.test_conf = 1e-4  # random-init scores: keep a non-degenerate scene
    imgs = (np.random.RandomState(3).rand(8, 64, 64, 3) * 255).astype(
        np.float32
    )
    qvars, scales = exp.quantize_for_inference(
        model, variables, [imgs], min_channels=16
    )
    single = jax.jit(exp._infer_body(model, qvars, scales, 16))
    ref = jax.device_get(single(imgs))

    mesh = make_mesh(8)
    sharded = exp.get_sharded_infer_fn(
        model, qvars, mesh, quant_scales=scales, quant_min_channels=16
    )
    with mesh:
        out = sharded(shard_batch(mesh, imgs))
    assert len(out.rows.sharding.device_set) == 8
    got = jax.device_get(out)
    np.testing.assert_allclose(ref.rows, got.rows, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(ref.valid, got.valid)
