"""fp32 end-to-end parity of full models vs the PyTorch reference, with
weights imported torch -> flax (eval mode, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from eop_tpu.models import (
    YOLOX,
    YOLOv3,
    densenet121,
    resnet50,
    vgg19,
    inference_outputs,
)
from eop_tpu.models.darknet import CSPDarknet, Darknet
from eop_tpu.utils.torch_import import (
    convert_state_dict,
    map_yolofpn_key,
    merge_into_variables,
)

import ref_loader

# this image's XLA-CPU convs run at reduced precision (~2e-3 relative on
# a single conv); deep stacks need the looser bound
RTOL, ATOL = 5e-4, 5e-4


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def import_weights(torch_model, flax_model, x_nhwc, key_mapper=None,
                   allow_missing=False):
    template = flax_model.init(jax.random.PRNGKey(0), x_nhwc, False)
    kw = {"key_mapper": key_mapper} if key_mapper else {}
    converted = convert_state_dict(
        {k: v.numpy() for k, v in torch_model.state_dict().items()}, **kw
    )
    variables, report = merge_into_variables(template, converted)
    if not allow_missing:
        assert not report["missing"], f"missing: {report['missing'][:5]}"
    assert not report["unexpected"], f"unexpected: {report['unexpected'][:5]}"
    return variables


def seeded_input(shape, seed=0):
    torch.manual_seed(seed)
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def check_feature_dict(ref_out, our_out):
    assert set(ref_out.keys()) == set(our_out.keys())
    for k in ref_out:
        np.testing.assert_allclose(
            to_nhwc(ref_out[k].numpy()), np.asarray(our_out[k]),
            rtol=RTOL, atol=ATOL, err_msg=k,
        )


def test_cspdarknet():
    rd = ref_loader.ref_module("darknet")
    tm = ref_loader.apply_init_yolo(rd.CSPDarknet(0.33, 0.25)).eval()
    x = seeded_input((1, 3, 64, 64))
    xj = jnp.asarray(to_nhwc(x))
    fm = CSPDarknet(0.33, 0.25)
    variables = import_weights(tm, fm, xj)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    check_feature_dict(ref_out, fm.apply(variables, xj, False))


def test_darknet21():
    rd = ref_loader.ref_module("darknet")
    tm = ref_loader.apply_init_yolo(rd.Darknet(21)).eval()
    x = seeded_input((1, 3, 64, 64))
    xj = jnp.asarray(to_nhwc(x))
    fm = Darknet(21)
    variables = import_weights(
        tm, fm, xj, key_mapper=lambda k: map_yolofpn_key(k, depth=21)
    )
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    check_feature_dict(ref_out, fm.apply(variables, xj, False))


def test_vgg19():
    rv = ref_loader.ref_module("vgg")
    tm = ref_loader.apply_init_yolo(rv.vgg19()).eval()
    x = seeded_input((1, 3, 64, 64))
    xj = jnp.asarray(to_nhwc(x))
    fm = vgg19()
    variables = import_weights(tm, fm, xj)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    check_feature_dict(ref_out, fm.apply(variables, xj, False))


def test_resnet50():
    rr = ref_loader.ref_module("resnet")
    tm = ref_loader.apply_init_yolo(rr.resnet50()).eval()
    x = seeded_input((1, 3, 64, 64))
    xj = jnp.asarray(to_nhwc(x))
    fm = resnet50()
    variables = import_weights(tm, fm, xj)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    check_feature_dict(ref_out, fm.apply(variables, xj, False))


def test_densenet121():
    rd = ref_loader.ref_module("densenet")
    tm = ref_loader.apply_init_yolo(rd.densenet121()).eval()
    x = seeded_input((1, 3, 64, 64))
    xj = jnp.asarray(to_nhwc(x))
    fm = densenet121()
    variables = import_weights(tm, fm, xj)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    check_feature_dict(ref_out, fm.apply(variables, xj, False))


def _build_ref_yolox(num_classes=8, depth=0.33, width=0.25):
    rm = ref_loader.ref_models()
    pafpn = ref_loader.ref_module("yolo_pafpn")
    head = ref_loader.ref_module("yolo_head")
    yolox = ref_loader.ref_module("yolox")
    backbone = pafpn.YOLOPAFPN("darknet", depth, width)
    h = head.YOLOXHead(num_classes, width)
    model = yolox.YOLOX(backbone, h)
    ref_loader.apply_init_yolo(model)
    # the reference also re-inits the prior-prob biases in get_model
    h.initialize_biases(1e-2)
    return model.eval()


def test_yolox_full_inference():
    tm = _build_ref_yolox()
    x = seeded_input((2, 3, 64, 64), seed=7)
    xj = jnp.asarray(to_nhwc(x))
    fm = YOLOX(depth=0.33, width=0.25, num_classes=8)
    variables = import_weights(tm, fm, xj)
    with torch.no_grad():
        ref_dec, ref_fpn = tm(torch.from_numpy(x))

    head_outs, fpn_outs = fm.apply(variables, xj, False)
    ours_dec = np.asarray(inference_outputs(head_outs))
    np.testing.assert_allclose(
        ref_dec.numpy(), ours_dec, rtol=1e-4, atol=1e-4
    )
    # FPN taps (the feature-map exploration surface)
    for i, (r, o) in enumerate(zip(ref_fpn, fpn_outs)):
        np.testing.assert_allclose(
            to_nhwc(r.numpy()), np.asarray(o), rtol=RTOL, atol=ATOL,
            err_msg=f"fpn_out[{i}]",
        )


def test_yolov3_full_inference():
    rm = ref_loader.ref_models()
    fpn = ref_loader.ref_module("yolo_fpn")
    head = ref_loader.ref_module("yolo_head")
    backbone = fpn.YOLOFPN(depth=21)
    h = head.YOLOXHead(num_classes=8, width=1.0,
                       in_channels=[128, 256, 512], act="lrelu")
    yolox = ref_loader.ref_module("yolox")
    tm = ref_loader.apply_init_yolo(yolox.YOLOX(backbone, h))
    h.initialize_biases(1e-2)
    tm = tm.eval()

    x = seeded_input((1, 3, 64, 64), seed=8)
    xj = jnp.asarray(to_nhwc(x))

    from eop_tpu.models.pafpn import YOLOFPN as JFPN
    from eop_tpu.models.yolox import YOLOv3 as _  # noqa: F401

    import flax.linen as nn

    class TinyYOLOv3(nn.Module):
        @nn.compact
        def __call__(self, xx, train=False):
            from eop_tpu.models.head import YOLOXHead as JHead

            fpn_outs = JFPN(depth=21, name="backbone")(xx, train)
            return JHead(num_classes=8, in_channels=(128, 256, 512),
                         act="lrelu", name="head")(fpn_outs, train), fpn_outs

    fm = TinyYOLOv3()
    variables = import_weights(
        tm, fm, xj, key_mapper=lambda k: map_yolofpn_key(k, depth=21)
    )
    with torch.no_grad():
        ref_dec, _unused = tm(torch.from_numpy(x))
    head_outs, _ = fm.apply(variables, xj, False)
    ours_dec = np.asarray(inference_outputs(head_outs))
    np.testing.assert_allclose(ref_dec.numpy(), ours_dec, rtol=1e-4, atol=1e-4)


def test_yolox_24p_head_inference():
    """26-channel head decode parity (`yolox_24p/models/yolo_head_24p.py`)."""
    ref_loader.install_stubs()
    ref_loader.ref_24p_boxes()  # registers the "utils" stub for the import
    import importlib
    import sys
    import types

    ref_loader._synthetic_package(
        "ref_models_24p", f"{ref_loader.REF}/yolox_24p/models"
    )
    # make sure "utils" has what the head imports
    boxes24 = sys.modules["_ref_24p_boxes"]
    u = sys.modules.setdefault("utils", types.ModuleType("utils"))
    u.bboxes_iou = boxes24.bboxes_iou
    u.postprocess = boxes24.postprocess
    head24 = importlib.import_module("ref_models_24p.yolo_head_24p")
    pafpn24 = importlib.import_module("ref_models_24p.yolo_pafpn")

    torch.manual_seed(0)
    tb = pafpn24.YOLOPAFPN(0.33, 0.25)
    th = head24.YOLOXHead(num_classes=8, width=0.25)
    ref_loader.apply_init_yolo(tb)
    ref_loader.apply_init_yolo(th)
    th.initialize_biases(1e-2)
    tb, th = tb.eval(), th.eval()

    x = seeded_input((1, 3, 64, 64), seed=9)
    with torch.no_grad():
        fpn = tb(torch.from_numpy(x))
        ref_dec = th(fpn, train=False).numpy()

    xj = jnp.asarray(to_nhwc(x))
    fm = YOLOX(depth=0.33, width=0.25, num_classes=8, reg_dim=26)
    template = fm.init(jax.random.PRNGKey(0), xj, False)
    sd = {f"backbone.{k}": v for k, v in tb.state_dict().items()}
    sd.update({f"head.{k}": v for k, v in th.state_dict().items()})
    converted = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    variables, report = merge_into_variables(template, converted)
    assert not report["missing"], report["missing"][:5]

    head_outs, _ = fm.apply(variables, xj, False)
    ours_dec = np.asarray(inference_outputs(head_outs, reg_dim=26))
    np.testing.assert_allclose(ref_dec, ours_dec, rtol=1e-4, atol=1e-4)


def test_yolox_nano_depthwise_inference():
    """Depthwise (nano-style) model: DWConv key mapping + decode parity."""
    pafpn = ref_loader.ref_module("yolo_pafpn")
    head = ref_loader.ref_module("yolo_head")
    yolox = ref_loader.ref_module("yolox")
    torch.manual_seed(3)
    backbone = pafpn.YOLOPAFPN("darknet", 0.33, 0.25, depthwise=True)
    h = head.YOLOXHead(4, 0.25, depthwise=True)
    tm = ref_loader.apply_init_yolo(yolox.YOLOX(backbone, h))
    h.initialize_biases(1e-2)
    tm = tm.eval()

    x = seeded_input((1, 3, 64, 64), seed=11)
    xj = jnp.asarray(to_nhwc(x))
    fm = YOLOX(depth=0.33, width=0.25, num_classes=4, depthwise=True)
    variables = import_weights(tm, fm, xj)
    with torch.no_grad():
        ref_dec, _ = tm(torch.from_numpy(x))
    head_outs, _ = fm.apply(variables, xj, False)
    ours_dec = np.asarray(inference_outputs(head_outs))
    np.testing.assert_allclose(ref_dec.numpy(), ours_dec,
                               rtol=5e-4, atol=5e-4)
