"""PAFPN x {VGG19, ResNet50, DenseNet121} composition parity.

The reference paper's actual comparative experiment runs every backbone
through the SAME PAFPN + YOLOXHead and inspects the 6-tuple
(pan_out2, pan_out1, pan_out0, x2, x1, x0) —
`/root/reference/yolox/models/yolo_pafpn.py:31-58` wires the backbone
switch, `/root/reference/yolox/exp/yolox_base.py:73-90` takes
``backbone_type``, and `/root/reference/yolox/demo_featuremap.py:46-61`
exposes ``--backbone``.  The alternate backbones only exist at width 1.0
(their channel counts are hard-coded to the yolox-l taps), so these tests
compose at depth/width 1.0 with imported weights and check the FULL
6-tuple plus the decoded head output against the reference's own modules.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from eop_tpu.models import YOLOX, inference_outputs
from eop_tpu.utils.torch_import import convert_state_dict, merge_into_variables

import ref_loader

RTOL, ATOL = 5e-4, 5e-4
# full-width nets stack ~60 convs; XLA-CPU's reduced-precision convs
# accumulate to ~1e-3 absolute on O(10) activations by the deep taps
DEEP_ATOL = 5e-3


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _build_ref(backbone_type, num_classes=8):
    pafpn = ref_loader.ref_module("yolo_pafpn")
    head = ref_loader.ref_module("yolo_head")
    yolox = ref_loader.ref_module("yolox")
    torch.manual_seed(42)
    backbone = pafpn.YOLOPAFPN(backbone_type, 1.0, 1.0)
    h = head.YOLOXHead(num_classes, 1.0)
    model = yolox.YOLOX(backbone, h)
    ref_loader.apply_init_yolo(model)
    h.initialize_biases(1e-2)
    return model.eval()


def _compose_and_check(backbone_type):
    tm = _build_ref(backbone_type)
    x = np.random.RandomState(5).randn(1, 3, 64, 64).astype(np.float32)
    xj = jnp.asarray(to_nhwc(x))

    fm = YOLOX(backbone_type=backbone_type, depth=1.0, width=1.0,
               num_classes=8)
    template = fm.init(jax.random.PRNGKey(0), xj, False)
    converted = convert_state_dict(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )
    variables, report = merge_into_variables(template, converted)
    assert not report["missing"], f"missing: {report['missing'][:8]}"
    assert not report["unexpected"], f"unexpected: {report['unexpected'][:8]}"

    with torch.no_grad():
        ref_dec, ref_fpn = tm(torch.from_numpy(x))

    head_outs, fpn_outs = fm.apply(variables, xj, False)

    # the full 6-tuple: 3 PAN maps + the 3 raw backbone taps
    assert len(ref_fpn) == len(fpn_outs) == 6
    names = ["pan_out2", "pan_out1", "pan_out0", "x2", "x1", "x0"]
    for name, r, o in zip(names, ref_fpn, fpn_outs):
        r = to_nhwc(r.numpy())
        o = np.asarray(o)
        assert r.shape == o.shape, (
            f"{backbone_type}/{name}: shape {o.shape} != ref {r.shape}"
        )
        np.testing.assert_allclose(
            r, o, rtol=RTOL, atol=DEEP_ATOL,
            err_msg=f"{backbone_type}/{name}",
        )

    ours_dec = np.asarray(inference_outputs(head_outs))
    np.testing.assert_allclose(ref_dec.numpy(), ours_dec,
                               rtol=1e-3, atol=DEEP_ATOL)


def test_pafpn_vgg_composition():
    _compose_and_check("vgg")


def test_pafpn_resnet_composition():
    _compose_and_check("resnet")


def test_pafpn_densenet_composition():
    _compose_and_check("densenet")


def test_pafpn_tap_channels_all_backbones():
    """Every backbone's taps must land on the (256, 512, 1024) contract the
    PAFPN laterals assume (ref restricts alternates to width 1.0)."""
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    for bt in ("darknet", "vgg", "resnet", "densenet"):
        fm = YOLOX(backbone_type=bt, depth=1.0, width=1.0, num_classes=8)
        out, _ = jax.eval_shape(
            lambda k, xx: fm.init_with_output(k, xx, False),
            jax.random.PRNGKey(0), x,
        )
        head_outs, fpn_outs = out
        chans = [o.shape[-1] for o in fpn_outs]
        assert chans == [256, 512, 1024, 256, 512, 1024], (bt, chans)
