"""End-to-end golden test on the reference's single-image COCO fixture
(`/root/reference/yolox/test_data/000000130566.jpg`): real image ->
letterbox -> model (weights imported from the torch reference) -> decoded
predictions, fp32 parity vs the torch pipeline."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp
import torch

from eop_tpu.data.augment import preproc
from eop_tpu.models import YOLOX, inference_outputs
from eop_tpu.utils.torch_import import convert_state_dict, merge_into_variables

import ref_loader

FIXTURE = "/root/reference/yolox/test_data/000000130566.jpg"


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_fixture_image_e2e_parity():
    img = cv2.imread(FIXTURE)
    assert img is not None

    # --- reference pipeline (torch, CPU) ---
    pafpn = ref_loader.ref_module("yolo_pafpn")
    head = ref_loader.ref_module("yolo_head")
    yolox_mod = ref_loader.ref_module("yolox")
    torch.manual_seed(0)
    tm = yolox_mod.YOLOX(
        pafpn.YOLOPAFPN("darknet", 0.33, 0.25),
        head.YOLOXHead(80, 0.25),
    )
    ref_loader.apply_init_yolo(tm)
    tm.head.initialize_biases(1e-2)
    tm = tm.eval()

    test_size = (320, 320)
    # reference preproc (CHW) transcribed minimally for the golden input
    r = min(test_size[0] / img.shape[0], test_size[1] / img.shape[1])
    resized = cv2.resize(
        img, (int(img.shape[1] * r), int(img.shape[0] * r)),
        interpolation=cv2.INTER_LINEAR,
    ).astype(np.uint8)
    padded = np.ones((*test_size, 3), np.uint8) * 114
    padded[: resized.shape[0], : resized.shape[1]] = resized
    ref_in = padded.transpose(2, 0, 1)[None].astype(np.float32)
    with torch.no_grad():
        ref_dec, _ = tm(torch.from_numpy(ref_in))

    # --- ours (same weights, NHWC letterbox) ---
    ours_in, r2 = preproc(img, test_size)
    assert r2 == pytest.approx(r)
    fm = YOLOX(depth=0.33, width=0.25, num_classes=80)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(ours_in[None]),
                       False)
    variables, report = merge_into_variables(
        template,
        convert_state_dict(
            {k: v.numpy() for k, v in tm.state_dict().items()}
        ),
    )
    assert not report["missing"]
    head_outs, _ = fm.apply(variables, jnp.asarray(ours_in[None]), False)
    ours_dec = np.asarray(inference_outputs(head_outs))

    # identical preprocessing bytes
    np.testing.assert_array_equal(
        ours_in.transpose(2, 0, 1), ref_in[0]
    )
    # decoded predictions parity (xy/wh in pixels, sigmoided obj/cls).
    # XLA-CPU convs in this image run at reduced precision (~2e-3 rel),
    # so the bar is the environment's, not the framework's.
    np.testing.assert_allclose(
        ref_dec.numpy(), ours_dec, rtol=2e-2, atol=2e-2
    )
    # obj/cls probabilities agree tightly
    np.testing.assert_allclose(
        ref_dec.numpy()[..., 4:], ours_dec[..., 4:], atol=5e-3
    )
