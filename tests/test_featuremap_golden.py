"""Feature-map harness goldens vs the reference's own heatmap + per-GT
activation code (`/root/reference/yolox/demo_featuremap.py:330-392`),
executed live on CPU torch (VERDICT item 6):

1. formula parity — our `create_2d_feature_map` fed the SAME arrays as the
   reference function must produce bit-identical activation tables;
2. cross-framework stats — jax FPN outs (imported weights) vs torch FPN
   outs agree within the environment's conv precision;
3. pixel golden — the rendered heatmap figures (same data, same figsize)
   agree essentially pixel-for-pixel, pinning our rendering path against
   the reference's seaborn path.
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
pytest.importorskip("seaborn")

import jax
import jax.numpy as jnp
import torch

import ref_loader
from test_ap_parity_golden import FIXTURE_JSON, _build_ref_model, _letterbox


@pytest.fixture(scope="module")
def fpn_pair():
    """(torch fpn outs CHW, jax fpn outs NHWC, gt_box_fm) on the fixture."""
    from eop_tpu.models import YOLOX
    from eop_tpu.tools.featuremap import get_img_info, get_img_mask
    from eop_tpu.utils.torch_import import (
        convert_state_dict,
        merge_into_variables,
    )

    tm = _build_ref_model()
    coco, targets, ori_img, ori_h, ori_w = get_img_info(FIXTURE_JSON)
    canvas, gt_box_fm, _, _ = get_img_mask(
        0, ori_img, ori_h, ori_w, targets, coco
    )
    padded, _ = _letterbox(canvas)

    with torch.no_grad():
        ref_fpn = tm.backbone(
            torch.from_numpy(padded.transpose(2, 0, 1)[None].copy())
        )

    fm = YOLOX(depth=0.33, width=0.25, num_classes=80)
    x = jnp.asarray(padded[None])
    template = fm.init(jax.random.PRNGKey(0), x, False)
    variables, report = merge_into_variables(
        template,
        convert_state_dict(
            {k: v.numpy() for k, v in tm.state_dict().items()}
        ),
    )
    assert not report["missing"]
    _, our_fpn = fm.apply(variables, x, False)
    return ref_fpn, our_fpn, gt_box_fm


def _ref_table(demo, ref_fpn, gt_box_fm):
    """Run the reference's create_2D_feature_map; returns its table row."""
    demo.table_dic = {}
    demo.args = SimpleNamespace(vis=False)
    # the demo passes the first three (PAN) outputs (`image_demo:159`)
    demo.create_2D_feature_map(
        list(ref_fpn)[:3], None, np.asarray(gt_box_fm), "fixture.png",
    )
    return np.asarray(demo.table_dic["fixture"], np.float64)


def _torch_to_nhwc(t):
    return np.asarray(t.numpy().transpose(0, 2, 3, 1))


def test_activation_table_formula_exact(fpn_pair):
    """Identical input arrays -> bit-identical per-GT activation stats."""
    from eop_tpu.tools.featuremap import create_2d_feature_map

    demo = ref_loader.ref_demo_featuremap()
    ref_fpn, _, gt_box_fm = fpn_pair
    expected = _ref_table(demo, ref_fpn, gt_box_fm)

    table = {}
    ours = create_2d_feature_map(
        [_torch_to_nhwc(t) for t in ref_fpn[:3]],
        None, np.asarray(gt_box_fm), "fixture.png", table,
    )
    # the reference accumulates fpn.sum(0)/C in f32 then means in f64; ours
    # does mean(axis=-1) in f32 — same values modulo f32 reduction order
    np.testing.assert_allclose(np.asarray(ours, np.float64), expected,
                               rtol=1e-6)
    assert "fixture" in table


def test_activation_table_cross_framework(fpn_pair):
    """jax FPN activations (imported weights) match torch within the
    environment's conv precision."""
    from eop_tpu.tools.featuremap import create_2d_feature_map

    demo = ref_loader.ref_demo_featuremap()
    ref_fpn, our_fpn, gt_box_fm = fpn_pair
    expected = _ref_table(demo, ref_fpn, gt_box_fm)

    table = {}
    ours = create_2d_feature_map(
        [np.asarray(f) for f in our_fpn[:3]],
        None, np.asarray(gt_box_fm), "fixture.png", table,
    )
    np.testing.assert_allclose(
        np.asarray(ours, np.float64), expected, rtol=3e-2, atol=1e-3
    )


def test_heatmap_pixels_golden(fpn_pair, tmp_path, monkeypatch):
    """Same data through the reference's rendering vs ours -> same pixels
    (modulo antialiasing of overlay lines)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from eop_tpu.tools.featuremap import create_2d_feature_map

    demo = ref_loader.ref_demo_featuremap()
    ref_fpn, _, gt_box_fm = fpn_pair

    captured = []
    real_close = plt.close

    def capture_close(*a, **k):
        fig = plt.gcf()
        fig.canvas.draw()
        captured.append(np.asarray(fig.canvas.buffer_rgba()).copy())
        real_close(*a, **k)

    monkeypatch.setattr(plt, "close", capture_close)
    _ref_table(demo, ref_fpn, gt_box_fm)  # renders + closes -> captured[0]

    table = {}
    create_2d_feature_map(
        [_torch_to_nhwc(t) for t in ref_fpn[:3]],
        None, np.asarray(gt_box_fm), "fixture.png", table,
        figsize=(6.4, 4.8),  # matplotlib default, what the reference uses
    )
    monkeypatch.undo()

    assert len(captured) == 2
    ref_px, our_px = captured[0].astype(np.int16), captured[1].astype(
        np.int16
    )
    assert ref_px.shape == our_px.shape
    diff = np.abs(ref_px - our_px)
    frac_off = float((diff.max(axis=-1) > 8).mean())
    assert frac_off < 0.005, (
        f"{frac_off:.2%} of heatmap pixels differ by more than 8/255"
    )
