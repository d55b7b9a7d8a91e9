"""demo_utils parity vs the reference's numpy deploy helpers
(`/root/reference/yolox/utils/demo_utils.py:17-124`), fuzz-compared by
loading the reference file directly (it is pure numpy)."""

import importlib.util
import sys

import numpy as np
import pytest

from eop_tpu.utils import demo_utils


@pytest.fixture(scope="module")
def ref():
    spec = importlib.util.spec_from_file_location(
        "_ref_demo_utils", "/root/reference/yolox/utils/demo_utils.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_demo_utils"] = mod
    spec.loader.exec_module(mod)
    return mod


def _random_boxes(rng, n):
    xy = rng.rand(n, 2) * 200
    wh = rng.rand(n, 2) * 80 + 5
    return np.concatenate([xy, xy + wh], axis=1)


def test_nms_fuzz(ref):
    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(1, 60)
        boxes = _random_boxes(rng, n)
        scores = rng.rand(n)
        for thr in (0.3, 0.5, 0.7):
            assert demo_utils.nms(boxes, scores, thr) == ref.nms(
                boxes, scores, thr
            ), f"trial {trial} thr {thr}"


@pytest.mark.parametrize("agnostic", [True, False])
def test_multiclass_nms_fuzz(ref, agnostic):
    rng = np.random.RandomState(1)
    for trial in range(10):
        n = rng.randint(1, 50)
        boxes = _random_boxes(rng, n)
        scores = rng.rand(n, 5)
        ours = demo_utils.multiclass_nms(
            boxes, scores, 0.45, 0.3, class_agnostic=agnostic
        )
        theirs = ref.multiclass_nms(
            boxes, scores, 0.45, 0.3, class_agnostic=agnostic
        )
        if theirs is None:
            assert ours is None
        else:
            np.testing.assert_array_equal(ours, theirs,
                                          err_msg=f"trial {trial}")


def test_multiclass_nms_empty(ref):
    boxes = _random_boxes(np.random.RandomState(2), 4)
    scores = np.full((4, 3), 0.01)
    assert demo_utils.multiclass_nms(boxes, scores, 0.5, 0.9) is None
    assert ref.multiclass_nms(boxes, scores, 0.5, 0.9) is None


@pytest.mark.parametrize("p6", [False, True])
def test_demo_postprocess(ref, p6):
    rng = np.random.RandomState(3)
    img_size = (128, 128)
    strides = [8, 16, 32] if not p6 else [8, 16, 32, 64]
    n_anchors = sum((128 // s) ** 2 for s in strides)
    outputs = rng.randn(1, n_anchors, 9).astype(np.float32)
    ours = demo_utils.demo_postprocess(outputs.copy(), img_size, p6=p6)
    theirs = ref.demo_postprocess(outputs.copy(), img_size, p6=p6)
    np.testing.assert_array_equal(ours, theirs)
