"""Batch-aware early-backbone layout selection for inference programs.

The Exp infer/serving builders pick the packed layout when the per-device
batch is at most ``packed_infer_max_batch`` (measured v5e crossover:
packed wins 1.18-1.99x at B<=64, loses at B>=128 — BASELINE.md round 3).
These tests pin the selection logic and that a selected-packed program
produces the same detections as the fine one.
"""

import numpy as np

import jax
import jax.numpy as jnp

from eop_tpu.exp.yolox_24p_base import Exp24P
from eop_tpu.exp.yolox_base import Exp


def _exp24():
    e = Exp24P()
    e.depth, e.width = 0.33, 0.5
    e.num_classes = 3
    e.test_size = (64, 64)
    e.test_conf = 0.01
    return e


def test_infer_model_selection():
    e = _exp24()
    m = e.get_model()  # packed_early resolves to "train"
    assert m.packed_early == "train"

    # under the threshold -> packed program
    assert e._infer_model(m, 8).packed_early is True
    assert e._infer_model(m, 64).packed_early is True
    # over the threshold -> untouched (inference runs fine layout)
    assert e._infer_model(m, 128).packed_early == "train"
    # sharded: the decision is per-device (512 global / 8 devices = 64)
    assert e._infer_model(m, 512, batch_divisor=8).packed_early is True
    # int8 PTQ composes with the packed layout (round 4): scale keys are
    # layout-invariant (`ops/quant.packed_act_scale`), so the batch rule
    # decides the layout exactly as in the fp path
    assert e._infer_model(m, 8, quant_scales={"x": 1.0}).packed_early \
        is True
    assert e._infer_model(m, 128, quant_scales={"x": 1.0}).packed_early \
        == "train"
    # disabled via the exp knob
    e.packed_infer_max_batch = 0
    assert e._infer_model(m, 1).packed_early == "train"

    # ineligible model (width 1.0 resolves packed_early=False)
    eb = Exp()
    eb.num_classes = 3
    mb = eb.get_model()
    assert mb.packed_early is False
    assert eb._infer_model(mb, 8).packed_early is False


def test_packed_infer_fn_matches_fine():
    """The jitted infer handle at a small batch (packed selected) returns
    the same detections as a fine-forced one."""
    e = _exp24()
    m = e.get_model()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32)
    from eop_tpu.models import init_model

    variables = init_model(m, jax.random.PRNGKey(0), x[:1])

    infer = e.get_infer_fn(m, variables)
    det_packed = infer(x)

    e_fine = _exp24()
    e_fine.packed_infer_max_batch = 0
    infer_fine = e_fine.get_infer_fn(m, variables)
    det_fine = infer_fine(x)

    # packed vs fine is accumulation-order noise in fp32; the NMS keep
    # set and row contents must agree to tolerance
    np.testing.assert_allclose(
        np.asarray(det_packed.rows), np.asarray(det_fine.rows),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(det_packed.valid), np.asarray(det_fine.valid)
    )
