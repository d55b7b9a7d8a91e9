"""The fused head-level postprocess (`postprocess_*_heads`) must be
bitwise-equal to decode-everything-then-postprocess.

The fusion reorders decode and candidate gather — legal because the grid
decode is elementwise per anchor and sigmoid is monotonic (so the class
max/argmax and the score top-k see the same ordering).  These tests pin
the equality on both model dtypes and on every option that changes the
math (reference_parity, class_agnostic, conf/nms thresholds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eop_tpu.eval.postprocess import (
    postprocess_24p,
    postprocess_24p_heads,
    postprocess_bbox,
    postprocess_bbox_heads,
)
from eop_tpu.models import inference_outputs

HW = [(8, 8), (4, 4), (2, 2)]
NC = 7


def _rand_heads(rng, reg_dim, dtype, batch=3):
    """Raw per-scale head maps with realistic magnitudes: reg around 0
    (decode exp stays sane), obj/cls logits spread so scores spread."""
    outs = []
    for i, (h, w) in enumerate(HW):
        key = jax.random.fold_in(rng, i)
        o = jax.random.normal(key, (batch, h, w, reg_dim + 1 + NC)) * 1.5
        outs.append(o.astype(dtype))
    return outs


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("agnostic", [False, True])
def test_bbox_heads_bitwise(dtype, agnostic):
    heads = _rand_heads(jax.random.PRNGKey(0), 4, dtype)
    decoded = inference_outputs(heads, reg_dim=4, out_dtype=jnp.float32)
    kw = dict(num_classes=NC, conf_thre=0.4, nms_thre=0.5,
              class_agnostic=agnostic, max_detections=32,
              nms_candidates=64)
    ref = postprocess_bbox(decoded, **kw)
    fused = postprocess_bbox_heads(heads, **kw)
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(fused.valid))
    np.testing.assert_array_equal(np.asarray(ref.rows),
                                  np.asarray(fused.rows))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("parity", [False, True])
def test_24p_heads_bitwise(dtype, parity):
    heads = _rand_heads(jax.random.PRNGKey(1), 26, dtype)
    decoded = inference_outputs(heads, reg_dim=26, out_dtype=jnp.float32)
    kw = dict(num_classes=NC, conf_thre=0.3, nms_thre=0.3,
              max_detections=32, nms_candidates=64,
              reference_parity=parity)
    ref = postprocess_24p(decoded, **kw)
    fused = postprocess_24p_heads(heads, **kw)
    np.testing.assert_array_equal(np.asarray(ref.valid),
                                  np.asarray(fused.valid))
    np.testing.assert_array_equal(np.asarray(ref.rows),
                                  np.asarray(fused.rows))


def test_heads_jit_and_budget():
    """The fused path works under jit and with an int fixpoint budget."""
    heads = _rand_heads(jax.random.PRNGKey(2), 4, jnp.float32)

    @jax.jit
    def run(hs):
        return postprocess_bbox_heads(
            hs, num_classes=NC, conf_thre=0.4, nms_thre=0.5,
            max_detections=16, nms_candidates=32, nms_fixpoint_iters=32,
        )

    det = run(heads)
    assert det.rows.shape == (3, 16, 7)
    assert bool(jnp.all(det.count >= 0))


def test_nms_default_is_exact():
    """`_suppress(None)` now runs the adaptive exact loop: an adversarial
    suppression chain deeper than any fixed budget must come out greedy."""
    from eop_tpu.ops.nms import _suppress

    k = 257  # odd-length chain: boxes 0,2,4,... survive under greedy
    iou = np.zeros((k, k), np.float32)
    for i in range(k - 1):
        iou[i, i + 1] = 0.9
    keep = _suppress(jnp.asarray(iou), jnp.ones((k,), bool), 0.5)
    expected = np.arange(k) % 2 == 0
    np.testing.assert_array_equal(np.asarray(keep), expected)


def test_heads_argmax_matches_decoded_on_sigmoid_ties():
    """fp32 sigmoid collapses neighboring logits (sigmoid' <= 0.25), so an
    argmax over raw logits could pick a different class than the decoded
    path's argmax over sigmoided values; the heads path must tie-break
    identically (over the sigmoided values)."""
    a = np.float32(8.0)
    b = np.nextafter(a, np.float32(9.0), dtype=np.float32)  # a < b
    # premise: fp32 sigmoid collapses the pair
    sa = 1.0 / (1.0 + np.exp(-a, dtype=np.float32))
    sb = 1.0 / (1.0 + np.exp(-b, dtype=np.float32))
    assert np.float32(sa) == np.float32(sb) and a < b

    nc = 2
    row = np.zeros((1, 1, 1, 4 + 1 + nc), np.float32)
    row[..., 2:4] = 1.0     # nonzero box size
    row[..., 4] = 5.0       # obj logit
    row[..., 5] = a         # class 0: smaller logit...
    row[..., 6] = b         # ...class 1 larger, but equal after sigmoid
    head_outs = [jnp.asarray(row)]

    decoded = inference_outputs(head_outs, strides=(8,), reg_dim=4,
                                out_dtype=jnp.float32)
    ref = jax.device_get(postprocess_bbox(
        decoded, nc, conf_thre=0.5, max_detections=4, nms_candidates=1))
    got = jax.device_get(postprocess_bbox_heads(
        head_outs, nc, conf_thre=0.5, max_detections=4, nms_candidates=1,
        strides=(8,)))
    assert np.asarray(ref.valid).sum() == 1
    np.testing.assert_array_equal(np.asarray(ref.rows),
                                  np.asarray(got.rows))
    # the decoded path tie-breaks to the FIRST equal class
    assert int(np.asarray(ref.rows)[0, 0, -1]) == 0
