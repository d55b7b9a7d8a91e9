"""The packed-early backbone is bit-compatible with the fine path.

Same parameter tree (shapes AND paths), same outputs, same BN batch-stats
updates, same gradients — fp32 on CPU.  This is the guarantee that lets
``packed_early`` be a pure runtime switch: any checkpoint trains/evals
identically in either layout.
"""

import numpy as np

import jax
import jax.numpy as jnp

from eop_tpu.models import YOLOX


def _models():
    kw = dict(depth=0.33, width=0.5, num_classes=3, reg_dim=4,
              dtype=jnp.float32)
    return (YOLOX(packed_early=False, **kw), YOLOX(packed_early=True, **kw))


def _flat(tree):
    return jax.tree_util.tree_leaves_with_path(tree)


def test_param_tree_identical():
    fine, packed = _models()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vf = fine.init(jax.random.PRNGKey(0), x, False)
    vp = packed.init(jax.random.PRNGKey(0), x, False)
    sf = jax.tree_util.tree_structure(vf)
    sp = jax.tree_util.tree_structure(vp)
    assert sf == sp
    for (kf, lf), (kp, lp) in zip(_flat(vf), _flat(vp)):
        assert kf == kp and lf.shape == lp.shape, (kf, lf.shape, lp.shape)


def test_forward_and_bn_stats_match():
    fine, packed = _models()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32)
    variables = fine.init(jax.random.PRNGKey(1), x, False)

    # eval mode
    (ho_f, fpn_f) = fine.apply(variables, x, False)
    (ho_p, fpn_p) = packed.apply(variables, x, False)
    for a, b in zip(jax.tree_util.tree_leaves((ho_f, fpn_f)),
                    jax.tree_util.tree_leaves((ho_p, fpn_p))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    # train mode: outputs AND updated batch stats
    (out_f, mut_f) = fine.apply(variables, x, True,
                                mutable=["batch_stats"])
    (out_p, mut_p) = packed.apply(variables, x, True,
                                  mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(mut_f),
                    jax.tree_util.tree_leaves(mut_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_train_mode_gating():
    """packed_early="train": eval calls take the fine path, train calls the
    packed path, with one shared parameter tree (init runs in eval mode)."""
    kw = dict(depth=0.33, width=0.5, num_classes=3, reg_dim=4,
              dtype=jnp.float32)
    fine = YOLOX(packed_early=False, **kw)
    gated = YOLOX(packed_early="train", **kw)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32)
    variables = fine.init(jax.random.PRNGKey(5), x, False)

    # same param tree from the gated model's own init
    vg = gated.init(jax.random.PRNGKey(5), x, False)
    assert (jax.tree_util.tree_structure(vg)
            == jax.tree_util.tree_structure(variables))

    # eval: identical programs -> identical outputs
    out_f = fine.apply(variables, x, False)
    out_g = gated.apply(variables, x, False)
    for a, b in zip(jax.tree_util.tree_leaves(out_f),
                    jax.tree_util.tree_leaves(out_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # train: the gated model runs the SAME program as packed_early=True
    # (numerical fine-vs-packed equivalence is covered by the other tests)
    packed = YOLOX(packed_early=True, **kw)
    (out_pt, _) = packed.apply(variables, x, True, mutable=["batch_stats"])
    (out_gt, _) = gated.apply(variables, x, True, mutable=["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(out_pt),
                    jax.tree_util.tree_leaves(out_gt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exp_auto_resolution():
    from eop_tpu.exp.yolox_base import resolve_packed_early

    assert resolve_packed_early("auto", 0.5) == "train"
    assert resolve_packed_early("auto", 0.75) == "train"
    assert resolve_packed_early("auto", 1.0) is False
    assert resolve_packed_early("auto", 0.5, depthwise=True) is False
    assert resolve_packed_early(False, 0.5) is False
    assert resolve_packed_early(True, 1.0) is True
    assert resolve_packed_early("train", 1.0) == "train"
    # CLI `merge` can't coerce these (the default is the string "auto"),
    # so string booleans arrive verbatim and must normalize here —
    # "False" is truthy and would otherwise silently invert the intent
    assert resolve_packed_early("False", 0.5) is False
    assert resolve_packed_early("false", 0.5) is False
    assert resolve_packed_early("True", 1.0) is True
    assert resolve_packed_early("off", 0.5) is False


def test_packed_guards():
    """Unsupported packed combinations raise instead of computing garbage."""
    import pytest

    from eop_tpu.ops.blocks import Bottleneck, CSPLayer
    from eop_tpu.ops.packed import pack_nhwc, packed_conv

    x = jnp.zeros((1, 16, 16, 128), jnp.float32)
    for mod in (Bottleneck(32, depthwise=True, layout="packed"),
                CSPLayer(32, depthwise=True, layout="packed")):
        with pytest.raises(NotImplementedError):
            mod.init(jax.random.PRNGKey(0), x, False)

    # odd fine conv output: must raise, not silently drop the last row
    w = jnp.zeros((6, 6, 4, 8), jnp.float32)
    xp = pack_nhwc(jnp.zeros((1, 16, 16, 4), jnp.float32))
    with pytest.raises(AssertionError):
        packed_conv(xp, w, 1, 2, mode="pp")  # fine out 15x15


def test_gradients_match():
    fine, packed = _models()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32)
    variables = fine.init(jax.random.PRNGKey(3), x, False)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(model):
        def f(p):
            (ho, _), _ = model.apply({"params": p, **rest}, x, True,
                                     mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(t)) for t in
                       jax.tree_util.tree_leaves(ho))
        return f

    gf = jax.grad(loss(fine))(params)
    gp = jax.grad(loss(packed))(params)
    # Tolerance is fp32 accumulation-order noise, not approximation error:
    # the same comparison under jax_enable_x64 has worst relative diff
    # 1.3e-12 across all leaves (the packed re-expression is exact; fp32
    # contraction order differs between the fine and packed conv graphs).
    for (kf, a), (kp, b) in zip(_flat(gf), _flat(gp)):
        assert kf == kp
        d = np.max(np.abs(np.asarray(a) - np.asarray(b)))
        scale = max(1.0, float(np.max(np.abs(np.asarray(a)))))
        assert d / scale < 1.5e-3, (kf, d, scale)


def test_packed_depth3_param_tree_and_outputs_match_fine():
    """packed_depth=3 (dark3 also packed — the width-0.5 lane-boundary
    experiment, round 5) keeps the bit-compatibility contract: identical
    parameter tree, matching outputs and gradients vs the fine path."""
    kw = dict(depth=0.33, width=0.5, num_classes=3, reg_dim=4,
              dtype=jnp.float32)
    fine = YOLOX(packed_early=False, **kw)
    deep = YOLOX(packed_early=True, packed_depth=3, **kw)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 64, 64, 3) * 255, jnp.float32)
    vf = fine.init(jax.random.PRNGKey(0), x, False)
    vp = deep.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(vf) == \
        jax.tree_util.tree_structure(vp)
    for (kf, lf), (kp, lp) in zip(_flat(vf), _flat(vp)):
        assert kf == kp and lf.shape == lp.shape, (kf, lf.shape, lp.shape)

    (ho_f, fpn_f) = fine.apply(vf, x, False)
    (ho_p, fpn_p) = deep.apply(vf, x, False)
    for a, b in zip(jax.tree_util.tree_leaves((ho_f, fpn_f)),
                    jax.tree_util.tree_leaves((ho_p, fpn_p))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    def loss(m, v):
        ho, _ = m.apply(v, x, True, mutable=["batch_stats"])[0]
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in ho)

    gf = jax.grad(lambda v: loss(fine, v))(vf)["params"]
    gp = jax.grad(lambda v: loss(deep, v))(vf)["params"]
    # scale-relative bound, as in test_gradients_match: fp32 contraction
    # order differs between the layouts; the re-expression itself is exact
    for (kf, a), (kp, b) in zip(_flat(gf), _flat(gp)):
        d = np.max(np.abs(np.asarray(a) - np.asarray(b)))
        scale = max(1.0, float(np.max(np.abs(np.asarray(a)))))
        assert d / scale < 1.5e-3, (kf, d, scale)
