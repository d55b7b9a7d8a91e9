"""FSDP (ZeRO-style state sharding) and tensor parallelism (model axis).

The reference's only parallelism is DDP with a full model replica per GPU
(`yolox/core/launch.py:39-147`, `yolox/core/trainer.py:162-163`).  Here the
same jitted step additionally partitions parameters/optimizer/EMA state
over the data axis (``fsdp=True`` — XLA rewrites the gradient all-reduce
into reduce-scatter + sharded update + all-gather-on-use) and channel dims
over a ``model`` axis (``make_mesh(tensor=N)``), composable with the batch
and space axes.  These tests pin:

* the mesh/spec construction rules (axis dropping, leaf-spec table);
* FSDP step == replicated step to fp32 tolerance (same mesh, same global
  batch — only the state placement differs, so any divergence beyond
  reduction-order noise is a sharding bug);
* tensor-parallel inference == single-device inference to fp32 tolerance;
* the 3-D (data, space, model) + fsdp layout executes end-to-end (the
  layout ``__graft_entry__.dryrun_multichip`` ships to the driver).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

needs8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def test_make_mesh_axes():
    from eop_tpu.parallel import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    m = make_mesh(8)
    assert m.axis_names == ("data",)
    m = make_mesh(8, spatial=2)
    assert m.axis_names == ("data", "space") and m.shape["space"] == 2
    m = make_mesh(8, tensor=2)
    assert m.axis_names == ("data", "model") and m.shape["model"] == 2
    m = make_mesh(8, spatial=2, tensor=2)
    assert m.axis_names == ("data", "space", "model")
    assert m.shape == {"data": 2, "space": 2, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, spatial=3)
    with pytest.raises(ValueError):
        make_mesh(8, spatial=2, tensor=8)


@needs8
def test_param_specs_rules():
    from eop_tpu.parallel import make_mesh, param_specs

    mesh = make_mesh(8, spatial=2, tensor=2)  # data=2, space=2, model=2
    tree = {
        "kernel": jnp.zeros((3, 3, 64, 128)),   # conv HWIO
        "bn_scale": jnp.zeros((512,)),          # channel vector
        "tiny": jnp.zeros((24,)),               # below min_size
        "odd_out": jnp.zeros((3, 3, 64, 13)),   # C_out not divisible by tp
        "step": jnp.zeros(()),                  # scalar
    }
    sh = param_specs(tree, mesh, fsdp=True)
    # model axis on C_out, fsdp(data) on the largest remaining dim (C_in)
    assert sh["kernel"].spec == P(None, None, "data", "model")
    assert sh["bn_scale"].spec == P("model")
    assert sh["tiny"].spec == P()
    assert sh["odd_out"].spec == P(None, None, "data")
    assert sh["step"].spec == P()
    # without fsdp, only the model axis is used
    sh = param_specs(tree, mesh)
    assert sh["kernel"].spec == P(None, None, None, "model")
    assert sh["odd_out"].spec == P()


def _tiny_bbox_setup(num_classes=4):
    from eop_tpu.losses import YoloxLossConfig
    from eop_tpu.models import YOLOX
    from eop_tpu.train import (
        build_sgd,
        create_train_state,
        make_train_step_bbox,
    )

    model = YOLOX(depth=0.33, width=0.25, num_classes=num_classes)
    tx = build_sgd(0.01, weight_decay=5e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        use_ema=True,
    )
    step = make_train_step_bbox(
        model, tx, YoloxLossConfig(num_classes=num_classes)
    )
    # host copy: the sharded steps donate their state argument, and these
    # tests feed the same initial state into several programs
    state = jax.device_get(state)
    rng = np.random.RandomState(0)
    imgs = rng.rand(8, 64, 64, 3).astype(np.float32)
    labels = np.zeros((8, 50, 5), np.float32)
    labels[:, 0] = (1.0, 32.0, 32.0, 20.0, 24.0)
    return model, state, step, imgs, labels


@needs8
def test_fsdp_step_matches_replicated():
    from eop_tpu.parallel import (
        make_mesh,
        place_state,
        shard_batch,
        shard_train_step,
    )

    _, state0, step, imgs, labels = _tiny_bbox_setup()
    mesh = make_mesh(8)

    def run(fsdp):
        sstep = shard_train_step(
            step, mesh, state=state0 if fsdp else None, fsdp=fsdp
        )
        with mesh:
            st = place_state(state0, mesh, fsdp=True) if fsdp else state0
            b = shard_batch(mesh, {"i": imgs, "l": labels})
            st, metrics = sstep(st, b["i"], b["l"], jax.random.PRNGKey(1))
        return jax.device_get(st), jax.device_get(metrics)

    st_r, m_r = run(fsdp=False)
    st_f, m_f = run(fsdp=True)
    assert np.isclose(m_r["total_loss"], m_f["total_loss"], rtol=1e-5)
    # fp32: reduce-scatter vs all-reduce sums in different orders, so
    # element-wise comparison carries ~1e-5 absolute noise (cf. the
    # analysis in tests/test_spatial.py) — compare per-leaf relative to
    # the leaf's scale, as there
    for tree_r, tree_f in (
        (st_r.params, st_f.params),
        (st_r.opt_state, st_f.opt_state),
    ):
        for a, b in zip(jax.tree.leaves(tree_r), jax.tree.leaves(tree_f)):
            rel = float(np.max(np.abs(b - a))) / (
                float(np.max(np.abs(a))) + 1e-30
            )
            assert rel < 1e-3, f"leaf rel err {rel:.3e}"


@needs8
def test_fsdp_without_state_raises():
    """fsdp/tensor without a state template must fail loudly at build
    time, not silently fall back to full replication (r3 review)."""
    from eop_tpu.parallel import make_mesh, shard_train_step

    _, _, step, _, _ = _tiny_bbox_setup()
    with pytest.raises(ValueError, match="state"):
        shard_train_step(step, make_mesh(8), fsdp=True)
    with pytest.raises(ValueError, match="state"):
        shard_train_step(step, make_mesh(8, tensor=2))


def test_fsdp_indivisible_warns():
    """A data-axis size that divides no parameter dim must warn that
    nothing sharded (r3 review: silent full replication on e.g. dp=6).

    Captured with a handler on the package logger directly — setup_logger
    sets propagate=False, so caplog's root-logger handler can miss it
    depending on suite order."""
    import logging

    from eop_tpu.parallel import make_mesh, place_state
    from eop_tpu.utils.logger import logger as eop_logger

    if jax.device_count() < 6:
        pytest.skip("needs 6 devices")
    # 6 divides neither power-of-2 channel dims nor 3x3 kernel spatial
    # dims (the real model also has 48/96-channel CSP leaves that DO
    # divide 6, so a synthetic all-power-of-2 tree isolates the case)
    mesh = make_mesh(6)
    tree = {
        "k1": jnp.zeros((3, 3, 64, 128)),
        "k2": jnp.zeros((1, 1, 256, 512)),
        "bn": jnp.zeros((512,)),
    }
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    eop_logger.addHandler(handler)
    try:
        placed = place_state(tree, mesh, fsdp=True)
    finally:
        eop_logger.removeHandler(handler)
    assert any("NO leaf partitioned" in r.getMessage() for r in records)
    # and the state really is replicated (the condition being warned about)
    assert all(
        x.sharding.spec == P() for x in jax.tree.leaves(placed)
    )


@needs8
def test_fsdp_state_actually_sharded():
    """FSDP must shard the big leaves, not just relabel them: per-device
    bytes of the placed params should be ~1/8 of the replicated total."""
    from eop_tpu.parallel import make_mesh, param_specs, place_state

    _, state0, _, _, _ = _tiny_bbox_setup()
    mesh = make_mesh(8)
    placed = place_state(state0, mesh, fsdp=True)
    sh = param_specs(state0, mesh, fsdp=True)
    n_sharded = sum(
        1 for s in jax.tree.leaves(sh)
        if any(ax is not None for ax in s.spec)
    )
    assert n_sharded > 50  # params + momentum + EMA all partition
    # the largest leaf (a conv kernel) holds 1/8 of its elements per device
    kernel = max(jax.tree.leaves(placed.params), key=lambda x: x.size)
    assert kernel.sharding.spec != P()
    shard = kernel.addressable_shards[0].data
    assert shard.size * 8 == kernel.size


@needs8
def test_tp_inference_matches_single_device():
    from eop_tpu.models import YOLOX, inference_outputs, init_model
    from eop_tpu.parallel import make_mesh, shard_inference_tp

    model = YOLOX(depth=0.33, width=0.25, num_classes=4)
    variables = init_model(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    rng = np.random.RandomState(1)
    imgs = rng.rand(8, 64, 64, 3).astype(np.float32)

    def body(v, x):
        head_outs, _ = model.apply(v, x, False)
        return inference_outputs(head_outs)

    ref = jax.device_get(jax.jit(body)(variables, imgs))

    mesh = make_mesh(8, tensor=2)
    tp_fn = shard_inference_tp(body, variables, mesh)
    with mesh:
        got = jax.device_get(tp_fn(imgs))
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@needs8
def test_3d_mesh_fsdp_tp_step_runs():
    """The full (data, space, model) + fsdp layout — what dryrun_multichip
    ships — compiles and takes two donation-stable steps."""
    from eop_tpu.parallel import (
        make_mesh,
        place_state,
        shard_batch,
        shard_train_step,
    )

    _, state0, step, imgs, labels = _tiny_bbox_setup()
    mesh = make_mesh(8, spatial=2, tensor=2)
    sstep = shard_train_step(step, mesh, state=state0, fsdp=True)
    with mesh:
        st = place_state(state0, mesh, fsdp=True)
        b = shard_batch(mesh, {"i": imgs, "l": labels})
        st, metrics = sstep(st, b["i"], b["l"], jax.random.PRNGKey(1))
        st, metrics = sstep(st, b["i"], b["l"], jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(st.step) == 2
