"""Gradient accumulation (`train/steps.py::_accum_scan`).

Capability beyond the reference (`yolox/core/trainer.py` has none):
effective batch decouples from activation memory — the jitted step scans
over micro-batches, carrying BN/DWA state forward, averaging gradients,
and applying the optimizer once.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_accum_scan_machinery_exact():
    """Unit-level: averaged grads, sequential batch-stats carry, summed
    cand_dropped — checked against hand-computed values on a fake
    grads_of."""
    from collections import namedtuple

    from eop_tpu.train.steps import TrainState, _accum_scan

    Aux = namedtuple("Aux", ["loss", "cand_dropped"])

    # grads_of: grad = mean(images) * params; batch_stats counts calls
    def grads_of(params, batch_stats, dwa, images, labels, rng):
        g = {"w": jnp.mean(images) * params["w"]}
        total = jnp.mean(images) + batch_stats["n"]
        aux = Aux(loss=jnp.mean(labels), cand_dropped=jnp.float32(3.0))
        return g, total, aux, dwa, {"n": batch_stats["n"] + 1.0}

    state = TrainState(
        step=jnp.int32(0),
        params={"w": jnp.ones((2,))},
        batch_stats={"n": jnp.float32(0.0)},
        opt_state=None,
    )
    images = jnp.arange(8.0).reshape(8, 1)  # micro means: 1.5, 5.5
    labels = jnp.arange(8.0).reshape(8, 1) * 10
    grads, total, aux, dwa, bs = _accum_scan(
        grads_of, state, images, labels, jax.random.PRNGKey(0), accum=2
    )
    np.testing.assert_allclose(grads["w"], (1.5 + 5.5) / 2 * np.ones(2))
    # totals: micro0 sees n=0 -> 1.5; micro1 sees n=1 -> 6.5; mean = 4.0
    np.testing.assert_allclose(total, 4.0)
    np.testing.assert_allclose(bs["n"], 2.0)  # advanced per micro
    np.testing.assert_allclose(aux.loss, np.mean([15.0, 55.0]))
    np.testing.assert_allclose(aux.cand_dropped, 6.0)  # summed, not meaned

    with pytest.raises(ValueError):
        _accum_scan(grads_of, state, images, labels,
                    jax.random.PRNGKey(0), accum=3)


def test_accum_step_bbox_tiny():
    """Integration: a real bbox train step with accum_steps=2 compiles,
    runs, and advances exactly one optimizer step."""
    from eop_tpu.losses import YoloxLossConfig
    from eop_tpu.models import YOLOX
    from eop_tpu.train import (
        build_sgd,
        create_train_state,
        make_train_step_bbox,
    )

    model = YOLOX(depth=0.33, width=0.25, num_classes=2)
    tx = build_sgd(0.01)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        use_ema=True,
    )
    step = jax.jit(make_train_step_bbox(
        model, tx, YoloxLossConfig(num_classes=2), accum_steps=2
    ))
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 64, 64, 3).astype(np.float32)
    labels = np.zeros((4, 50, 5), np.float32)
    labels[:, 0] = (1.0, 32.0, 32.0, 20.0, 24.0)
    state, metrics = step(state, imgs, labels, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_accum_composes_with_sharding():
    """accum=2 under the 8-device data-parallel mesh: the per-micro batch
    (8) still shards evenly; loss finite, state replicated."""
    from eop_tpu.losses import YoloxLossConfig
    from eop_tpu.models import YOLOX
    from eop_tpu.parallel import make_mesh, shard_batch, shard_train_step
    from eop_tpu.train import (
        build_sgd,
        create_train_state,
        make_train_step_bbox,
    )

    model = YOLOX(depth=0.33, width=0.25, num_classes=2)
    tx = build_sgd(0.01)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        use_ema=False,
    )
    mesh = make_mesh(8)
    step = shard_train_step(
        make_train_step_bbox(
            model, tx, YoloxLossConfig(num_classes=2), accum_steps=2
        ),
        mesh,
    )
    rng = np.random.RandomState(0)
    imgs = rng.rand(16, 64, 64, 3).astype(np.float32)
    labels = np.zeros((16, 50, 5), np.float32)
    labels[:, 0] = (1.0, 32.0, 32.0, 20.0, 24.0)
    with mesh:
        b = shard_batch(mesh, {"i": imgs, "l": labels})
        state, metrics = step(
            state, b["i"], b["l"], jax.random.PRNGKey(1)
        )
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1
