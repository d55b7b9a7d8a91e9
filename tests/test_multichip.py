"""Multi-chip data-parallel path on the 8-virtual-device CPU mesh
(conftest sets xla_force_host_platform_device_count=8): one sharded train
step must compile, execute, and produce replicated finite outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_train_step_8dev():
    from eop_tpu.losses import YoloxLossConfig
    from eop_tpu.models import YOLOX
    from eop_tpu.parallel import make_mesh, shard_batch, shard_train_step
    from eop_tpu.train import (
        build_sgd,
        create_train_state,
        make_train_step_bbox,
    )

    mesh = make_mesh(8)
    model = YOLOX(depth=0.33, width=0.25, num_classes=4)
    tx = build_sgd(0.01, weight_decay=5e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        use_ema=True,
    )
    step = shard_train_step(
        make_train_step_bbox(model, tx, YoloxLossConfig(num_classes=4)),
        mesh,
    )

    rng = np.random.RandomState(0)
    imgs = rng.rand(8, 64, 64, 3).astype(np.float32)
    labels = np.zeros((8, 50, 5), np.float32)
    labels[:, 0] = (1.0, 32.0, 32.0, 20.0, 24.0)

    with mesh:
        batch = shard_batch(mesh, {"i": imgs, "l": labels})
        state, metrics = step(
            state, batch["i"], batch["l"], jax.random.PRNGKey(1)
        )
        state, metrics = step(
            state, batch["i"], batch["l"], jax.random.PRNGKey(2)
        )
    total = float(metrics["total_loss"])
    assert np.isfinite(total)
    assert int(state.step) == 2
    # params replicated across the mesh
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8
