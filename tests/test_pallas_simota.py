"""Pallas SimOTA-geometry kernel vs the jnp oracle (interpret mode on CPU;
the same comparison runs compiled on real TPU in CI-on-device runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eop_tpu.ops.pallas import (
    simota_geometry_24p,
    simota_geometry_24p_reference,
)
from eop_tpu.ops.polygon import ANGLES


def make_case(seed=0, M=50, A=1024):
    rng = np.random.RandomState(seed)
    gt_c = rng.uniform(100, 500, (M, 2)).astype(np.float32)
    gt_r = rng.uniform(10, 80, (M, 24)).astype(np.float32)
    gpx = (gt_c[:, 0:1] + gt_r * np.cos(ANGLES)).astype(np.float32)
    gpy = (gt_c[:, 1:2] + gt_r * np.sin(ANGLES)).astype(np.float32)
    preds = np.concatenate(
        [rng.uniform(0, 640, (A, 2)), rng.uniform(5, 100, (A, 24))], 1
    ).astype(np.float32)
    xc = rng.uniform(0, 640, A).astype(np.float32)
    yc = rng.uniform(0, 640, A).astype(np.float32)
    st = rng.choice([8.0, 16.0, 32.0], A).astype(np.float32)
    return [jnp.asarray(v) for v in (gt_c, gt_r, gpx, gpy, preds, xc, yc, st)]


def test_kernel_matches_oracle_interpret():
    args = make_case()
    sim_p, poly_p, cent_p = jax.device_get(
        simota_geometry_24p(*args, interpret=True)
    )
    sim_r, poly_r, cent_r = jax.device_get(
        jax.jit(simota_geometry_24p_reference)(*args)
    )
    np.testing.assert_allclose(sim_p, np.asarray(sim_r), atol=5e-5)
    # the polynomial atan makes angle sums differ by <2e-5 rad; only points
    # razor-close to the 350° threshold may flip
    deg_mismatch = (poly_p != np.asarray(poly_r)).mean()
    assert deg_mismatch < 1e-3, deg_mismatch
    np.testing.assert_array_equal(cent_p, np.asarray(cent_r))


def test_loss24p_pallas_path_matches_xla():
    """The full assignment gives identical matches via either path."""
    from eop_tpu.losses import Loss24PConfig
    from eop_tpu.losses.loss_24p import simota_assign_24p

    rng = np.random.RandomState(1)
    M, A, C = 50, 256, 8
    labels_xy = np.zeros((M, 50), np.float32)
    n_gt = 6
    for g in range(n_gt):
        cx, cy = rng.uniform(50, 200, 2)
        r = rng.uniform(10, 40, 24)
        labels_xy[g, 0:2] = (cx, cy)
        labels_xy[g, 2::2] = cx + r * np.cos(ANGLES)
        labels_xy[g, 3::2] = cy + r * np.sin(ANGLES)
    gt_valid = jnp.asarray(np.arange(M) < n_gt)
    gt_classes = jnp.asarray(rng.randint(0, C, M).astype(np.float32))
    poly_preds = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 256, (A, 2)), rng.uniform(5, 60, (A, 24))], 1
        ).astype(np.float32)
    )
    obj = jnp.asarray(rng.randn(A).astype(np.float32))
    cls = jnp.asarray(rng.randn(A, C).astype(np.float32))
    gx = jnp.asarray(rng.randint(0, 32, A).astype(np.float32))
    gy = jnp.asarray(rng.randint(0, 32, A).astype(np.float32))
    grids = jnp.stack([gx, gy], 1)
    strides = jnp.asarray(np.full(A, 8.0, np.float32))

    import functools
    import unittest.mock as mock

    from eop_tpu.ops import pallas as pallas_pkg

    # interpret mode so the "pallas" path runs on CPU in tests
    interp = functools.partial(
        pallas_pkg.simota_geometry_24p, interpret=True
    )
    base = dict(num_classes=C)
    a_x = simota_assign_24p(
        jnp.asarray(labels_xy), gt_classes, gt_valid, poly_preds, obj, cls,
        grids, strides, Loss24PConfig(use_pallas=False, **base),
    )
    with mock.patch.object(
        pallas_pkg, "simota_geometry_24p", interp
    ):
        a_p = simota_assign_24p(
            jnp.asarray(labels_xy), gt_classes, gt_valid, poly_preds, obj,
            cls, grids, strides, Loss24PConfig(use_pallas=True, **base),
        )
    np.testing.assert_array_equal(
        np.asarray(a_x.fg_mask), np.asarray(a_p.fg_mask)
    )
    np.testing.assert_array_equal(
        np.asarray(a_x.matched_gt), np.asarray(a_p.matched_gt)
    )
    np.testing.assert_allclose(
        np.asarray(a_x.pred_iou), np.asarray(a_p.pred_iou), atol=5e-5
    )
