"""NMS vs a naive greedy implementation (torchvision semantics), and
polygon membership tests."""

import numpy as np

import jax.numpy as jnp

from eop_tpu.ops.nms import batched_class_nms, nms
from eop_tpu.ops.polygon import (
    ANGLES,
    polygon_points_from_radii,
    pts_in_poly,
    radii_from_points,
)


def naive_nms(boxes, scores, thr):
    """Greedy NMS, torchvision semantics (suppress iou > thr)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (area_i + areas - inter)
        suppressed |= iou > thr
    return sorted(keep)


def random_boxes(n, rng):
    xy = rng.uniform(0, 500, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_naive():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 80
        boxes = random_boxes(n, rng)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        keep, order = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
        kept = sorted(np.asarray(order)[np.asarray(keep)].tolist())
        assert kept == naive_nms(boxes, scores, 0.5), trial


def test_batched_class_nms_keeps_classes_separate():
    rng = np.random.RandomState(1)
    # identical boxes, different classes -> both survive class-aware NMS
    boxes = np.tile(random_boxes(1, rng), (2, 1))
    scores = np.asarray([0.9, 0.8], np.float32)
    cls = np.asarray([0, 1], np.int32)
    keep, order = batched_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls), 0.5
    )
    assert int(np.asarray(keep).sum()) == 2
    # same class -> one survives
    keep, order = batched_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.asarray([1, 1], np.int32), 0.5,
    )
    assert int(np.asarray(keep).sum()) == 1


def _np_pts_in_poly(poly_x, poly_y, px, py):
    """Direct numpy transcription of the reference angle-sum test
    (`yolox_24p/models/losses.py:555-592`)."""
    g = poly_x.shape[0]
    out = np.zeros((g, px.shape[0]), bool)
    for i in range(g):
        vsx = poly_x[i][:, None] - px[None, :]
        vsy = poly_y[i][:, None] - py[None, :]
        vex = np.roll(poly_x[i], -1)[:, None] - px[None, :]
        vey = np.roll(poly_y[i], -1)[:, None] - py[None, :]
        cross = vsx * vey - vex * vsy
        dot = vsx * vex + vsy * vey
        deg = np.degrees(np.arctan2(np.abs(cross), dot)).sum(0)
        out[i] = deg >= 350
    return out


def test_pts_in_poly_matches_reference_math():
    rng = np.random.RandomState(2)
    g, a = 6, 200
    cx = rng.uniform(100, 400, g)
    cy = rng.uniform(100, 400, g)
    r = rng.uniform(20, 80, (g, 24))
    poly_x = (cx[:, None] + r * np.cos(ANGLES)).astype(np.float32)
    poly_y = (cy[:, None] + r * np.sin(ANGLES)).astype(np.float32)
    px = rng.uniform(0, 500, a).astype(np.float32)
    py = rng.uniform(0, 500, a).astype(np.float32)

    expected = _np_pts_in_poly(poly_x, poly_y, px, py)
    got = np.asarray(
        pts_in_poly(jnp.asarray(poly_x), jnp.asarray(poly_y),
                    jnp.asarray(px), jnp.asarray(py))
    )
    np.testing.assert_array_equal(got, expected)


def test_pts_in_poly_geometry():
    """Center of a star polygon is inside; far-away points are not."""
    r = np.full((1, 24), 50.0, np.float32)
    cx = cy = np.asarray([200.0], np.float32)
    poly_x = (cx[:, None] + r * np.cos(ANGLES)).astype(np.float32)
    poly_y = (cy[:, None] + r * np.sin(ANGLES)).astype(np.float32)
    px = np.asarray([200.0, 200.0, 500.0], np.float32)
    py = np.asarray([200.0, 240.0, 500.0], np.float32)
    got = np.asarray(
        pts_in_poly(jnp.asarray(poly_x), jnp.asarray(poly_y),
                    jnp.asarray(px), jnp.asarray(py))
    )[0]
    assert got.tolist() == [True, True, False]


def test_radii_roundtrip():
    rng = np.random.RandomState(3)
    rows = np.zeros((4, 50), np.float32)
    r = rng.uniform(5, 80, (4, 24)).astype(np.float32)
    rows[:, 0] = rng.uniform(100, 300, 4)
    rows[:, 1] = rng.uniform(100, 300, 4)
    rows[:, 2::2] = rows[:, 0:1] + r * np.cos(ANGLES)
    rows[:, 3::2] = rows[:, 1:2] + r * np.sin(ANGLES)
    got = np.asarray(radii_from_points(jnp.asarray(rows)))
    np.testing.assert_allclose(got, r, rtol=1e-5, atol=1e-3)
    pts = np.asarray(
        polygon_points_from_radii(jnp.asarray(rows[:, 0:2]), jnp.asarray(r))
    )
    np.testing.assert_allclose(pts[..., 0], rows[:, 2::2], rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(pts[..., 1], rows[:, 3::2], rtol=1e-5, atol=1e-3)


def test_batched_class_nms_degenerate_coordinates():
    """A huge outlier box must not disable suppression (the torchvision
    coordinate-offset trick loses all f32 precision here)."""
    boxes = np.array(
        [
            [136.0, 123.0, 224.0, 212.0],
            [137.0, 122.0, 225.0, 211.0],
            [0.0, 0.0, 3e8, 3e8],  # exp-decode blowup from a dead anchor
        ],
        np.float32,
    )
    scores = np.asarray([0.9, 0.89, 0.01], np.float32)
    cls = np.asarray([7, 7, 7], np.int32)
    keep, order = batched_class_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        0.3, 0.1,
    )
    kept = np.asarray(order)[np.asarray(keep)]
    assert kept.tolist() == [0], kept
