"""Attribute the 24p postprocess cost stage by stage on device-resident
decoded outputs [B, 8400, 27+C] — isolates top-k, candidate gather,
polygon/IoU geometry, the suppression loop, and row compaction, plus a
narrow-gather variant (gather only the 27 geometry columns instead of all
27+C; the class scores are already reduced to cls_conf/cls_id before the
gather).

Usage: python tools/bench_postprocess_stages.py [B]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eop_tpu.utils.setup_env import enable_compile_cache  # noqa: E402

enable_compile_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from eop_tpu.eval.postprocess import _select_rows  # noqa: E402
from eop_tpu.ops.boxes import bboxes_iou  # noqa: E402
from eop_tpu.ops.nms import _suppress  # noqa: E402
from eop_tpu.ops.polygon import polygon_points_from_radii  # noqa: E402


def _measure_rtt(x) -> float:
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(x))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _drain(run, iters: int, rtt: float, passes: int = 3) -> float:
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = run()
        float(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / iters)
    return best


K = 512
NC = 80


def stage_scores(pred):
    obj = pred[:, 26]
    cls_conf = jnp.max(pred[:, 27:27 + NC], axis=1)
    cls_id = jnp.argmax(pred[:, 27:27 + NC], axis=1)
    return obj * cls_conf, cls_conf, cls_id


def upto_topk(pred):
    scores, _, _ = stage_scores(pred)
    top, order = jax.lax.top_k(scores, K)
    return jnp.sum(top) + jnp.sum(order)


def upto_gather(pred):
    scores, cls_conf, cls_id = stage_scores(pred)
    top, order = jax.lax.top_k(scores, K)
    cand = pred[order]
    return jnp.sum(cand) + jnp.sum(top)


def upto_gather_narrow(pred):
    scores, cls_conf, cls_id = stage_scores(pred)
    top, order = jax.lax.top_k(scores, K)
    cand = pred[:, :27][order]
    c_cls_conf = jnp.take(cls_conf, order)
    c_cls_id = jnp.take(cls_id, order)
    return jnp.sum(cand) + jnp.sum(c_cls_conf) + jnp.sum(c_cls_id) \
        + jnp.sum(top)


def upto_geom(pred):
    scores, cls_conf, cls_id = stage_scores(pred)
    top, order = jax.lax.top_k(scores, K)
    cand = pred[order]
    pts = polygon_points_from_radii(cand[:, 0:2], cand[:, 2:26], False)
    boxes = jnp.concatenate(
        [jnp.min(pts, axis=1), jnp.max(pts, axis=1)], axis=-1
    )
    iou = bboxes_iou(boxes, boxes, xyxy=True)
    return jnp.sum(iou) + jnp.sum(cand)


def make_full(fixpoint, narrow: bool):
    def full(pred):
        scores, cls_conf, cls_id = stage_scores(pred)
        top, order = jax.lax.top_k(scores, K)
        if narrow:
            cand = pred[:, :27][order]
        else:
            cand = pred[order]
        c_cls_conf = jnp.take(cls_conf, order)
        c_cls_id = jnp.take(cls_id, order)
        pts = polygon_points_from_radii(cand[:, 0:2], cand[:, 2:26], False)
        boxes = jnp.concatenate(
            [jnp.min(pts, axis=1), jnp.max(pts, axis=1)], axis=-1
        )
        iou = bboxes_iou(boxes, boxes, xyxy=True)
        same = c_cls_id[:, None] == c_cls_id[None, :]
        keep = _suppress(iou, top >= 0.01, 0.3, same_class=same,
                         fixpoint_iters=fixpoint)
        rows = jnp.concatenate(
            [cand[:, :26], cand[:, 26:27], c_cls_conf[:, None],
             c_cls_id.astype(pred.dtype)[:, None]], axis=1,
        )
        out, valid = _select_rows(rows, keep, 300)
        return jnp.sum(out) + jnp.sum(valid)

    return full


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = jax.random.PRNGKey(0)
    rtt = _measure_rtt(jnp.zeros((8, 8)))
    print(f"rtt={rtt * 1e3:.1f} ms  B={B}  K={K}")

    # realistic-ish decoded tensor: sigmoided scores, boxes across the canvas
    r1, r2, r3 = jax.random.split(rng, 3)
    xy = jax.random.uniform(r1, (B, 8400, 2)) * 640
    radii = jax.random.uniform(r2, (B, 8400, 24)) * 64 + 4
    scores = jax.random.uniform(r3, (B, 8400, 1 + NC))
    pred = jnp.concatenate([xy, radii, scores], axis=-1)
    pred = jax.device_put(pred)

    variants = {
        "scores_only": lambda p: jnp.sum(stage_scores(p)[0]),
        "  +topk": upto_topk,
        "  +gather(107col)": upto_gather,
        "  +gather(27col, narrow)": upto_gather_narrow,
        "  +geom+iou": upto_geom,
        "full budget64": make_full(None, False),
        "full budget16": make_full(16, False),
        "full exact": make_full("exact", False),
        "full narrow budget64": make_full(None, True),
        "full narrow exact": make_full("exact", True),
    }
    for name, fn in variants.items():
        jfn = jax.jit(jax.vmap(fn)) if name != "scores_only" else jax.jit(
            lambda p: jax.vmap(lambda q: jnp.sum(stage_scores(q)[0]))(p))
        g = jax.jit(lambda p, f=jfn: jnp.sum(f(p)))
        float(g(pred))
        t = _drain(lambda: g(pred), 20, rtt)
        print(f"{name:28s} {t * 1e3:7.2f} ms/batch")


if __name__ == "__main__":
    main()
