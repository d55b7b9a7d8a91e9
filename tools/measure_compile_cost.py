"""Measure the fresh-cache compile cost of the multiscale trainer.

The multiscale bbox trainer touches (2*multiscale_range + 1) shape
buckets; each bucket is a separate XLA program whose first compile over
the axon tunnel costs minutes (STATUS.md r2 gap 3).  This tool measures
that cold cost directly: a throwaway compilation-cache dir, one train
step compiled per bucket, wall time per bucket + total.

    python tools/measure_compile_cost.py --range 2 --size 256 --batch 8
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--range", type=int, dest="ms_range", default=2,
                    help="multiscale_range (buckets = 2*range + 1)")
    ap.add_argument("--size", type=int, default=256, help="base input size")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--warm", action="store_true",
                    help="second pass over the same cache (warm timing)")
    args = ap.parse_args()

    cache = tempfile.mkdtemp(prefix="eop_cold_cache_")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from eop_tpu.losses.yolox_loss import YoloxLossConfig
    from eop_tpu.models import YOLOX
    from eop_tpu.train.optimizer import build_sgd
    from eop_tpu.train.steps import create_train_state, make_train_step_bbox

    model = YOLOX(depth=0.33, width=0.50, num_classes=3,
                  dtype=jnp.bfloat16)
    tx = build_sgd(0.01, momentum=0.9, weight_decay=5e-4, nesterov=True)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        jnp.zeros((1, args.size, args.size, 3), jnp.float32), use_ema=True,
    )
    step = jax.jit(make_train_step_bbox(
        model, tx, YoloxLossConfig(num_classes=3), ema_decay=0.9998,
    ))

    base = args.size // 32
    buckets = [32 * s for s in range(base - args.ms_range,
                                     base + args.ms_range + 1)]
    labels = jnp.zeros((args.batch, 50, 5), jnp.float32)
    total = 0.0
    passes = 2 if args.warm else 1
    for p in range(passes):
        if p:
            # drop the in-memory jit dispatch caches so the warm pass
            # measures a fresh trace + persistent-cache deserialize (what
            # the prewarm mitigation delivers), not the C++ call cache
            jax.clear_caches()
        print(f"--- pass {p + 1} ({'warm' if p else 'cold'} cache) ---")
        for size in buckets:
            imgs = jnp.zeros((args.batch, size, size, 3), jnp.float32)
            t0 = time.time()
            _, metrics = step(state, imgs, labels, jax.random.PRNGKey(0))
            jax.device_get(metrics["total_loss"])
            dt = time.time() - t0
            if p == 0:
                total += dt
            print(f"bucket {size:4d}px: {dt:7.2f} s")
    print(f"TOTAL cold compile+first-step: {total:.1f} s "
          f"over {len(buckets)} buckets (cache: {cache})")


if __name__ == "__main__":
    main()
