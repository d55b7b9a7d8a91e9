"""Benchmark: end-to-end 640px inference throughput on one TPU chip.

Measures the deployment path of the 24-point fisheye detector (the
reference's primary model, s-scale: depth 0.33 / width 0.50 —
`yolox_24p/load_train/yolox_24p_train.py:12-13`): jitted forward (bf16
compute) → grid decode → polygon→rect NMS, one device, batch 128.

Methodology note: the driver's TPU is reached through a tunnel where
``block_until_ready`` does not actually block — only a host fetch
synchronizes.  We therefore enqueue N batches, fetch one scalar reduced
from the last batch's detections (the device queue is FIFO, so this drains
all N), and subtract a separately-measured tunnel round-trip.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver north star is ≥2,000 img/s/chip at 640 px, so ``vs_baseline`` is
measured-value / 2000.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BATCH = 128
ITERS = 20
TARGET = 2000.0  # img/s/chip north star


def _measure_rtt(x) -> float:
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(x))
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        float(f(x))
    return (time.perf_counter() - t0) / n


def main():
    # persist compiles so repeat driver runs skip the ~60 s warm-up
    import os

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from eop_tpu.eval import postprocess_24p
    from eop_tpu.models import YOLOX, inference_outputs

    model = YOLOX(
        depth=0.33, width=0.50, num_classes=80, reg_dim=26,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (BATCH, 640, 640, 3), jnp.float32) * 255.0
    from eop_tpu.models import init_model

    variables = init_model(model, rng, x[:1])

    @jax.jit
    def infer(v, imgs):
        head_outs, _ = model.apply(v, imgs.astype(jnp.bfloat16), False)
        decoded = inference_outputs(head_outs, reg_dim=26)
        det = postprocess_24p(
            decoded.astype(jnp.float32), num_classes=80,
            conf_thre=0.01, nms_thre=0.3,
        )
        return jnp.sum(det.rows)  # scalar handle for the sync fetch

    rtt = _measure_rtt(jnp.zeros((8, 8)))
    float(infer(variables, x))  # compile + warm

    t0 = time.perf_counter()
    outs = [infer(variables, x) for _ in range(ITERS)]
    float(outs[-1])  # drains the FIFO queue
    per_batch = (time.perf_counter() - t0 - rtt) / ITERS

    img_per_sec = BATCH / per_batch
    print(
        json.dumps(
            {
                "metric": "inference_throughput_640px_24p_s",
                "value": round(img_per_sec, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec / TARGET, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
