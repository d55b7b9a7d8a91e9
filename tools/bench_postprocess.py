"""Measure the post-process (top-k -> gather -> polygon decode -> NMS ->
compaction) share of the 24p-s e2e inference headline, and compare NMS
fixpoint strategies.

The round-1/2 record shows fwd+decode ~3,600 img/s vs e2e 2,650 at
B=128 — ~13 ms/batch in postprocess.  `_suppress`'s default budget is
``max(16, K/8)`` = 64 iterations at the K=512 candidate capacity; the
stationarity-checked ``"exact"`` while_loop stops at the realized chain
depth instead (reference NMS semantics: torchvision greedy,
`/root/reference/yolox_24p/utils/boxes.py:84-93`).

Usage: python tools/bench_postprocess.py [B]
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

from eop_tpu.eval import postprocess_24p, postprocess_24p_heads  # noqa: E402
from eop_tpu.models import YOLOX, inference_outputs, init_model  # noqa: E402


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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = jax.random.PRNGKey(0)
    rtt = _measure_rtt(jnp.zeros((8, 8)))
    print(f"rtt={rtt * 1e3:.1f} ms  B={B}")

    model = YOLOX(depth=0.33, width=0.50, num_classes=80, reg_dim=26,
                  dtype=jnp.bfloat16)
    x = jax.random.uniform(rng, (B, 640, 640, 3), jnp.float32) * 255.0
    v = init_model(model, rng, x[:1])

    @jax.jit
    def fwd_only(v, imgs):
        head_outs, _ = model.apply(v, imgs.astype(jnp.bfloat16), False)
        return sum(jnp.sum(h[1]) for h in head_outs)

    @jax.jit
    def fwd_decode(v, imgs):
        head_outs, _ = model.apply(v, imgs.astype(jnp.bfloat16), False)
        decoded = inference_outputs(head_outs, reg_dim=26,
                                    out_dtype=jnp.float32)
        return jnp.sum(decoded)

    def make_e2e(**pp_kw):
        @jax.jit
        def e2e(v, imgs):
            head_outs, _ = model.apply(v, imgs.astype(jnp.bfloat16), False)
            decoded = inference_outputs(head_outs, reg_dim=26,
                                        out_dtype=jnp.float32)
            det = postprocess_24p(decoded, num_classes=80, conf_thre=0.01,
                                  nms_thre=0.3, **pp_kw)
            return jnp.sum(det.rows)

        return e2e

    def make_e2e_fused(**pp_kw):
        @jax.jit
        def e2e(v, imgs):
            head_outs, _ = model.apply(v, imgs.astype(jnp.bfloat16), False)
            det = postprocess_24p_heads(head_outs, num_classes=80,
                                        conf_thre=0.01, nms_thre=0.3,
                                        **pp_kw)
            return jnp.sum(det.rows)

        return e2e

    variants = {
        "fwd_only": fwd_only,
        "fwd_decode": fwd_decode,
        "e2e_budget64": make_e2e(nms_fixpoint_iters=64),
        "e2e_budget16": make_e2e(nms_fixpoint_iters=16),
        "e2e_exact": make_e2e(nms_fixpoint_iters="exact"),
        "e2e_cand256": make_e2e(nms_candidates=256, max_detections=256),
        "e2e_fused (default)": make_e2e_fused(),
        "e2e_fused_budget64": make_e2e_fused(nms_fixpoint_iters=64),
    }
    for name, fn in variants.items():
        float(fn(v, x))  # compile + warm
        t = _drain(lambda fn=fn: fn(v, x), 15, rtt)
        print(f"{name:26s} {t * 1e3:7.2f} ms/batch  {B / t:8.1f} img/s")


if __name__ == "__main__":
    main()
