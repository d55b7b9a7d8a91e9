"""Measure the int8 x packed-layout composition on the real chip
(round-4 VERDICT item 2).

Full 24p-s e2e matrix: {fine, packed} x {bf16, int8} x batch sweep, 640 px
with decode + NMS — the same program shape as bench.py's headline.  The
question being answered: the fine layout keeps the early stages bf16
(below the int8 channel gate); the packed layout widens them 4x so they
quantize — does the composition beat the round-3 headline (2,888 img/s
@B=128 fine-bf16) or the serving latency (2.98 ms @B=1)?

Timing: queue-drain + best-of-N (block_until_ready does not block over
the axon tunnel).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _drain_time, _measure_rtt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--min-channels", type=int, default=64)
    ap.add_argument("--batches", default="1,8,32,64,128")
    args = ap.parse_args()

    from eop_tpu.utils.setup_env import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    )

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from eop_tpu.eval import postprocess_24p
    from eop_tpu.models import YOLOX, inference_outputs, init_model
    from eop_tpu.ops import quant
    from eop_tpu.utils.model_utils import fuse_conv_bn

    rng = jax.random.PRNGKey(0)
    rtt = _measure_rtt(jnp, jax, jnp.zeros((8, 8)))

    model = YOLOX(depth=0.33, width=0.50, num_classes=80, reg_dim=26,
                  dtype=jnp.bfloat16)
    x_full = jax.random.uniform(rng, (128, 640, 640, 3), jnp.float32) * 255.0
    variables = init_model(model, rng, x_full[:1])
    fused_p, fused_s = fuse_conv_bn(
        variables["params"], variables["batch_stats"]
    )
    variables = {"params": fused_p, "batch_stats": fused_s}

    # calibrate once, fine layout, at the lowered observation gate so the
    # packed-eligible early convs get scales (base_exp's policy)
    observe_min = max(1, args.min_channels // 4)

    @jax.jit
    def observe(v, imgs):
        with nn.intercept_methods(quant.observe_interceptor(observe_min)):
            _, stats = model.apply(
                v, imgs.astype(jnp.bfloat16), False,
                mutable=[quant.QUANT_STATS],
            )
        return stats

    scales = quant.calibrate_act_scales(
        lambda b: jax.device_get(observe(variables, b)), [x_full[:8]]
    )
    print(f"calibrated {len(scales)} convs (observe gate {observe_min})",
          file=sys.stderr)

    def make_infer(m, q):
        @jax.jit
        def infer(v, imgs):
            imgs = imgs.astype(jnp.bfloat16)
            if q:
                with quant.quantized(q, args.min_channels):
                    head_outs, _ = m.apply(v, imgs, False)
            else:
                head_outs, _ = m.apply(v, imgs, False)
            decoded = inference_outputs(head_outs, reg_dim=26,
                                        out_dtype=jnp.float32)
            det = postprocess_24p(decoded, num_classes=80,
                                  conf_thre=0.01, nms_thre=0.3)
            return jnp.sum(det.rows)

        return infer

    out = {}
    for B in (int(b) for b in args.batches.split(",")):
        x = x_full[:B]
        row = {}
        for layout, m in (("fine", model),
                          ("packed", model.clone(packed_early=True))):
            for prec, q in (("bf16", None), ("int8", scales)):
                fn = make_infer(m, q)
                float(fn(variables, x))  # compile + warm
                t = _drain_time(lambda: fn(variables, x), float,
                                args.iters, rtt, passes=args.passes)
                row[f"{layout}_{prec}"] = {
                    "img_s": round(B / t, 1),
                    "ms": round(t * 1e3, 3),
                }
        best = max(row, key=lambda k: row[k]["img_s"])
        row["best"] = best
        out[f"B{B}"] = row
        print(f"B={B}: " + " ".join(
            f"{k}={v['img_s']}" for k, v in row.items() if k != "best"
        ) + f" best={best}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
