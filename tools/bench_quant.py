"""Benchmark int8 PTQ inference vs the bf16 path on the real chip.

Measures the two bench.py inference configs (24p-s B=128 e2e and
YOLOX-L B=64 e2e, both 640 px with decode + NMS) with eligible convs
running on the MXU's int8 path (`eop_tpu/ops/quant.py`).  The v5e int8
peak is 2x bf16 (394 vs 197 T-ops/s), so the MXU-bound flagship is
where the win should land; the small-channel 24p-s stages are
emitter-bound and should move less (BASELINE.md round 3).

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
    ap.add_argument("--families", default="24p-s,yolox-l")
    args = ap.parse_args()

    from eop_tpu.utils.setup_env import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    )

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from eop_tpu.eval import postprocess_24p, postprocess_bbox
    from eop_tpu.models import YOLOX, inference_outputs, init_model
    from eop_tpu.ops import quant
    from eop_tpu.utils.model_utils import fuse_conv_bn

    rng = jax.random.PRNGKey(0)
    rtt = _measure_rtt(jnp, jax, jnp.zeros((8, 8)))
    configs = {
        "24p-s": dict(depth=0.33, width=0.50, reg_dim=26, batch=128,
                      conf=0.01, nms=0.3, post=postprocess_24p),
        "yolox-l": dict(depth=1.0, width=1.0, reg_dim=4, batch=64,
                        conf=0.01, nms=0.65, post=postprocess_bbox),
    }
    out = {}
    for name in args.families.split(","):
        cfg = configs[name]
        B = cfg["batch"]
        model = YOLOX(depth=cfg["depth"], width=cfg["width"],
                      num_classes=80, reg_dim=cfg["reg_dim"],
                      dtype=jnp.bfloat16)
        x = jax.random.uniform(rng, (B, 640, 640, 3), jnp.float32) * 255.0
        variables = init_model(model, rng, x[:1])
        fused_p, fused_s = fuse_conv_bn(
            variables["params"], variables["batch_stats"]
        )
        variables = {"params": fused_p, "batch_stats": fused_s}

        @jax.jit
        def observe(v, imgs):
            with nn.intercept_methods(
                quant.observe_interceptor(args.min_channels)
            ):
                _, stats = model.apply(  # noqa: B023
                    v, imgs.astype(jnp.bfloat16), False,
                    mutable=[quant.QUANT_STATS],
                )
            return stats

        scales = quant.calibrate_act_scales(
            lambda b: jax.device_get(observe(variables, b)), [x[:8]]
        )

        def make_infer(q, model=model, cfg=cfg):
            @jax.jit
            def infer(v, imgs):
                imgs = imgs.astype(jnp.bfloat16)
                if q:
                    with quant.quantized(q, args.min_channels):
                        head_outs, _ = model.apply(v, imgs, False)
                else:
                    head_outs, _ = model.apply(v, imgs, False)
                decoded = inference_outputs(
                    head_outs, reg_dim=cfg["reg_dim"],
                    out_dtype=jnp.float32,
                )
                det = cfg["post"](decoded, num_classes=80,
                                  conf_thre=cfg["conf"],
                                  nms_thre=cfg["nms"])
                return jnp.sum(det.rows)

            return infer

        res = {}
        for label, q in (("bf16", None), ("int8", scales)):
            fn = make_infer(q)
            float(fn(variables, x))  # compile + warm
            t = _drain_time(lambda: fn(variables, x), float,
                            args.iters, rtt, passes=args.passes)
            res[label] = round(B / t, 1)
        res["speedup"] = round(res["int8"] / res["bf16"], 3)
        res["quantized_convs"] = len(scales)
        out[name] = res
        print(name, res, file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
