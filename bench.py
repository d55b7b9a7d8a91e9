"""Benchmark: 640 px throughput on one TPU chip — inference (24p-s and
YOLOX-L) and the full 24p train step.

Headline metric: the deployment path of the 24-point fisheye detector (the
reference's primary model, s-scale: depth 0.33 / width 0.50 —
`yolox_24p/load_train/yolox_24p_train.py:12-13`): jitted forward (bf16
compute) → grid decode → polygon→rect NMS, one device; the headline value
is the best MEASURED deployable config this session (`extra.headline_config`
names it, `extra.headline_fixed_config` carries the fine-bf16 B=128 number
every round reported, for apples-to-apples cross-round tracking).

Extras (same JSON line, `extra` object):
* ``inference_yoloxl_640px`` — the feature-map study's flagship (depth /
  width 1.0, `yolox/exp/yolox_base.py:19-28`), forward + decode + bbox NMS,
  with model-FLOPs MFU vs the v5e bf16 peak.
* ``train_step_24p_640px_b32`` — fwd + SimOTA + circle-GIoU/DWA loss +
  backward + SGD + EMA, one jitted program (B=32, 8 GTs/img).

Statistical method (round 5, VERDICT item 3): this testbed's cross-session
throughput drifts ±10-50% (tunnel/chip — BASELINE.md "Measurement-integrity
note"), so (a) every config is measured in ≥5 INTERLEAVED rounds
(A,B,C,A,B,C,... — drift hits all configs alike) and reported as
``{median, iqr, n}``; (b) config comparisons are emitted as SAME-SESSION
per-round ratios (``extra.ratios``), the only comparator that survives the
drift.  Cross-round prose must quote the ratios, not raw values.

Timing method: the driver's TPU is reached through a tunnel where
``block_until_ready`` does not actually block — only a host fetch
synchronizes.  Each pass enqueues N batches and fetches one scalar reduced
from the last batch (FIFO queue => drains all N), minus a separately
measured tunnel round-trip.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
driver north star is ≥2,000 img/s/chip at 640 px, so ``vs_baseline`` is
measured-value / 2000.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

V5E_BF16_PEAK = 197e12  # FLOP/s
ROUNDS = 5


def _measure_rtt(jnp, jax, x) -> float:
    """Min over probes — the tunnel's occasional multi-second stalls
    would otherwise inflate the constant subtracted from every
    measurement."""
    f = jax.jit(lambda a: jnp.sum(a))
    float(f(x))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def _timed_pass(run, fetch, iters: int, rtt: float) -> float:
    """One queue-drain pass -> per-call seconds."""
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = run()
    fetch(out)
    return (time.perf_counter() - t0 - rtt) / iters


def _median_iqr(xs):
    import numpy as np

    a = np.sort(np.asarray(xs, float))
    med = float(np.median(a))
    q25, q75 = float(np.percentile(a, 25)), float(np.percentile(a, 75))
    return med, q75 - q25


def main():
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eop_tpu.utils.setup_env import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache")
    )

    import optax
    from flax import linen as nn

    from eop_tpu.eval import postprocess_24p_heads, postprocess_bbox_heads
    from eop_tpu.losses import Loss24PConfig
    from eop_tpu.models import YOLOX, init_model
    from eop_tpu.ops import quant
    from eop_tpu.train.steps import create_train_state, make_train_step_24p
    from eop_tpu.utils.model_utils import fuse_conv_bn

    rng = jax.random.PRNGKey(0)
    rtt = _measure_rtt(jnp, jax, jnp.zeros((8, 8)))
    extra = {}

    # ---------------- build + compile every config up front ----------------

    # 24p-s: fine layout @B=128 (the r1-r3 headline config)
    B = 128
    model_s = YOLOX(depth=0.33, width=0.50, num_classes=80, reg_dim=26,
                    dtype=jnp.bfloat16, packed_early="train")
    x = jax.random.uniform(rng, (B, 640, 640, 3), jnp.float32) * 255.0
    vars_s = init_model(model_s, rng, x[:1])

    def make_infer_24p(model):
        @jax.jit
        def infer(v, imgs):
            head_outs, _ = model.apply(v, imgs.astype(jnp.bfloat16), False)
            # fused postprocess: top-k on the raw bf16 maps, grid decode
            # only on the candidates (bitwise-equal; ~6 ms less @B=128)
            det = postprocess_24p_heads(
                head_outs, num_classes=80, conf_thre=0.01, nms_thre=0.3,
            )
            return jnp.sum(det.rows)  # scalar handle for the sync fetch

        return infer

    infer_s = make_infer_24p(model_s)
    float(infer_s(vars_s, x))  # compile + warm

    # 24p-s: packed layout @B=32 (the Exp infer builders pick packed for
    # per-device batches <= 64, where it measured 1.18-1.99x over fine)
    BS = 32
    model_s_packed = YOLOX(depth=0.33, width=0.50, num_classes=80,
                           reg_dim=26, dtype=jnp.bfloat16,
                           packed_early=True)
    infer_s32 = make_infer_24p(model_s_packed)
    float(infer_s32(vars_s, x[:BS]))

    # 24p-s: int8 x packed (round 4) — the packed layout widens the early
    # stages 4x over the int8 channel gate, so the whole net runs on the
    # MXU's int8 path; accuracy: AP50 -0.2 on the trained ckpt (BASELINE.md)
    fused_sp, fused_ss = fuse_conv_bn(
        vars_s["params"], vars_s["batch_stats"]
    )
    vars_sq = {"params": fused_sp, "batch_stats": fused_ss}

    # gate 64: gates 32 and 64 are a wash in same-session side-by-side
    # probes (BASELINE.md "Measurement-integrity note"); 64 is also the
    # setting the accuracy numbers were first measured at
    S_GATE = 64

    @jax.jit
    def observe_s(v, imgs):
        # observation gate = quant gate / 4 so the packed-widened early
        # convs get calibrated scales (base_exp policy)
        with nn.intercept_methods(
            quant.observe_interceptor(max(1, S_GATE // 4))
        ):
            _, stats = model_s.apply(
                v, imgs.astype(jnp.bfloat16), False,
                mutable=[quant.QUANT_STATS],
            )
        return stats

    scales_s = quant.calibrate_act_scales(
        lambda b: jax.device_get(observe_s(vars_sq, b)), [x[:8]]
    )

    def make_infer_24p_int8(model):
        @jax.jit
        def infer(v, imgs):
            with quant.quantized(scales_s, S_GATE):
                head_outs, _ = model.apply(
                    v, imgs.astype(jnp.bfloat16), False
                )
            det = postprocess_24p_heads(
                head_outs, num_classes=80, conf_thre=0.01, nms_thre=0.3,
            )
            return jnp.sum(det.rows)

        return infer

    infer_s32q = make_infer_24p_int8(model_s_packed)
    float(infer_s32q(vars_sq, x[:BS]))

    # YOLOX-L e2e inference (flagship), B=64, bf16 + int8
    BL = 64
    model_l = YOLOX(depth=1.0, width=1.0, num_classes=80, reg_dim=4,
                    dtype=jnp.bfloat16)
    xl = jax.random.uniform(rng, (BL, 640, 640, 3), jnp.float32) * 255.0
    vars_l = init_model(model_l, rng, xl[:1])

    @jax.jit
    def infer_l(v, imgs):
        head_outs, _ = model_l.apply(v, imgs.astype(jnp.bfloat16), False)
        det = postprocess_bbox_heads(
            head_outs, num_classes=80, conf_thre=0.01, nms_thre=0.65,
        )
        return jnp.sum(det.rows)

    float(infer_l(vars_l, xl))

    fused_p, fused_s = fuse_conv_bn(
        vars_l["params"], vars_l["batch_stats"]
    )
    vars_lq = {"params": fused_p, "batch_stats": fused_s}

    @jax.jit
    def observe_l(v, imgs):
        with nn.intercept_methods(quant.observe_interceptor(64)):
            _, stats = model_l.apply(
                v, imgs.astype(jnp.bfloat16), False,
                mutable=[quant.QUANT_STATS],
            )
        return stats

    scales_l = quant.calibrate_act_scales(
        lambda b: jax.device_get(observe_l(vars_lq, b)), [xl[:8]]
    )

    @jax.jit
    def infer_l_int8(v, imgs):
        with quant.quantized(scales_l, 64):
            head_outs, _ = model_l.apply(
                v, imgs.astype(jnp.bfloat16), False
            )
        det = postprocess_bbox_heads(
            head_outs, num_classes=80, conf_thre=0.01, nms_thre=0.65,
        )
        return jnp.sum(det.rows)

    float(infer_l_int8(vars_lq, xl))

    # 24p train step, B=32
    from eop_tpu.utils.synth import synthetic_24p_batch

    BT = 32
    xt, labels = synthetic_24p_batch(rng, BT, 640, ngt=8)
    tx = optax.sgd(0.01, momentum=0.9, nesterov=True)
    state = create_train_state(
        model_s, tx, rng, xt[:1], use_ema=True, with_dwa=True
    )
    step = jax.jit(
        make_train_step_24p(model_s, tx, Loss24PConfig(), ema_decay=0.9998),
        donate_argnums=(0,),
    )
    key = jax.random.PRNGKey(1)
    state_box = [state]

    def run_step():
        s, m = step(state_box[0], xt, labels, key)
        state_box[0] = s
        return m["total_loss"]

    float(run_step())  # compile + warm

    # ---------------- interleaved measurement rounds ----------------
    # (name, run, iters) — every round measures every config once, in the
    # same order, so tunnel/chip drift hits them all alike
    configs = [
        ("fine_bf16_b128", lambda: infer_s(vars_s, x), 20),
        ("packed_bf16_b32", lambda: infer_s32(vars_s, x[:BS]), 20),
        ("packed_int8_b32", lambda: infer_s32q(vars_sq, x[:BS]), 20),
        ("yoloxl_bf16_b64", lambda: infer_l(vars_l, xl), 10),
        ("yoloxl_int8_b64", lambda: infer_l_int8(vars_lq, xl), 10),
        ("train_24p_b32", run_step, 15),
    ]
    times = {name: [] for name, _, _ in configs}
    for _ in range(ROUNDS):
        for name, run, iters in configs:
            times[name].append(_timed_pass(run, float, iters, rtt))

    med = {}
    spread = {}
    for name in times:
        med[name], spread[name] = _median_iqr(times[name])

    def _row(name, batch):
        return {
            "value": round(batch / med[name], 1), "unit": "img/s/chip",
            "latency_ms": round(med[name] * 1e3, 2),
            "latency_ms_iqr": round(spread[name] * 1e3, 2),
            "n": ROUNDS,
        }

    extra["inference_24p_s_640px_b128_fine"] = _row("fine_bf16_b128", B)
    extra["inference_24p_s_640px_b32_packed"] = _row("packed_bf16_b32", BS)
    r = _row("packed_int8_b32", BS)
    r["quantized_convs_calibrated"] = len(scales_s)
    extra["inference_24p_s_640px_b32_packed_int8"] = r

    img_l = BL / med["yoloxl_bf16_b64"]
    # model-FLOPs MFU (XLA cost analysis counts fused fwd FLOPs)
    lowered = jax.jit(
        lambda v, i: model_l.apply(v, i.astype(jnp.bfloat16), False)
    ).lower(vars_l, xl[:1])
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops_l = float(cost.get("flops", 0.0))
    except Exception:
        flops_l = 0.0
    extra["inference_yoloxl_640px"] = {
        **_row("yoloxl_bf16_b64", BL),
        "model_gflops_fwd": round(flops_l / 1e9, 1),
        "mfu": round(img_l * flops_l / V5E_BF16_PEAK, 3),
    }
    extra["inference_yoloxl_640px_int8"] = _row("yoloxl_int8_b64", BL)

    extra["train_step_24p_640px_b32"] = {
        "value": round(med["train_24p_b32"] * 1e3, 2), "unit": "ms/step",
        "iqr_ms": round(spread["train_24p_b32"] * 1e3, 2),
        "n": ROUNDS,
        "img_per_sec": round(BT / med["train_24p_b32"], 1),
    }

    # same-session per-round ratios: the only drift-proof comparator on
    # this testbed (each round's configs share the same tunnel conditions)
    def _ratio(a, b):  # speedup of a over b: time_b / time_a, per round
        per_round = [times[b][i] / times[a][i] for i in range(ROUNDS)]
        m, iqr = _median_iqr(per_round)
        return {"median": round(m, 3), "iqr": round(iqr, 3), "n": ROUNDS}

    t_per_img = {n: [t / bb for t in times[n]] for n, bb in
                 [("fine_bf16_b128", B), ("packed_bf16_b32", BS),
                  ("packed_int8_b32", BS)]}
    times_img = {f"{k}_img": v for k, v in t_per_img.items()}
    times.update(times_img)
    extra["ratios"] = {
        "packed_int8_b32_vs_fine_bf16_b128_per_img":
            _ratio("packed_int8_b32_img", "fine_bf16_b128_img"),
        "packed_int8_b32_vs_packed_bf16_b32": _ratio(
            "packed_int8_b32", "packed_bf16_b32"),
        "packed_bf16_b32_vs_fine_bf16_b128_per_img":
            _ratio("packed_bf16_b32_img", "fine_bf16_b128_img"),
        "yoloxl_int8_vs_bf16": _ratio("yoloxl_int8_b64", "yoloxl_bf16_b64"),
    }

    # headline = the best measured deployable 24p-s e2e config (each is a
    # real serving configuration the Exp infer builders can select)
    candidates = {
        "fine_bf16_b128": B / med["fine_bf16_b128"],
        "packed_bf16_b32": BS / med["packed_bf16_b32"],
        "packed_int8_b32": BS / med["packed_int8_b32"],
    }
    headline_config = max(candidates, key=candidates.get)
    headline = candidates[headline_config]
    extra["headline_config"] = headline_config
    # cross-round continuity (ADVICE r4): the fixed config every round
    # reported, regardless of which config wins this session
    extra["headline_fixed_config"] = {
        "name": "fine_bf16_b128",
        "value": round(candidates["fine_bf16_b128"], 1),
        "unit": "img/s/chip",
    }
    print(
        json.dumps(
            {
                "metric": "inference_throughput_640px_24p_s",
                "value": round(headline, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(headline / 2000.0, 3),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
