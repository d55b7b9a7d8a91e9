#!/usr/bin/env python3
"""24p-s train-step ceiling probes (round-5 VERDICT item 4).

Same-session, interleaved (5 rounds, median/IQR — bench.py method):

  A. baseline: the shipped step (packed_early="train", packed_depth=2), B=32
  B. packed_depth=3: dark3 (128 ch at width 0.5 = exactly the MXU lane
     width) also runs packed — does widening 128->512 at quarter spatial
     buy anything on the fwd+bwd path?
  C. B=64 step shape: does doubling the batch amortize the fixed
     per-step work (SimOTA host-side? no — all in-program; measure)?
  D. remat on (B=64): the memory headroom knob, for context.

int8 backward is OUT OF SCOPE: training is bf16 end-to-end; int8 here is
a post-training inference quantization (no QAT in the reference either),
and an int8 backward would change the training numerics the trajectory
-parity suite pins.  Stated in docs/DESIGN.md round-5 closure.

Usage: python tools/bench_trainstep_probes.py [--rounds 5]
Prints one JSON line with per-config {ms_median, ms_iqr, img_s} + ratios.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from bench import _measure_rtt, _median_iqr, _timed_pass
    from eop_tpu.losses import Loss24PConfig
    from eop_tpu.models import YOLOX, init_model
    from eop_tpu.train.steps import create_train_state, make_train_step_24p
    from eop_tpu.utils.setup_env import enable_compile_cache
    from eop_tpu.utils.synth import synthetic_24p_batch

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))

    rng = jax.random.PRNGKey(0)
    rtt = _measure_rtt(jnp, jax, jnp.zeros((8, 8)))
    key = jax.random.PRNGKey(1)

    def build(packed_depth, batch, remat=False):
        model = YOLOX(depth=0.33, width=0.50, num_classes=80, reg_dim=26,
                      dtype=jnp.bfloat16, packed_early="train",
                      packed_depth=packed_depth, remat=remat)
        x, labels = synthetic_24p_batch(rng, batch, 640, ngt=8)
        tx = optax.sgd(0.01, momentum=0.9, nesterov=True)
        state = create_train_state(model, tx, rng, x[:1], use_ema=True,
                                   with_dwa=True)
        step = jax.jit(
            make_train_step_24p(model, tx, Loss24PConfig(),
                                ema_decay=0.9998),
            donate_argnums=(0,),
        )
        box = [state]

        def run():
            s, m = step(box[0], x, labels, key)
            box[0] = s
            return m["total_loss"]

        float(run())  # compile + warm
        return run, batch

    print("building/compiling 4 step programs...", flush=True)
    configs = {
        "b32_pd2_baseline": build(2, 32),
        "b32_pd3": build(3, 32),
        "b64_pd2": build(2, 64),
        "b64_pd2_remat": build(2, 64, remat=True),
    }

    times = {n: [] for n in configs}
    for _ in range(args.rounds):
        for n, (run, _) in configs.items():
            times[n].append(_timed_pass(run, float, args.iters, rtt))

    out = {}
    for n, (_, batch) in configs.items():
        med, iqr = _median_iqr(times[n])
        out[n] = {"ms_median": round(med * 1e3, 2),
                  "ms_iqr": round(iqr * 1e3, 2),
                  "img_s": round(batch / med, 1),
                  "n": args.rounds}
    import numpy as np

    def ratio(a, b):  # per-image speedup of a over b
        ba, bb = configs[a][1], configs[b][1]
        r = [(times[b][i] / bb) / (times[a][i] / ba)
             for i in range(args.rounds)]
        m, iq = _median_iqr(r)
        return {"median": round(m, 3), "iqr": round(iq, 3)}

    out["ratios"] = {
        "pd3_vs_baseline_b32": ratio("b32_pd3", "b32_pd2_baseline"),
        "b64_vs_b32_per_img": ratio("b64_pd2", "b32_pd2_baseline"),
        "b64_remat_vs_b64": ratio("b64_pd2_remat", "b64_pd2"),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
