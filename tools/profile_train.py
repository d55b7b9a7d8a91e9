"""Profile the 24p train step on the attached device: step time, img/s,
and a per-op device-time table (via the dependency-free xplane reader).

Replaces the reference's `thop`+host-timer observability
(`/root/reference/yolox_24p/train_24p.py:73-111` has no device profiling
at all) with an XLA device trace breakdown — run:

    python tools/profile_train.py --batch 32 --size 640 --top 25
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def attach(args):
    """Attach to a live ``--profile-port`` trainer and print its per-op
    device-time tables — live profiling of a real run, not an offline
    replica (closes the observability gap the reference never had:
    `yolox_24p/train_24p.py:73-111` is host timers only)."""
    from jax.collect_profile import collect_profile

    from eop_tpu.utils.xplane import device_op_table

    host, _, port = args.attach.rpartition(":")
    logdir = args.logdir or tempfile.mkdtemp(prefix="eop_live_trace_")
    collect_profile(
        int(port), args.duration_ms, host or "127.0.0.1", logdir,
        no_perfetto_link=True,
    )
    print(f"live trace ({args.duration_ms} ms window) in {logdir}")
    for title, by_cat in (("by category", True), ("top ops", False)):
        print(f"--- device time {title} ---")
        try:
            rows = device_op_table(logdir, top=args.top, by_category=by_cat)
        except FileNotFoundError as e:
            print(f"  no device plane: {e}")
            break
        for op, ms in rows:
            print(f"{ms:10.3f} ms  {op}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--trace-steps", type=int, default=3)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--depth", type=float, default=0.33)
    ap.add_argument("--width", type=float, default=0.50)
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--hlo-cost", action="store_true",
                    help="also print estimated device cycles by source "
                         "line from the compiled HLO (no trace needed)")
    ap.add_argument("--packed", default="train",
                    choices=["train", "true", "false"],
                    help="packed_early mode for the early backbone "
                         "(default: train — the trainers' default)")
    ap.add_argument("--attach", default=None, metavar="HOST:PORT",
                    help="capture a live trace from a running trainer "
                         "started with --profile-port (no local model is "
                         "built); prints the same per-op device tables")
    ap.add_argument("--duration-ms", type=int, default=3000,
                    help="capture window for --attach")
    args = ap.parse_args()

    if args.attach:
        attach(args)
        return

    import jax
    import jax.numpy as jnp
    import optax

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from eop_tpu.losses import Loss24PConfig
    from eop_tpu.models import YOLOX
    from eop_tpu.train.steps import create_train_state, make_train_step_24p
    from eop_tpu.utils.profiler import trace
    from eop_tpu.utils.xplane import device_op_table

    from eop_tpu.utils.synth import synthetic_24p_batch

    model = YOLOX(
        depth=args.depth, width=args.width, num_classes=80, reg_dim=26,
        dtype=jnp.bfloat16,
        packed_early={"train": "train", "true": True,
                      "false": False}[args.packed],
    )
    tx = optax.sgd(0.01, momentum=0.9, nesterov=True)
    rng = jax.random.PRNGKey(0)
    B, S = args.batch, args.size
    # ~8 valid plausible 24-gon rows per image
    imgs, labels = synthetic_24p_batch(rng, B, S, ngt=8)

    state = create_train_state(
        model, tx, rng, imgs[:1], use_ema=True, with_dwa=True
    )
    step = jax.jit(
        make_train_step_24p(model, tx, Loss24PConfig(), ema_decay=0.9998),
        donate_argnums=(0,),
    )

    if args.hlo_cost:
        from eop_tpu.utils.hlo_cost import cost_by_source, format_table

        txt = step.lower(
            state, imgs, labels, jax.random.PRNGKey(1)
        ).compile().as_text()
        print(format_table(cost_by_source(txt, top=args.top)))

    t0 = time.perf_counter()
    state, metrics = step(state, imgs, labels, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["total_loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    # timed run: enqueue N, fetch last (tunnel-safe sync, see bench.py);
    # best-of-3 passes — the tunnel sporadically injects multi-second
    # stalls that would otherwise corrupt the number
    key = jax.random.PRNGKey(1)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(args.steps):
            state, metrics = step(state, imgs, labels, key)
        float(metrics["total_loss"])
        dt = min(dt, (time.perf_counter() - t0) / args.steps)
    print(f"train step: {dt * 1e3:.2f} ms  ({B / dt:.1f} img/s)  "
          f"B={B} @{S}px  (best of 3 passes)")

    if args.no_trace:
        return
    logdir = args.logdir or tempfile.mkdtemp(prefix="eop_trace_")
    with trace(logdir):
        for i in range(args.trace_steps):
            state, metrics = step(state, imgs, labels, jax.random.PRNGKey(i))
        float(metrics["total_loss"])
    print(f"trace in {logdir}")
    for title, by_cat in (("by category", True), ("top ops", False)):
        print(f"--- device time {title} "
              f"(sum over {args.trace_steps} steps) ---")
        try:
            rows = device_op_table(
                logdir, top=args.top, by_category=by_cat)
        except FileNotFoundError as e:
            print(f"  no device plane: {e}")
            break
        for op, ms in rows:
            print(f"{ms:10.3f} ms  {op}")


if __name__ == "__main__":
    main()
