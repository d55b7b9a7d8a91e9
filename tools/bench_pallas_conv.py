"""Benchmark the Pallas phase conv vs XLA's conv emitter on the real chip.

Shapes = the small-channel stages of 24p-s @640 (BASELINE.md round-2
attribution).  Timing uses the queue-drain method (enqueue N, fetch one
scalar) because block_until_ready does not block through the axon tunnel;
best-of-R passes to reject tunnel stalls.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    from eop_tpu.ops.pallas import phase_conv

    dtype = getattr(jnp, args.dtype)
    B = args.batch

    # (name, H, W, Cin, Cout, k, stride, pad)
    shapes = [
        ("stem 6x6/s2 3->32 @640", 640, 640, 3, 32, 6, 2, 2),
        ("dark2 3x3/s2 32->64 @320", 320, 320, 32, 64, 3, 2, 1),
        ("dark2 csp 1x1 64->32 @160", 160, 160, 64, 32, 1, 1, 0),
        ("dark2 csp 3x3 32->32 @160", 160, 160, 32, 32, 3, 1, 1),
        ("dark2 csp 1x1 64->64 @160", 160, 160, 64, 64, 1, 1, 0),
        ("dark3 3x3/s2 64->128 @160", 160, 160, 64, 128, 3, 2, 1),
        ("dark3 csp 3x3 64->64 @80", 80, 80, 64, 64, 3, 1, 1),
    ]

    def timed(fn, x, w):
        out = fn(x, w)  # compile
        probe = jax.device_get(out.ravel()[0])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(x, w)
            jax.device_get(out.ravel()[0])
            dt = (time.time() - t0) / args.iters
            best = min(best, dt)
        return best, probe

    rng = np.random.RandomState(0)
    print(f"B={B} dtype={args.dtype} iters={args.iters} best-of-{args.reps}")
    header = f"{'shape':34} {'xla ms':>8} {'pallas ms':>9} {'x':>6} " \
             f"{'xla TF/s':>8} {'pallas TF/s':>11}"
    print(header)
    for name, h, w_, ci, co, k, s, p in shapes:
        x = jnp.asarray(rng.randn(B, h, w_, ci), dtype)
        wgt = jnp.asarray(rng.randn(k, k, ci, co) * 0.05, dtype)
        gflop = 2 * B * (h // s) * (w_ // s) * k * k * ci * co / 1e9

        xla = jax.jit(functools.partial(
            jax.lax.conv_general_dilated,
            window_strides=(s, s), padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ))
        pk = jax.jit(functools.partial(phase_conv, stride=s, padding=p))

        t_x, _ = timed(xla, x, wgt)
        t_p, _ = timed(pk, x, wgt)
        # correctness spot check on device
        d = jnp.max(jnp.abs(
            xla(x, wgt).astype(jnp.float32) - pk(x, wgt).astype(jnp.float32)
        ))
        print(f"{name:34} {t_x*1e3:8.3f} {t_p*1e3:9.3f} "
              f"{t_x/t_p:6.2f} {gflop/t_x/1e3:8.2f} {gflop/t_p/1e3:11.2f}"
              f"   maxdiff={float(d):.3g}")




def sweep():
    """Row-tile sweep for the dark2 down conv (run: --sweep)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eop_tpu.ops.pallas import phase_conv

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 320, 320, 32), jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(3, 3, 32, 64) * 0.05, jnp.bfloat16)
    for tr in (16, 20, 32, 40, 80):
        try:
            fn = jax.jit(functools.partial(
                phase_conv, stride=2, padding=1, row_tile=tr))
            out = fn(x, wgt)
            jax.device_get(out.ravel()[0])
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                for _ in range(20):
                    out = fn(x, wgt)
                jax.device_get(out.ravel()[0])
                best = min(best, (time.time() - t0) / 20)
            print(f"tr={tr:3d}  {best*1e3:7.3f} ms  "
                  f"{30.2/best/1e3:6.2f} TF/s")
        except Exception as e:
            print(f"tr={tr:3d}  FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    import sys as _sys

    if "--sweep" in _sys.argv:
        sweep()
    else:
        main()
