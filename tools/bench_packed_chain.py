"""Benchmark the packed-layout early segment vs the fine layout on the chip.

The segment = everything in 24p-s below 128 channels: folded-Focus stem,
dark2 downsample, dark2 CSP internals, dark3 downsample (whose output,
[80, 80, 128], is where both layouts converge).  Measures forward and
forward+backward (grads wrt all weights), bf16, queue-drain timing.

    python tools/bench_packed_chain.py --batch 32
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
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=20)
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
    from eop_tpu.ops.packed import packed_conv

    dtype = getattr(jnp, args.dtype)
    B, S = args.batch, args.size
    rng = np.random.RandomState(0)

    # 24p-s early weights (fine HWIO), silu between convs
    specs = [
        ("stem", 6, 2, 2, 3, 32),
        ("d2_down", 3, 2, 1, 32, 64),
        ("d2_conv1", 1, 1, 0, 64, 32),
        ("d2_conv2", 1, 1, 0, 64, 32),
        ("d2_m0c1", 1, 1, 0, 32, 32),
        ("d2_m0c2", 3, 1, 1, 32, 32),
        ("d2_conv3", 1, 1, 0, 64, 64),
        ("d3_down", 3, 2, 1, 64, 128),
    ]
    ws = [jnp.asarray(rng.randn(k, k, ci, co) * (1.0 / (k * k * ci) ** 0.5),
                      dtype)
          for _, k, _, _, ci, co in specs]
    x = jnp.asarray(rng.randn(B, S, S, 3), dtype)

    def fine_conv(x, w, s, p):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(s, s), padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def _csp(y, ws, conv):
        # conv(y, w, k, s, p) -> tensor; channel-concat works in both
        # layouts (channel-major packing)
        act = jax.nn.silu
        x1 = act(conv(y, ws[2], 1, 0))
        x2 = act(conv(y, ws[3], 1, 0))
        m = act(conv(x1, ws[4], 1, 0))
        m = act(conv(m, ws[5], 1, 1))
        x1 = m + x1
        cat = jnp.concatenate([x1, x2], axis=-1)
        return act(conv(cat, ws[6], 1, 0))

    def fine_chain(ws, x):
        act = jax.nn.silu
        y = act(fine_conv(x, ws[0], 2, 2))
        y = act(fine_conv(y, ws[1], 2, 1))
        y = _csp(y, ws, lambda t, w, s, p: fine_conv(t, w, s, p))
        return act(fine_conv(y, ws[7], 2, 1))

    def packed_chain(ws, x):
        act = jax.nn.silu
        hw = (S, S)
        y = act(packed_conv(x, ws[0], 2, 2, mode="fp", fine_hw=hw))
        hw = (hw[0] // 2, hw[1] // 2)
        y = act(packed_conv(y, ws[1], 2, 1, mode="pp", fine_hw=hw))
        hw = (hw[0] // 2, hw[1] // 2)
        y = _csp(y, ws,
                 lambda t, w, s, p: packed_conv(t, w, s, p, mode="pp",
                                                fine_hw=hw))
        return act(packed_conv(y, ws[7], 2, 1, mode="pf", fine_hw=hw))

    def stem_packed_chain(ws, x):
        # boundary sweep: only the stem computes packed (fp), dark2's
        # downsample consumes the packed tensor and returns to fine (pf)
        act = jax.nn.silu
        y = act(packed_conv(x, ws[0], 2, 2, mode="fp", fine_hw=(S, S)))
        y = act(packed_conv(y, ws[1], 2, 1, mode="pf",
                            fine_hw=(S // 2, S // 2)))
        y = _csp(y, ws, lambda t, w, s, p: fine_conv(t, w, s, p))
        return act(fine_conv(y, ws[7], 2, 1))

    def timed(fn, *a):
        out = fn(*a)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(*a)
            jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            best = min(best, (time.time() - t0) / args.iters)
        return best

    print(f"B={B} @{S} dtype={args.dtype} iters={args.iters} "
          f"best-of-{args.reps}")

    for name, chain in (("fine", fine_chain), ("packed", packed_chain),
                        ("stem-pk", stem_packed_chain)):
        fwd = jax.jit(chain)
        t_f = timed(fwd, ws, x)

        def loss(ws, x, chain=chain):
            return jnp.sum(jnp.square(chain(ws, x).astype(jnp.float32)))

        grad = jax.jit(jax.grad(loss))
        t_g = timed(grad, ws, x)
        print(f"{name:8}  fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_g*1e3:7.2f} ms")

    # variant: weights pre-packed outside the jitted function (isolates the
    # in-graph scatter cost of the weight transform from the conv emitters)
    from eop_tpu.ops.packed import (
        pack_weights_fine_to_packed,
        pack_weights_packed_to_packed,
        pack_weights_packed_to_fine,
    )

    def prepack(w, k, s, p, mode):
        if mode == "fp":
            return pack_weights_fine_to_packed(w, s, p)
        if mode == "pf":
            return pack_weights_packed_to_fine(w, s, p)
        return pack_weights_packed_to_packed(w, s, p)

    modes = ["fp", "pp", "pp", "pp", "pp", "pp", "pp", "pf"]
    pw = [prepack(w, spec[1], spec[2], spec[3], m)
          for w, spec, m in zip(ws, specs, modes)]
    pws = [jax.device_put(t[0]) for t in pw]

    def raw_conv(t, wp, s2, pl, out_h, out_w):
        kk = wp.shape[0]
        ph = (out_h - 1) * s2 + kk - pl - t.shape[1]
        pwid = (out_w - 1) * s2 + kk - pl - t.shape[2]
        return jax.lax.conv_general_dilated(
            t, wp, window_strides=(s2, s2),
            padding=[(pl, ph), (pl, pwid)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def prepacked_chain(pws, x):
        act = jax.nn.silu
        o = S // 4  # packed grid after stem
        y = act(raw_conv(x, pws[0], pw[0][1], pw[0][2], o, o))
        o = S // 8
        y = act(raw_conv(y, pws[1], pw[1][1], pw[1][2], o, o))
        x1 = act(raw_conv(y, pws[2], pw[2][1], pw[2][2], o, o))
        x2 = act(raw_conv(y, pws[3], pw[3][1], pw[3][2], o, o))
        m = act(raw_conv(x1, pws[4], pw[4][1], pw[4][2], o, o))
        m = act(raw_conv(m, pws[5], pw[5][1], pw[5][2], o, o))
        x1 = m + x1
        cat = jnp.concatenate([x1, x2], axis=-1)
        y = act(raw_conv(cat, pws[6], pw[6][1], pw[6][2], o, o))
        return act(raw_conv(y, pws[7], pw[7][1], pw[7][2], o, o))

    fwd = jax.jit(prepacked_chain)
    t_f = timed(fwd, pws, x)

    def loss_pp(pws, x):
        return jnp.sum(jnp.square(prepacked_chain(pws, x).astype(jnp.float32)))

    t_g = timed(jax.jit(jax.grad(loss_pp)), pws, x)
    print(f"{'prepack':8}  fwd {t_f*1e3:7.2f} ms   fwd+bwd {t_g*1e3:7.2f} ms")

    # correctness cross-check on device
    d = jnp.max(jnp.abs(
        jax.jit(fine_chain)(ws, x).astype(jnp.float32)
        - jax.jit(packed_chain)(ws, x).astype(jnp.float32)))
    print(f"maxdiff fine-vs-packed (bf16): {float(d):.4g}")


if __name__ == "__main__":
    main()
