"""Pallas phase-matmul convolution for small-channel NHWC stages.

Why: XLA's TPU conv emitters reach only ~1-2 TFLOP/s of the 197 TFLOP/s
bf16 peak on the early backbone stages (C=3..64 at 640->160 px) — the
channel dimension underfills the 128-lane MXU tile and the batch-in-
sublanes emitters serialize (BASELINE.md round-2 attribution).  This
kernel re-expresses those convs so the MXU contracts over a *full* lane
dimension:

1. **stride-2 convs become stride-1 phase convs**: space-to-depth(2) folds
   the 2x2 pixel phases into channels (C -> 4C; for the hot dark2 stage
   4x32 = exactly 128 lanes) and the kxk/s2 kernel becomes a dense
   ceil((k±..)/2)-extent stride-1 kernel over phase channels (6x6/s2 ->
   3x3/s1 with zero waste; 3x3/s2 -> 2x2/s1 with 7/16 structurally-zero
   taps);
2. **the conv itself is one matmul per row-tile**: the kernel DMAs a
   haloed row block into VMEM, builds the im2col patch matrix with
   unit-stride slices + a lane-dim concat, and issues a single
   [TR*W, k2*k2*C'] @ [k2*k2*C', Co] MXU contraction.

`phase_conv` matches ``jax.lax.conv_general_dilated`` (NHWC x HWIO,
symmetric torch-style padding (k-1)//2) bit-for-dtype on every supported
shape — pinned by tests/test_pallas_conv.py.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_geometry(k: int, padding: int) -> Tuple[int, int, int]:
    """Stride-2 kxk conv -> stride-1 phase conv geometry.

    Returns (extent k2, pad_top, pad_bottom) in phase-grid rows; the same
    numbers apply to columns.
    """
    lo = (-padding) // 2            # floor division
    hi = (k - 1 - padding) // 2
    return hi - lo + 1, -lo, hi


def _phase_weights(w: jnp.ndarray, padding: int) -> jnp.ndarray:
    """Scatter HWIO weights [k, k, C, Co] into the phase kernel
    [k2, k2, 4C, Co]; phase channel order matches `_space_to_depth`."""
    k, _, c, co = w.shape
    k2, _, _ = _phase_geometry(k, padding)
    lo = (-padding) // 2
    w2 = jnp.zeros((k2, k2, 4 * c, co), w.dtype)
    for ky in range(k):
        dy, py = (ky - padding) // 2 - lo, (ky - padding) % 2
        for kx in range(k):
            dx, px = (kx - padding) // 2 - lo, (kx - padding) % 2
            ch = (py * 2 + px) * c
            w2 = w2.at[dy, dx, ch: ch + c].set(w[ky, kx])
    return w2


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC [B, H, W, C] -> [B, H/2, W/2, 4C]; phase-major channels."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _row_tile(h_out: int, cap: int = 16) -> int:
    """Largest divisor of ``h_out`` not exceeding ``cap``."""
    for tr in range(min(cap, h_out), 0, -1):
        if h_out % tr == 0:
            return tr
    return 1


def _row_tile_for_budget(h: int, kh2: int, kw2: int, wp: int, wd: int,
                         c: int, co: int, itemsize: int,
                         budget_bytes: int) -> int:
    """Largest row tile whose working set fits the scoped-VMEM budget.

    Big tiles matter: the per-grid-step overhead is ~8 us on v5e, so
    hundreds of small steps cost more than the matmuls themselves.  The
    working set per output row: the double-buffered input block row, the
    f32 accumulator + one partial, and ~2 live tap operands.
    """
    # VMEM stores the minor dim in 128-lane tiles: a 12- or 64-channel
    # block still occupies 128 lanes, so budget against the PADDED sizes
    c_pad = 128 * max(1, -(-c // 128))
    co_pad = 128 * max(1, -(-co // 128))
    per_row = (
        2 * kw2 * wp * c_pad * itemsize   # input blocks (x2 buffers, kw2 refs)
        + 2 * wd * co_pad * 4             # f32 accumulator + partial
        + 2 * wd * c_pad * itemsize       # live tap operands
        + 2 * wd * co_pad * itemsize      # output block (x2 buffers)
    )
    cap = max(1, budget_bytes // per_row - (kh2 - 1))
    return _row_tile(h, cap=min(cap, h - kh2 + 1) if h > kh2 else 1)


def _conv_kernel(*refs, taps, tr, w_out, c_in, acc_dtype):
    """One grid step: tap-accumulated MXU matmuls over haloed row blocks.

    Inputs are kw2 COLUMN-PRESHIFTED copies of the padded input (one per
    horizontal tap), each delivered as an overlapping Element row window
    [1, tr + kh2 - 1, w_out, c].  Horizontal shifts done outside the
    kernel + vertical shifts as ROW slices keep every tap operand
    layout-free: rows are not a tiled dim, and the [tr, w, c] ->
    [tr*w, c] reshape preserves the (w, c) tiling.  (Slicing columns
    in-kernel instead costs a relayout per tap — measured ~5.5 ms of the
    9 ms dark2 kernel on v5e.)
    """
    kh2, kw2 = taps
    x_refs, w_ref, o_ref = refs[:kw2], refs[kw2], refs[kw2 + 1]
    acc = jnp.zeros((tr * w_out, w_ref.shape[-1]), acc_dtype)
    for dx in range(kw2):
        block = x_refs[dx]

        def tap_step(dy, a, block=block, dx=dx):
            # dynamic row start: rows are untiled, so the slice + reshape
            # stay layout-free
            tap = block[0, pl.ds(dy, tr)].reshape(tr * w_out, c_in)
            return a + jnp.dot(tap, w_ref[dy * kw2 + dx],
                               preferred_element_type=acc_dtype)

        # fori_loop bounds the live temporaries: a fully unrolled tap sum
        # keeps every partial alive and blows the 16 MB scoped-VMEM limit
        # on the 9-tap stem
        acc = jax.lax.fori_loop(0, kh2, tap_step, acc)
    o_ref[:] = acc.reshape(1, tr, w_out, -1).astype(o_ref.dtype)


def _phase_conv_s1(x: jnp.ndarray, w2: jnp.ndarray, pads,
                   row_tile: int | None = None) -> jnp.ndarray:
    """Stride-1 conv on the (possibly phase-folded) grid via the Pallas
    tap-matmul kernel.  x [B, H, W, C']; w2 [kh2, kw2, C', Co].

    The input is zero-padded by XLA outside the kernel (Mosaic's element
    windows do not support low padding, and blocked specs cannot express
    halo overlap); the kernel then reads overlapping unpadded Element row
    windows — the pipelined equivalent of a manual haloed DMA that works
    for any channel count (a manual HBM DMA requires the minor dim to
    match the 128-lane tiling).
    """
    from jax._src.pallas import core as pl_core  # Element block windows

    b, h, wd, c = x.shape
    kh2, kw2, _, co = w2.shape
    pt, pb, pl_, pr = pads
    assert kh2 - 1 == pt + pb and kw2 - 1 == pl_ + pr, (pads, w2.shape)
    assert h >= kh2, (h, kh2)
    wp = wd + pl_ + pr
    tr = row_tile or _row_tile_for_budget(
        h, kh2, kw2, wp, wd, c, co, jnp.dtype(x.dtype).itemsize,
        budget_bytes=12 * 1024 * 1024,
    )
    rows_needed = tr + kh2 - 1

    x_p = jnp.pad(x, ((0, 0), (pt, pb), (pl_, pr), (0, 0)))
    # one column-preshifted copy per horizontal tap (see _conv_kernel)
    x_shifts = [x_p[:, :, dx: dx + wd, :] for dx in range(kw2)]
    wf = w2.reshape(kh2 * kw2, c, co).astype(x.dtype)
    kernel = functools.partial(
        _conv_kernel,
        taps=(kh2, kw2), tr=tr, w_out=wd, c_in=c, acc_dtype=jnp.float32,
    )
    flops = 2 * b * h * wd * kh2 * kw2 * c * co
    x_spec = pl.BlockSpec(
        (
            pl_core.Element(1),
            pl_core.Element(rows_needed),
            pl_core.Element(wd),
            pl_core.Element(c),
        ),
        lambda bb, tt: (bb, tt * tr, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h // tr),
        in_specs=[x_spec] * kw2 + [
            pl.BlockSpec((kh2 * kw2, c, co),
                         lambda bb, tt: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, wd, co), lambda bb, tt: (bb, tt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=kw2 * x_p.size * x_p.dtype.itemsize
            + wf.size * wf.dtype.itemsize
            + b * h * wd * co * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*x_shifts, wf)


def _supported(k: int, stride: int, padding: int) -> bool:
    if stride == 1:
        return padding == (k - 1) // 2
    if stride == 2:
        # dense-output phase geometry: torch "same" padding, even input
        return padding == (k - 1) // 2 or (k % 2 == 0 and padding == k // 2 - 1)
    return False


PHASE_CONV_SUPPORTED = _supported


def phase_conv(x: jnp.ndarray, w: jnp.ndarray, stride: int,
               padding: int, row_tile: int | None = None) -> jnp.ndarray:
    """NHWC x HWIO conv via phase matmuls; semantics of
    ``lax.conv_general_dilated`` with symmetric ``padding`` per side.

    Supported: stride 1 (any odd k with torch 'same' padding), stride 2
    with k odd p=(k-1)//2 or k even p=k/2-1, H and W even for stride 2.
    """
    k = w.shape[0]
    assert w.shape[1] == k, "square kernels only"
    assert _supported(k, stride, padding), (k, stride, padding)
    if stride == 1:
        p = (k - 1) // 2
        return _phase_conv_s1(x, w, (p, p, p, p), row_tile)
    assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, x.shape
    _, pt, pb = _phase_geometry(k, padding)
    return _phase_conv_s1(
        _space_to_depth(x), _phase_weights(w, padding), (pt, pb, pt, pb),
        row_tile,
    )
