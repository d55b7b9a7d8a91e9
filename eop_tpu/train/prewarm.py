"""Background AOT compilation of the multiscale shape buckets.

The bbox trainer draws a new input size every 10 iters
(ref `yolox/exp/yolox_base.py:166-185`), so the jitted train step sees
(2*multiscale_range + 1) distinct image shapes, each a separate XLA
program.  Measured cold (tools/measure_compile_cost.py, BASELINE.md):
~40-110 s per bucket over the axon tunnel, vs ~10 s for a fresh
dispatch against a warm persistent cache — the first epoch of a fresh
run stalls minutes at a time whenever the draw lands on an uncompiled
bucket.

Mitigation: compile every bucket ahead-of-time on a daemon thread while
epoch 0 trains.  ``jit.lower(...).compile()`` takes abstract
``ShapeDtypeStruct`` args (no device buffers touched, donation is
irrelevant) and the resulting executable lands in the persistent
compilation cache, so the main loop's first visit to a bucket becomes a
disk deserialize instead of a fresh XLA compile.  XLA releases the GIL
during compilation and PJRT clients are thread-safe, so the prewarm
overlaps cleanly with on-device training steps.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def multiscale_buckets(exp) -> list:
    """Every (h, w) the exp's random_resize can draw, ascending — the same
    aspect-preserving formula as `Exp.random_resize` (size_factor = W/H),
    so the prewarmed shapes are exactly the dispatched shapes."""
    if getattr(exp, "random_size", None) is not None:
        lo, hi = exp.random_size
    else:
        base = int(exp.input_size[0] / 32)
        lo, hi = base - exp.multiscale_range, base + exp.multiscale_range
    size_factor = exp.input_size[1] / exp.input_size[0]
    return [(32 * s, 32 * int(s * size_factor)) for s in range(lo, hi + 1)]


class BucketClaims:
    """Coordination between the prewarm thread and the train loop so the
    SAME shape bucket is never compiled twice concurrently (measured: a
    10-iter multiscale draw landing on the bucket the prewarm thread was
    mid-compiling ran a full duplicate XLA compile — 143 s first step on a
    busy host vs ~10 s for a persistent-cache hit).

    Whoever claims a size first compiles it; the other side waits on the
    size's event (set on completion, success or failure) and then
    dispatches against the now-warm persistent cache.  Distinct sizes
    still compile fully in parallel.
    """

    def __init__(self, sizes):
        self._lock = threading.Lock()
        self._claimed: set = set()
        self.events = {tuple(s): threading.Event() for s in sizes}

    def claim(self, size) -> bool:
        """True if the caller should compile ``size`` itself."""
        size = tuple(size)
        with self._lock:
            if size in self._claimed:
                return False
            self._claimed.add(size)
            if size not in self.events:
                self.events[size] = threading.Event()
            return True

    def release(self, size):
        self.events[tuple(size)].set()

    def wait(self, size, timeout: float = 900.0):
        ev = self.events.get(tuple(size))
        if ev is not None:
            ev.wait(timeout)


def prewarm_step_buckets(
    step_fn,
    state,
    sizes: Sequence[Tuple[int, int]],
    batch_size: int,
    label_shape: Tuple[int, ...],
    skip: Sequence[Tuple[int, int]] = (),
    log: Optional[Callable[[str], None]] = None,
    stop: Optional[threading.Event] = None,
    done: Optional[set] = None,
    claims: Optional[BucketClaims] = None,
) -> int:
    """AOT-compile ``step_fn`` for each image size in ``sizes``.

    ``state`` may be concrete or abstract; only shapes/dtypes are read.
    ``stop`` (checked between buckets) aborts early; successfully
    compiled sizes are added to ``done`` as they land.  ``claims``
    (shared with the train loop) prevents compiling a bucket the main
    thread has already started on.  Returns the number of buckets
    compiled (failures are skipped — a prewarm miss only costs the
    latency it was hiding).
    """
    state_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        state,
    )
    # aval from a REAL key so a non-default PRNG impl (e.g. rbg's
    # uint32[4]) still produces the dispatch path's exact signature
    rng0 = jax.random.PRNGKey(0)
    rng_abs = jax.ShapeDtypeStruct(jnp.shape(rng0), rng0.dtype)
    lbl_abs = jax.ShapeDtypeStruct(tuple(label_shape), jnp.float32)
    n = 0
    skip = {tuple(s) for s in skip}
    for size in sizes:
        if tuple(size) in skip:
            continue
        if stop is not None and stop.is_set():
            break
        if claims is not None and not claims.claim(size):
            continue  # the train loop got there first
        img_abs = jax.ShapeDtypeStruct(
            (batch_size, size[0], size[1], 3), jnp.float32
        )
        try:
            step_fn.lower(state_abs, img_abs, lbl_abs, rng_abs).compile()
            n += 1
            if done is not None:
                done.add(tuple(size))
            if log:
                log(f"prewarm: bucket {size[0]}px compiled ({n} done)")
        except Exception as e:  # noqa: BLE001 — prewarm is best-effort
            if log:
                log(f"prewarm: bucket {size[0]}px failed: {e!r}")
        finally:
            if claims is not None:
                claims.release(size)
    return n


def start_prewarm_thread(
    step_fn,
    state,
    sizes,
    batch_size: int,
    label_shape,
    skip=(),
    log=None,
) -> threading.Thread:
    """Run the prewarm on a daemon thread.

    The returned thread carries ``stop_event`` (set it to abort between
    buckets), ``done_sizes`` (grows as buckets land — lets the caller
    tell a cache hit from an unprewarmed compile) and ``claims`` (a
    :class:`BucketClaims` the train loop shares to avoid duplicate
    concurrent compiles of one bucket).
    """
    stop = threading.Event()
    done: set = set()
    claims = BucketClaims(sizes)
    t = threading.Thread(
        target=prewarm_step_buckets,
        args=(step_fn, state, sizes, batch_size, label_shape),
        kwargs={"skip": skip, "log": log, "stop": stop, "done": done,
                "claims": claims},
        name="eop-bucket-prewarm",
        daemon=True,
    )
    t.stop_event = stop
    t.done_sizes = done
    t.claims = claims
    t.start()
    return t
