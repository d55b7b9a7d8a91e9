"""Synthetic batch builders for benchmarks / profiling.

One source of truth for the 24p label row layout
``[cls, cx, cy, 24×(x, y)]`` zero-padded to ``max_labels`` (the format of
`/root/reference/yolox_24p/models/losses.py:193-204`), shared by bench.py
and tools/profile_train.py so a layout change cannot silently desynchronize
the measured workloads.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def synthetic_24p_batch(
    rng,
    batch: int,
    size: int = 640,
    ngt: int = 8,
    max_labels: int = 50,
    r_lo: float = 10.0,
    r_hi: float = 80.0,
):
    """Returns (images [B, S, S, 3] f32 in 0..255,
    labels [B, max_labels, 51] f32 with ``ngt`` valid star-polygon rows)."""
    k0, k1, k2, k3 = jax.random.split(rng, 4)
    imgs = jax.random.uniform(
        k0, (batch, size, size, 3), jnp.float32
    ) * 255.0
    margin = r_hi + 20.0
    cx = jax.random.uniform(
        k1, (batch, max_labels, 1), minval=margin, maxval=size - margin
    )
    cy = jax.random.uniform(
        k2, (batch, max_labels, 1), minval=margin, maxval=size - margin
    )
    r = jax.random.uniform(
        k3, (batch, max_labels, 24), minval=r_lo, maxval=r_hi
    )
    theta = jnp.arange(24) * (2 * jnp.pi / 24)
    pts = jnp.stack(
        [cx + r * jnp.cos(theta), cy + r * jnp.sin(theta)], -1
    ).reshape(batch, max_labels, 48)
    labels = jnp.concatenate(
        [jnp.zeros((batch, max_labels, 1)), cx, cy, pts], -1
    )
    labels = labels * (jnp.arange(max_labels)[None, :, None] < ngt)
    return imgs, labels
