"""Model EMA as explicit train-state (no module mutation).

Parity target: `ModelEMA` (`/root/reference/yolox/utils/ema.py:22-60`):
state-dict-wide exponential moving average with ramped decay
``d·(1 − e^{−updates/2000})``.  Here the EMA params are a pytree carried in
the train state and updated inside the jitted step — the TPU equivalent of
the reference's per-iter host-side loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, new_params, updates, decay: float = 0.9998):
    """One EMA step. ``updates`` is the 1-based update count (traced ok)."""
    d = decay * (1.0 - jnp.exp(-updates / 2000.0))
    return jax.tree.map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
        ema_params,
        new_params,
    )
