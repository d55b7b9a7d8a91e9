"""Portable serving artifacts via ``jax.export`` (StableHLO).

Deployment story the reference lacks: its demo paths
(`/root/reference/yolox_24p/show_24p.py:266-305`,
`yolox/demo_featuremap.py:73-143`) re-run eager torch and need the full
model code + checkpoint at the serving site.  Here the fully-fused
serving program — on-device uint8 letterbox + forward + decode + NMS,
``exp.get_serving_fn`` — is exported as one versioned StableHLO blob:
weights baked in as constants, loadable from any JAX process with
``load_serving_artifact`` (no model code, no checkpoint, no exp), and
compiled by XLA for whichever exported platform runs it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_serving(
    exp,
    model,
    variables,
    batch_size: int,
    src_hw: Tuple[int, int],
    platforms: Optional[Sequence[str]] = None,
    quant_scales=None,
    quant_min_channels: int = 64,
):
    """Freeze ``exp.get_serving_fn`` into a ``jax.export.Exported``.

    ``platforms``: lowering targets (e.g. ``("tpu", "cpu")``); defaults
    to the current backend.  The exported callable takes one
    ``uint8[batch, H, W, 3]`` array and returns ``{"rows", "valid"}``
    (the ``Detections`` fields as a plain dict, so deserialization needs
    no custom pytree types).

    ``quant_scales``: int8-PTQ activation scales from
    ``exp.quantize_for_inference`` (pass its deploy variables too) —
    the artifact then carries int8 weights as constants and runs
    eligible convs on the MXU int8 path.
    """
    serve = exp.get_serving_fn(
        model, variables, src_hw,
        quant_scales=quant_scales, quant_min_channels=quant_min_channels,
    )

    @jax.jit
    def serve_portable(raw_uint8):
        det = serve(raw_uint8)
        return {"rows": det.rows, "valid": det.valid}

    spec = jax.ShapeDtypeStruct(
        (batch_size, src_hw[0], src_hw[1], 3), jnp.uint8
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(serve_portable, **kwargs)(spec)


def save_serving_artifact(exported, path: str) -> int:
    """Serialize an ``Exported`` to ``path``; returns the byte size."""
    blob = exported.serialize()
    Path(path).write_bytes(blob)
    return len(blob)


def load_serving_artifact(path: str):
    """Deserialize a saved artifact.  ``.call(raw_uint8)`` runs it."""
    return jax_export.deserialize(Path(path).read_bytes())
