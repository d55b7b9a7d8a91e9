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


def calibration_batch(calib_dir: Optional[str], src_hw: Tuple[int, int],
                      test_size: Tuple[int, int], n_max: int = 32):
    """One calibration batch for int8 PTQ, preprocessed exactly as the
    serving path preprocesses real traffic: aspect-preserving letterbox
    onto the ``src_hw`` canvas on the host (pad 114 — NOT a stretch
    resize, which would distort aspect and fit activation scales to a
    padless distribution), then the device letterbox to ``test_size``.
    Falls back to uniform noise (with a warning) when ``calib_dir`` has
    no images — smoke use only."""
    import glob
    import os

    import jax.numpy as jnp
    import numpy as np

    from ..data.transforms import letterbox_batch_device
    from ..serving.service import _host_letterbox

    raws = []
    if calib_dir:
        paths = sorted(
            p for p in glob.glob(os.path.join(calib_dir, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )[:n_max]
        import cv2

        for path in paths:
            img = cv2.imread(path)
            if img is not None:
                raws.append(_host_letterbox(img, src_hw)[0])
    if not raws:
        print("WARNING: no calibration images — calibrating on uniform "
              "noise; accuracy of the int8 program is unvalidated")
        raw = np.random.RandomState(0).randint(
            0, 255, (8, src_hw[0], src_hw[1], 3), np.uint8
        )
    else:
        raw = np.stack(raws)
    letterboxed, _ = letterbox_batch_device(
        jnp.asarray(raw, jnp.float32), src_hw, test_size
    )
    return letterboxed


# artifact container: magic + 4-byte big-endian JSON length + JSON
# metadata + the StableHLO blob.  Metadata travels WITH the program so
# the serving site never has to hand-supply values (test_size!) whose
# mismatch would silently mis-scale every returned coordinate.
_MAGIC = b"EOPSRV1\n"


def save_serving_artifact(exported, path: str, meta: Optional[dict] = None) -> int:
    """Serialize an ``Exported`` (+ JSON ``meta``) to ``path``; returns
    the total byte size.  ``meta`` should carry at least ``test_size``
    (the model input the program letterboxes to — the serving site needs
    it to undo that ratio)."""
    import json

    blob = exported.serialize()
    head = json.dumps(meta or {}).encode()
    data = _MAGIC + len(head).to_bytes(4, "big") + head + blob
    Path(path).write_bytes(data)
    return len(data)


def load_serving_artifact(path: str, with_meta: bool = False):
    """Deserialize a saved artifact.  ``.call(raw_uint8)`` runs it.

    ``with_meta=True`` returns ``(exported, meta_dict)``; headerless
    blobs from before the container format load with ``meta == {}``.
    """
    import json

    data = Path(path).read_bytes()
    meta = {}
    if data[: len(_MAGIC)] == _MAGIC:
        n = int.from_bytes(data[len(_MAGIC): len(_MAGIC) + 4], "big")
        body = len(_MAGIC) + 4
        meta = json.loads(data[body: body + n])
        data = data[body + n:]
    exported = jax_export.deserialize(data)
    return (exported, meta) if with_meta else exported
