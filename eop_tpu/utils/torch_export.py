"""Flax variables → PyTorch state_dict exporter.

The inverse of `torch_import`: lets a checkpoint trained by THIS framework
drive the reference's torch model code (`/root/reference/yolox_24p/models/`,
`yolox/models/`) — the basis for trained-weight pipeline-parity goldens and
for users migrating back to the reference.

Pure numpy; the caller wraps the arrays in ``torch.tensor`` as needed.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np

# flax path -> torch dotted key, the inverse of `torch_import._RENAMES`.
# Order matters: specific stage names before the generic patterns.
_INVERSE_RENAMES = [
    # ---- head ----
    (r"\bstem_(\d+)\.", r"stems.\1."),
    (r"\bcls_conv_(\d+)_(\d+)\.", r"cls_convs.\1.\2."),
    (r"\breg_conv_(\d+)_(\d+)\.", r"reg_convs.\1.\2."),
    (r"\b(cls|reg|obj)_pred_(\d+)\.", r"\1_preds.\2."),
    # ---- CSPDarknet stages ----
    (r"\bdark5_spp\.", r"dark5.1."),
    (r"\bdark5_csp\.", r"dark5.2."),
    (r"\bdark(\d)_csp\.", r"dark\1.1."),
    (r"\bdark(\d)_conv\.", r"dark\1.0."),
    # ---- CSPLayer bottleneck list ----
    (r"\bm_(\d+)\.", r"m.\1."),
]


def unmap_key(path: str) -> str:
    """Flax dotted path prefix -> torch dotted key prefix.

    The rename patterns anchor on a trailing dot (they rename module
    *components*), so match against ``path + "."`` — otherwise a final
    component like ``cls_pred_0`` never rewrites."""
    path = path + "."
    for pat, repl in _INVERSE_RENAMES:
        path = re.sub(pat, repl, path)
    return path[:-1]


def _walk(tree: Mapping, prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def variables_to_state_dict(
    variables: Mapping[str, Mapping],
    with_batches_tracked: bool = True,
) -> Dict[str, np.ndarray]:
    """{"params": ..., "batch_stats": ...} -> torch-shaped state_dict.

    Layout transforms mirror the importer: conv HWIO -> OIHW, linear
    [in, out] -> [out, in], BN scale -> weight.  When
    ``with_batches_tracked`` each BN module also gets the
    ``num_batches_tracked`` counter torch's strict loading expects.
    """
    out: Dict[str, np.ndarray] = {}
    bn_prefixes = set()

    for path, v in _walk(variables.get("params", {})):
        prefix = unmap_key(".".join(path[:-1]))
        leaf = path[-1]
        if leaf == "kernel":
            if v.ndim == 4:  # HWIO -> OIHW
                out[f"{prefix}.weight"] = v.transpose(3, 2, 0, 1)
            else:  # linear [in, out] -> [out, in]
                out[f"{prefix}.weight"] = v.T
        elif leaf == "scale":  # BN gamma
            out[f"{prefix}.weight"] = v
        elif leaf == "bias":
            out[f"{prefix}.bias"] = v
        else:
            raise ValueError(f"unexpected param leaf {leaf!r} at {prefix}")

    for path, v in _walk(variables.get("batch_stats", {})):
        prefix = unmap_key(".".join(path[:-1]))
        leaf = path[-1]
        if leaf == "mean":
            out[f"{prefix}.running_mean"] = v
            bn_prefixes.add(prefix)
        elif leaf == "var":
            out[f"{prefix}.running_var"] = v
            bn_prefixes.add(prefix)
        else:
            raise ValueError(f"unexpected stat leaf {leaf!r} at {prefix}")

    if with_batches_tracked:
        for prefix in bn_prefixes:
            out[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)
    return out
