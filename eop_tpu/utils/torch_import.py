"""PyTorch checkpoint → flax variables importer.

Lets users of the reference (IN2-ViAUn/Exploration-of-Potential) load its
released ``.pth`` checkpoints straight into this framework — the TPU-native
equivalent of `load_ckpt` (`/root/reference/yolox/utils/checkpoint.py:11-33`).

The flax module tree was deliberately named so that torch state_dict keys map
1:1 onto flax paths via mechanical renames; this module implements those
renames plus the layout transposes (torch conv OIHW → flax HWIO, linear
[out,in] → [in,out]) and splits params vs batch statistics.

Works standalone on host (numpy only); ``torch.load`` is used only inside
``load_torch_checkpoint`` so the importer itself has no torch dependency.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

# Keys of reference modules that its own forward never calls (dead code we
# intentionally do not reproduce): the ResNet classifier head and its unused
# 1x1 projections (`/root/reference/yolox/models/resnet.py:143-160`).
_DROP_PATTERNS = [
    r"\bnum_batches_tracked$",
    r"\bfc\.(weight|bias)$",
]

# ResNet's `baseconv1-3` are dead code; DenseNet's `baseconv1/2` are live
# taps. The name collides, so the drop is family-conditional (see
# `convert_state_dict`).
_RESNET_DEAD = r"\bbaseconv[123]\."

# Dotted-key renames, applied in order. These cover every model family:
# yolox heads, CSPDarknet, VGG, ResNet, DenseNet, classic Darknet + YOLOFPN.
_RENAMES = [
    # ---- head ----
    (r"\bstems\.(\d+)\.", r"stem_\1."),
    (r"\bcls_convs\.(\d+)\.(\d+)\.", r"cls_conv_\1_\2."),
    (r"\breg_convs\.(\d+)\.(\d+)\.", r"reg_conv_\1_\2."),
    (r"\b(cls|reg|obj)_preds\.(\d+)\.", r"\1_pred_\2."),
    # ---- DenseNet (before generic rules; its keys are distinctive) ----
    (r"\bD(\d)\.denseblock\.(\d+)\.conv_block\.0\.", r"D\1.layer\2.conv1."),
    (r"\bD(\d)\.denseblock\.(\d+)\.conv_block\.1\.", r"D\1.layer\2.conv2."),
    (r"\bT(\d)\.trans\.0\.", r"T\1.conv."),
    (r"\bstem\.0\.(conv|bn)\.", r"stem_conv.\1."),  # densenet stem BaseConv_DN
    # ---- VGG ----
    (r"\bconv_pool(\d)\.(\d+)\.", r"conv_pool\1_conv\2."),
    # ---- ResNet ----
    (r"\blayer(\d)\.(\d+)\.downsample\.0\.", r"layer\1_block\2.down_conv."),
    (r"\blayer(\d)\.(\d+)\.downsample\.1\.", r"layer\1_block\2.down_bn."),
    (r"\blayer(\d)\.(\d+)\.", r"layer\1_block\2."),
    # ---- CSPDarknet stages ----
    (r"\bdark(\d)\.0\.", r"dark\1_conv."),
    (r"\bdark5\.1\.", r"dark5_spp."),
    (r"\bdark5\.2\.", r"dark5_csp."),
    (r"\bdark(\d)\.1\.", r"dark\1_csp."),
    # ---- CSPLayer bottleneck list ----
    (r"\bm\.(\d+)\.", r"m_\1."),
]

# Classic Darknet (YOLOFPN backbone) uses positional Sequential indices with
# different meaning; applied only by `map_yolofpn_key`.
_RENAMES_YOLOFPN = [
    (r"\bstem\.0\.", r"stem_conv."),
    (r"\bstem\.1\.", r"stem_group.conv."),
    (r"\bstem\.(\d+)\.", lambda m: f"stem_group.res_{int(m.group(1)) - 2}."),
    (r"\bdark5\.0\.", r"dark5_group.conv."),
    # dark5: indices 1..nb are ResLayers, then 5 spp-block entries.
    # Handled numerically in map_yolofpn_key (depends on depth).
    (r"\bdark(\d)\.0\.", r"dark\1.conv."),
    (r"\bdark(\d)\.(\d+)\.", lambda m: f"dark{m.group(1)}.res_{int(m.group(2)) - 1}."),
    (r"\bout(\d)\.(\d)\.", r"out\1.cbl\2."),
]


def map_key(key: str) -> str | None:
    """Torch dotted key -> flax '/'-separated path prefix (without leaf)."""
    for pat in _DROP_PATTERNS:
        if re.search(pat, key):
            return None
    for pat, repl in _RENAMES:
        key = re.sub(pat, repl, key)
    return key


def map_yolofpn_key(key: str, depth: int = 53) -> str | None:
    """Key mapping for the YOLOv3 model (classic Darknet + YOLOFPN)."""
    for pat in _DROP_PATTERNS:
        if re.search(pat, key):
            return None
    nb = {21: [1, 2, 2, 1], 53: [2, 8, 8, 4]}[depth]
    # dark5 spp-block entries follow the residual run.
    m = re.search(r"\bdark5\.(\d+)\.", key)
    if m:
        i = int(m.group(1))
        n_res = nb[3]
        if i == 0:
            rep = "dark5_group.conv."
        elif i <= n_res:
            rep = f"dark5_group.res_{i - 1}."
        else:
            spp_names = ["conv0", "conv1", "spp", "conv2", "conv3"]
            rep = f"dark5_spp.{spp_names[i - 1 - n_res]}."
        key = key.replace(m.group(0), rep)
    for pat, repl in _RENAMES_YOLOFPN:
        key = re.sub(pat, repl, key)
    for pat, repl in _RENAMES:
        key = re.sub(pat, repl, key)
    return key


def _leaf(path: str, value: np.ndarray) -> Tuple[str, Tuple[str, ...], np.ndarray] | None:
    """(collection, flax path tuple, transformed array) for one torch tensor."""
    parts = path.split(".")
    name = parts[-1]
    prefix = parts[:-1]
    v = np.asarray(value)
    if name == "weight":
        if v.ndim == 4:  # conv OIHW -> HWIO
            return "params", (*prefix, "kernel"), v.transpose(2, 3, 1, 0)
        if v.ndim == 2:  # linear [out, in] -> [in, out]
            return "params", (*prefix, "kernel"), v.T
        return "params", (*prefix, "scale"), v  # BN gamma
    if name == "bias":
        return "params", (*prefix, "bias"), v
    if name == "running_mean":
        return "batch_stats", (*prefix, "mean"), v
    if name == "running_var":
        return "batch_stats", (*prefix, "var"), v
    return None


def _insert(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(
    state_dict: Mapping[str, Any],
    key_mapper=map_key,
) -> Dict[str, Dict]:
    """Torch state_dict -> {"params": ..., "batch_stats": ...} nested dicts."""
    out: Dict[str, Dict] = {"params": {}, "batch_stats": {}}
    is_densenet = any("denseblock" in k for k in state_dict)
    for key, value in state_dict.items():
        if not is_densenet and re.search(_RESNET_DEAD, key):
            continue
        mapped = key_mapper(key)
        if mapped is None:
            continue
        leaf = _leaf(mapped, value)
        if leaf is None:
            continue
        coll, path, v = leaf
        _insert(out[coll], path, v)
    return out


def _flatten(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def merge_into_variables(variables, converted, strict_shapes: bool = True):
    """Overlay converted torch weights onto a flax variables template.

    Mirrors the reference's shape-checked partial load
    (`yolox/utils/checkpoint.py:11-33`): keys missing from either side are
    skipped (and reported), shape mismatches are skipped unless
    ``strict_shapes``.

    Returns (new_variables, report dict).
    """
    import jax

    flat_t = dict(_flatten({k: variables[k] for k in variables}))
    flat_c = {}
    for coll, tree in converted.items():
        for path, v in _flatten(tree):
            flat_c[(coll,) + path] = v

    loaded, missing, unexpected, mismatched = [], [], [], []
    new_flat = {}
    for path, tv in flat_t.items():
        if path in flat_c:
            cv = flat_c[path]
            if tuple(cv.shape) == tuple(tv.shape):
                new_flat[path] = cv.astype(np.asarray(tv).dtype)
                loaded.append(path)
            else:
                mismatched.append((path, cv.shape, tuple(tv.shape)))
                if strict_shapes:
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path)}: "
                        f"ckpt {cv.shape} vs model {tuple(tv.shape)}"
                    )
                new_flat[path] = tv
        else:
            missing.append(path)
            new_flat[path] = tv
    for path in flat_c:
        if path not in flat_t:
            unexpected.append(path)

    def rebuild(tree, prefix=()):
        return {
            k: (
                rebuild(v, prefix + (k,))
                if isinstance(v, Mapping)
                else new_flat[prefix + (k,)]
            )
            for k, v in tree.items()
        }

    new_vars = {k: rebuild(variables[k], (k,)) for k in variables}
    report = {
        "loaded": loaded,
        "missing": missing,
        "unexpected": unexpected,
        "mismatched": mismatched,
    }
    return new_vars, report


def load_torch_checkpoint(path: str, key: str = "model"):
    """Load a reference ``.pth`` file and return its raw state_dict
    (host-side; requires torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    state_dict = ckpt.get(key, ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() for k, v in state_dict.items()}
