"""Model introspection + deploy-time fusion.

Parity targets (`/root/reference/yolox/utils/model_utils.py`):
* `get_model_info:19-28` — params/GFLOPs summary (thop on torch; here
  parameter counting + XLA's own ``cost_analysis`` for exact compiled
  FLOPs, which beats thop's per-module estimate);
* `fuse_conv_and_bn:31` / `fuse_model:66` — conv+BN folding for deploy.
  In flax terms this is a pure pytree transform: fold every
  ``{conv|kernel, bn|scale/bias/mean/var}`` sibling pair into the conv
  kernel + a bias, so inference skips the BN entirely.  (XLA fuses the BN
  arithmetic anyway; folding removes it from the program altogether and
  matches the reference's deploy story.)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.blocks import BN_EPS


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def get_model_info(model, variables, tsize: Tuple[int, int]) -> str:
    """"Params: {:.2f}M, Gflops: {:.2f}" string (ref `get_model_info`).

    FLOPs come from XLA's cost analysis of the compiled forward at
    ``tsize`` (batch 1), counted like thop (MACs): cost_analysis reports
    flops = 2*MACs, so we halve it to match the reference's convention.
    """
    h, w = tsize
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    lowered = jax.jit(lambda v, i: model.apply(v, i, False)).lower(
        variables, x
    )
    try:
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) / 2.0
    except Exception:
        flops = 0.0
    n_params = count_params(variables.get("params", variables))
    return "Params: {:.2f}M, Gflops: {:.2f}".format(
        n_params / 1e6, flops / 1e9
    )


def _is_conv_bn_pair(node: Dict) -> bool:
    return (
        isinstance(node, dict)
        and "conv" in node
        and "bn" in node
        and isinstance(node["conv"], dict)
        and "kernel" in node["conv"]
    )


def fuse_conv_bn(params: Dict, batch_stats: Dict, eps: float = BN_EPS):
    """Fold BN into sibling convs across the whole tree
    (ref `fuse_conv_and_bn` / `fuse_model`).

    Returns (fused_params, identity_batch_stats).  The multiplicative BN
    factor folds into the conv kernel; the additive shift
    ``beta − mean·gamma/std`` lands in the (kept, identity-normalized)
    BN's ``bias`` — the convs are built with ``use_bias=False``, so a
    ``conv/bias`` entry would be *silently ignored* by ``model.apply``
    and the whole shift would be lost.  The fused forward is exactly
    ``act(conv_scaled(x) + shift)``; XLA folds the remaining identity BN
    arithmetic away at compile time.
    """

    def walk(p_node: Any, s_node: Any):
        if not isinstance(p_node, dict):
            return p_node
        out = {}
        if _is_conv_bn_pair(p_node) and s_node and "bn" in s_node:
            kernel = p_node["conv"]["kernel"]
            conv_bias = p_node["conv"].get("bias", 0.0)
            gamma = p_node["bn"]["scale"]
            beta = p_node["bn"]["bias"]
            mean = s_node["bn"]["mean"]
            var = s_node["bn"]["var"]
            std = jnp.sqrt(var + eps)
            factor = gamma / std  # per output channel
            fused_kernel = kernel * factor[None, None, None, :]
            fused_bias = beta + (conv_bias - mean) * factor
            out = dict(p_node)
            new_conv = dict(p_node["conv"], kernel=fused_kernel)
            if "bias" in new_conv:
                # the original conv bias is already accounted for inside
                # fused_bias (it flowed through the BN affine)
                new_conv["bias"] = jnp.zeros_like(new_conv["bias"])
            out["conv"] = new_conv
            out["bn"] = {
                "scale": jnp.ones_like(gamma),
                "bias": fused_bias,
            }
            # recurse into any remaining sibling subtrees
            for k, v in p_node.items():
                if k not in ("conv", "bn"):
                    out[k] = walk(v, (s_node or {}).get(k))
            return out
        for k, v in p_node.items():
            out[k] = walk(v, (s_node or {}).get(k) if s_node else None)
        return out

    fused = walk(params, batch_stats)

    def stats_identity(s_node):
        if not isinstance(s_node, dict):
            return s_node
        if "mean" in s_node and "var" in s_node:
            return {
                "mean": jnp.zeros_like(s_node["mean"]),
                "var": jnp.ones_like(s_node["var"]) - eps,
            }
        return {k: stats_identity(v) for k, v in s_node.items()}

    return fused, stats_identity(batch_stats)
