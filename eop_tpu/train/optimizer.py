"""Optimizer construction (optax) with the reference's parameter grouping.

Parity targets:
* full trainer SGD: nesterov momentum 0.9, weight decay 5e-4 applied ONLY
  to conv/linear kernels — BN scales and biases get no decay
  (`/root/reference/yolox/exp/yolox_base.py:198-224` builds pg0=BN weights,
  pg1=decayed weights, pg2=biases);
* 24p trainer: plain SGD(nesterov) without decay groups
  (`yolox_24p/exp/yolox_base.py:120-124`).

In flax terms the decay mask is simply "leaf named ``kernel``" — BN scales
are ``scale`` and biases ``bias``, so the mask reproduces the 3-group split
exactly.
"""

from __future__ import annotations

from typing import Callable, Union

import optax


def _kernel_mask(params):
    import jax

    def mask_fn(path, _):
        return path[-1].key == "kernel"

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def build_sgd(
    learning_rate: Union[float, Callable[[int], float]],
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = True,
    clip_grad_norm: float = 0.0,
) -> optax.GradientTransformation:
    """SGD + (masked) weight decay; LR may be an iteration schedule.
    ``clip_grad_norm > 0`` adds global-norm gradient clipping (a stability
    option the reference lacks; off by default for parity)."""
    txs = []
    if clip_grad_norm and clip_grad_norm > 0:
        txs.append(optax.clip_by_global_norm(clip_grad_norm))
    if weight_decay > 0:
        # torch SGD couples wd into the gradient *before* momentum; optax
        # add_decayed_weights before trace reproduces that.
        txs.append(
            optax.masked(
                optax.add_decayed_weights(weight_decay), _kernel_mask
            )
        )
    txs.append(optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov))
    return optax.chain(*txs)
