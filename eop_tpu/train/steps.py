"""Jitted train-step factories — one XLA program owns
forward + SimOTA + loss + backward + optimizer + EMA.

This replaces the reference's host-side iteration loop body
(`/root/reference/yolox/core/trainer.py:90-123` and
`yolox_24p/train_24p.py:73-111`).  AMP GradScaler machinery
(`trainer.py:100-108`) has no TPU equivalent by design: bf16 compute needs
no loss scaling; params/optimizer state stay fp32.

Data parallelism: feed the step through ``jax.jit`` with a batch-sharded
``NamedSharding`` (see `eop_tpu.parallel.mesh`); XLA inserts the gradient
all-reduce — the reference's DDP wrapper (`trainer.py:162-163`) dissolves
into sharding annotations.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import (
    DWAState,
    Loss24PConfig,
    YoloxLossConfig,
    loss_24p,
    yolox_losses,
)
from ..models.yolox import training_outputs
from .ema import ema_update


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    # the reference's ModelEMA averages every floating state_dict entry,
    # BN running stats included (`yolox/utils/ema.py:42-53`) — so eval-with-
    # EMA must pair EMA params with EMA batch stats, not the live ones.
    ema_batch_stats: Any = None
    dwa: Optional[DWAState] = None


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    rng,
    sample_input,
    use_ema: bool = True,
    with_dwa: bool = False,
) -> TrainState:
    from ..models import init_model

    variables = init_model(model, rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
        ema_batch_stats=(
            jax.tree.map(jnp.copy, batch_stats) if use_ema else None
        ),
        dwa=DWAState.init() if with_dwa else None,
    )


def _accum_scan(grads_of, state: "TrainState", images, labels, rng,
                accum: int):
    """Gradient accumulation: ``lax.scan`` over ``accum`` micro-batches.

    Semantics match running ``accum`` consecutive torch forward/backwards
    before one optimizer step: BN statistics (and DWA state, 24p) advance
    per micro-batch; gradients are averaged; the optimizer/EMA apply once.
    Loss/aux metrics come back micro-averaged except ``cand_dropped``,
    which is summed (it is a count).  The global batch must split evenly;
    for even device sharding keep ``batch/accum`` divisible by the data
    axis (``constrain_accum`` pins the per-micro layout).

    Capability beyond the reference (no grad accumulation anywhere in
    `yolox/core/trainer.py`): effective batch decouples from activation
    memory — the scan holds one micro-batch of activations at a time.
    """
    from ..parallel.mesh import constrain_accum

    b = images.shape[0]
    if b % accum:
        raise ValueError(f"batch {b} does not split into accum={accum}")
    im = constrain_accum(
        images.reshape(accum, b // accum, *images.shape[1:])
    )
    lb = constrain_accum(
        labels.reshape(accum, b // accum, *labels.shape[1:])
    )
    rngs = jax.random.split(rng, accum)
    gz = jax.tree.map(jnp.zeros_like, state.params)

    def body(carry, xs):
        bs, dwa, gsum = carry
        mi, ml, r = xs
        grads, total, aux, dwa, bs = grads_of(
            state.params, bs, dwa, mi, ml, r
        )
        gsum = jax.tree.map(jnp.add, gsum, grads)
        return (bs, dwa, gsum), (total, aux)

    (new_bs, new_dwa, gsum), (totals, auxs) = jax.lax.scan(
        body, (state.batch_stats, state.dwa, gz), (im, lb, rngs)
    )
    grads = jax.tree.map(lambda g: g / accum, gsum)
    aux = jax.tree.map(lambda a: jnp.mean(a, axis=0), auxs)
    if hasattr(aux, "cand_dropped"):
        aux = aux._replace(cand_dropped=aux.cand_dropped * accum)
    return grads, jnp.mean(totals), aux, new_dwa, new_bs


def make_train_step_bbox(
    model,
    tx: optax.GradientTransformation,
    config: YoloxLossConfig,
    ema_decay: Optional[float] = 0.9998,
    accum_steps: int = 1,
) -> Callable:
    """Train step for the bbox family (full-trainer path, T1)."""

    def grads_of(params, batch_stats, dwa, images, labels, rng):
        del dwa  # bbox family has no DWA state

        def loss_fn(p):
            (head_outs, _), mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            decoded, origin_reg, grids, strides = training_outputs(
                head_outs, reg_dim=4
            )
            total, aux = yolox_losses(
                decoded, origin_reg, labels, grids, strides, config
            )
            return total, (aux, mut["batch_stats"])

        (total, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return grads, total, aux, None, new_bs

    def step(state: TrainState, images, labels, rng):
        if accum_steps > 1:
            grads, total, aux, _, new_bs = _accum_scan(
                grads_of, state, images, labels, rng, accum_steps
            )
        else:
            grads, total, aux, _, new_bs = grads_of(
                state.params, state.batch_stats, None, images, labels, rng
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        new_ema_bs = state.ema_batch_stats
        if state.ema_params is not None and ema_decay is not None:
            new_ema = ema_update(
                state.ema_params, new_params, state.step + 1, ema_decay
            )
            if new_ema_bs is not None:
                new_ema_bs = ema_update(
                    new_ema_bs, new_bs, state.step + 1, ema_decay
                )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema,
            ema_batch_stats=new_ema_bs,
        )
        metrics = {
            "total_loss": total,
            "iou_loss": aux.loss_iou,
            "conf_loss": aux.loss_obj,
            "cls_loss": aux.loss_cls,
            "l1_loss": aux.loss_l1,
            "num_fg": aux.num_fg_per_gt,
            "cand_dropped": aux.cand_dropped,
        }
        return new_state, metrics

    return step


def make_train_step_24p(
    model,
    tx: optax.GradientTransformation,
    config: Loss24PConfig,
    ema_decay: Optional[float] = None,
    accum_steps: int = 1,
) -> Callable:
    """Train step for the 24-point detector (T8 path, plus EMA as an
    upgrade the reference's minimal trainer lacks)."""

    def grads_of(params, batch_stats, dwa, images, labels, rng):
        def loss_fn(p):
            (head_outs, _), mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            decoded, origin_reg, grids, strides = training_outputs(
                head_outs, reg_dim=26
            )
            total, aux, new_dwa = loss_24p(
                decoded, origin_reg, labels, grids, strides,
                dwa, config,
            )
            return total, (aux, new_dwa, mut["batch_stats"])

        (total, (aux, new_dwa, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return grads, total, aux, new_dwa, new_bs

    def step(state: TrainState, images, labels, rng):
        if accum_steps > 1:
            grads, total, aux, new_dwa, new_bs = _accum_scan(
                grads_of, state, images, labels, rng, accum_steps
            )
        else:
            grads, total, aux, new_dwa, new_bs = grads_of(
                state.params, state.batch_stats, state.dwa,
                images, labels, rng,
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        new_ema_bs = state.ema_batch_stats
        if state.ema_params is not None and ema_decay is not None:
            new_ema = ema_update(
                state.ema_params, new_params, state.step + 1, ema_decay
            )
            if new_ema_bs is not None:
                new_ema_bs = ema_update(
                    new_ema_bs, new_bs, state.step + 1, ema_decay
                )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            ema_params=new_ema,
            ema_batch_stats=new_ema_bs,
            dwa=new_dwa,
        )
        metrics = {
            "total_loss": total,
            "conf_loss": aux.loss_obj,
            "cls_loss": aux.loss_cls,
            "l1_loss": aux.loss_l1,
            "num_fg": aux.num_fg_per_gt,
            "cand_dropped": aux.cand_dropped,
            # the reference's per-step observability: 24 per-radius IoU
            # losses + the 26 DWA weights (train_24p.py:115-137)
            "iou_losses_24": aux.loss_iou,
            "dwa_reg_w": aux.reg_w,
            "dwa_obj_w": aux.obj_w,
            "dwa_cls_w": aux.cls_w,
        }
        return new_state, metrics

    return step
