"""Step-locked training-trajectory parity for the BBOX family: the
reference's full-trainer per-iteration algorithm vs our
`make_train_step_bbox`, same init, same data.

The reference's `train_one_iter` (`/root/reference/yolox/core/trainer.py:
90-123`) composes four stateful pieces the 24p trajectory test
(`test_trajectory_parity_24p.py`) doesn't cover: the 3-group SGD with
masked weight decay (`yolox/exp/yolox_base.py:198-224`: BN weights and
biases undecayed, conv weights 5e-4), the per-iter `LRScheduler`
(`yolox/utils/lr_scheduler.py` — lr set AFTER each step from
`update_lr(progress+1)`, so update i runs at schedule(i) with
schedule(0)=warmup_lr), the ramped `ModelEMA`
(`yolox/utils/ema.py:44`: d = 0.9998·(1−e^{−updates/2000})), and the
head-internal loss (`yolox/models/yolo_head.py::get_losses`).  All four
are driven here with the reference's OWN modules, step-locked against our
jitted step on identical exported weights and batches.

The same measured physics as the 24p test applies (BASELINE.md
"Trajectory parity"): SimOTA near-tie flips make long lockstep chaotic,
so the evidence splits into tight early-step lockstep + chaos-envelope
long-run statistics, with the EMA state compared at the end (a linear
filter over the param trajectory — it inherits the chaos envelope but a
wrong decay/ramp would blow far past it).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import ref_loader
from eop_tpu.utils.torch_export import variables_to_state_dict

DEPTH, WIDTH, NUM_CLASSES, IMG = 0.33, 0.25, 3, 96
BATCH, MOMENTUM, WD, EMA_DECAY = 2, 0.9, 5e-4, 0.9998
BASIC_LR_PER_IMG = 0.01 / 64.0
ITERS_PER_EPOCH, TOTAL_EPOCHS, WARMUP_EPOCHS, NO_AUG_EPOCHS = 10, 4, 1, 1
MIN_LR_RATIO = 0.05
N_STEPS = int(os.environ.get("EOP_TRAJ_STEPS_BBOX", "40"))


def _synth_batches(n_steps):
    """Deterministic rectangle scenes: class == color channel, labels
    [cls, cx, cy, w, h] in pixels (`yolox/models/yolo_head.py:236-239`
    layout).  No augmentation pipeline — byte-identical inputs on both
    sides is the whole point."""
    rng = np.random.RandomState(3)
    images = np.zeros((8, IMG, IMG, 3), np.float32)
    labels = np.zeros((8, 20, 5), np.float32)
    for i in range(8):
        for g in range(rng.randint(2, 5)):
            cls = rng.randint(0, NUM_CLASSES)
            w, h = rng.uniform(18, 48, 2)
            cx = rng.uniform(w / 2 + 2, IMG - w / 2 - 2)
            cy = rng.uniform(h / 2 + 2, IMG - h / 2 - 2)
            x1, y1 = int(cx - w / 2), int(cy - h / 2)
            images[i, y1:int(y1 + h), x1:int(x1 + w), cls] = rng.uniform(
                120, 250
            )
            labels[i, g] = (cls, cx, cy, w, h)
        images[i] += rng.uniform(0, 25, (IMG, IMG, 3))
    batches = []
    for s in range(n_steps):
        idx = [(s * BATCH + j) % 8 for j in range(BATCH)]
        batches.append((images[idx], labels[idx]))
    return batches


def _lr_schedule():
    from eop_tpu.train.lr_schedule import yolox_warm_cos_lr

    lr = BASIC_LR_PER_IMG * BATCH
    return yolox_warm_cos_lr(
        lr, MIN_LR_RATIO,
        total_iters=ITERS_PER_EPOCH * TOTAL_EPOCHS,
        warmup_total_iters=ITERS_PER_EPOCH * WARMUP_EPOCHS,
        warmup_lr_start=0.0,
        no_aug_iter=ITERS_PER_EPOCH * NO_AUG_EPOCHS,
    )


def _make_models():
    from eop_tpu.models import YOLOX, init_model

    model = YOLOX(depth=DEPTH, width=WIDTH, num_classes=NUM_CLASSES,
                  reg_dim=4)
    variables = jax.tree.map(
        np.asarray,
        init_model(model, jax.random.PRNGKey(11),
                   jnp.zeros((1, IMG, IMG, 3), jnp.float32), on_host=True),
    )
    sd = variables_to_state_dict(variables)

    pafpn_mod = ref_loader.ref_module("yolo_pafpn")
    head_mod = ref_loader.ref_module("yolo_head")
    yolox_mod = ref_loader.ref_module("yolox")
    torch_model = yolox_mod.YOLOX(
        backbone=pafpn_mod.YOLOPAFPN("darknet", DEPTH, WIDTH),
        head=head_mod.YOLOXHead(NUM_CLASSES, width=WIDTH),
    )
    ref_loader.apply_init_yolo(torch_model)
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    return model, variables, torch_model


def _run_ours(model, variables, batches):
    from eop_tpu.losses import YoloxLossConfig
    from eop_tpu.train.optimizer import build_sgd
    from eop_tpu.train.steps import TrainState, make_train_step_bbox

    # tabulate the python schedule for jit (same trick as
    # eop_tpu/train/trainer.py:190-199)
    sched = _lr_schedule()
    total = ITERS_PER_EPOCH * TOTAL_EPOCHS
    table = jnp.asarray([sched(i) for i in range(total + 1)], jnp.float32)

    def sched_fn(count):
        return table[jnp.clip(count, 0, total)]

    tx = build_sgd(sched_fn, momentum=MOMENTUM, weight_decay=WD,
                   nesterov=True)
    params = jax.tree.map(jnp.asarray, variables["params"])
    bs = jax.tree.map(jnp.asarray, variables["batch_stats"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=bs,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, bs),
    )
    step = jax.jit(make_train_step_bbox(
        model, tx, YoloxLossConfig(num_classes=NUM_CLASSES),
        ema_decay=EMA_DECAY,
    ))
    rec = []
    for i, (imgs, labels) in enumerate(batches):
        state, metrics = step(
            state, jnp.asarray(imgs), jnp.asarray(labels),
            jax.random.PRNGKey(i),
        )
        m = jax.device_get(metrics)
        rec.append({k: float(m[k]) for k in
                    ("total_loss", "iou_loss", "conf_loss", "cls_loss")})
    final = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "ema_params": jax.device_get(state.ema_params),
        "ema_batch_stats": jax.device_get(state.ema_batch_stats),
    }
    return rec, final


def _run_reference(torch_model, batches):
    """The reference's train_one_iter, verbatim semantics on CPU fp32
    (the AMP GradScaler is CUDA-only; at enabled=False it is an exact
    no-op, so plain backward()/step() is the same algorithm)."""
    sched_mod = ref_loader._load_file(
        "_ref_lr_sched", f"{ref_loader.REF}/yolox/utils/lr_scheduler.py"
    )
    ema_mod = ref_loader._load_file(
        "_ref_ema", f"{ref_loader.REF}/yolox/utils/ema.py"
    )
    import torch.nn as nn

    torch_model.train()
    # `yolox/exp/yolox_base.py:198-224`: pg0 BN weights (no decay),
    # pg1 conv weights (decay), pg2 biases (no decay); initial lr is
    # warmup_lr=0 because warmup_epochs > 0
    pg0, pg1, pg2 = [], [], []
    for k, v in torch_model.named_modules():
        if hasattr(v, "bias") and isinstance(v.bias, nn.Parameter):
            pg2.append(v.bias)
        if isinstance(v, nn.BatchNorm2d) or "bn" in k:
            pg0.append(v.weight)
        elif hasattr(v, "weight") and isinstance(v.weight, nn.Parameter):
            pg1.append(v.weight)
    opt = torch.optim.SGD(pg0, lr=0.0, momentum=MOMENTUM, nesterov=True)
    opt.add_param_group({"params": pg1, "weight_decay": WD})
    opt.add_param_group({"params": pg2})

    scheduler = sched_mod.LRScheduler(
        "yoloxwarmcos", BASIC_LR_PER_IMG * BATCH, ITERS_PER_EPOCH,
        TOTAL_EPOCHS,
        warmup_epochs=WARMUP_EPOCHS, warmup_lr_start=0.0,
        no_aug_epochs=NO_AUG_EPOCHS, min_lr_ratio=MIN_LR_RATIO,
    )
    ema_model = ema_mod.ModelEMA(torch_model, EMA_DECAY)

    rec = []
    for i, (imgs, labels) in enumerate(batches):
        x = torch.from_numpy(np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)))
        y = torch.from_numpy(labels.copy())
        with ref_loader.cpu_torch_factories():
            # the reference forward returns (loss dict, fpn_outs) in
            # training mode (`yolox/models/yolox.py:28-49`)
            outputs, _ = torch_model(x, y)
        opt.zero_grad()
        outputs["total_loss"].backward()
        opt.step()
        ema_model.update(torch_model)
        lr = scheduler.update_lr(i + 1)
        for group in opt.param_groups:
            group["lr"] = lr
        rec.append({
            "total_loss": float(outputs["total_loss"].detach()),
            "iou_loss": float(outputs["iou_loss"].detach()),
            "conf_loss": float(outputs["conf_loss"].detach()),
            "cls_loss": float(outputs["cls_loss"].detach()),
        })
    rec_final_lr = lr
    return rec, ema_model, rec_final_lr


def _perturbed(variables, eps=1e-7):
    return jax.tree.map(
        lambda a: (a * (1 + eps)).astype(a.dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        variables,
    )


def _rel(a, b):
    return abs(a - b) / max(abs(b), 1e-6)


@pytest.fixture(scope="module")
def runs():
    model, variables, torch_model = _make_models()
    batches = _synth_batches(N_STEPS)
    ours, final_ours = _run_ours(model, variables, batches)
    refs, ema_model, final_lr = _run_reference(torch_model, batches)
    ctrl, final_ctrl = _run_ours(model, _perturbed(variables), batches)
    return (torch_model, ours, refs, ctrl, final_ours, final_ctrl,
            ema_model, final_lr)


def test_bbox_lockstep_early_steps(runs):
    """Steps 0-2 at near-fp32 precision: this is where a wrong LR order
    (schedule(i) vs schedule(i+1)), wrong warmup, missing nesterov, or a
    weight-decay mask error (decaying BN scales/biases) surfaces — each
    changes the update by far more than these bars.  Step 0 runs at
    lr=0 (the reference's warmup_lr), so step 1's loss additionally pins
    that only BN stats moved."""
    _, ours, refs, _, _, _, _, _ = runs
    # measured step-0 deviation: 2.2e-5 on cls (fp32 conv noise through
    # the fg-anchor-normalized terms); bars sit ~5-50x above the noise
    # and far below any semantic-bug signal (wrong nesterov: ~0.9x lr on
    # the whole update; lr off-by-one: step 0 would train at lr(1)!=0)
    tol = {0: 1e-4, 1: 1e-3, 2: 1e-2}
    for s in (0, 1, 2):
        for k in ("total_loss", "iou_loss", "conf_loss", "cls_loss"):
            assert _rel(ours[s][k], refs[s][k]) < tol[s], (
                s, k, ours[s][k], refs[s][k])


def test_bbox_long_trajectory_envelope(runs):
    """Cross-pipeline per-step deviation must live inside the
    self-perturbation chaos envelope (same methodology as the 24p test;
    the early-warmup lr is tiny, so divergence grows later here)."""
    _, ours, refs, ctrl, _, _, _, _ = runs
    cross = np.array([_rel(o["total_loss"], r["total_loss"])
                      for o, r in zip(ours, refs)])
    env = np.array([_rel(c["total_loss"], o["total_loss"])
                    for c, o in zip(ctrl, ours)])
    c, e = cross[3:], np.maximum(env[3:], 1e-6)
    assert np.median(c) < 10 * max(np.median(e), 1e-4), (
        np.median(c), np.median(e))
    assert c.max() < 50 * max(e.max(), 1e-3), (c.max(), e.max())
    # both descend: the obj loss dominates at init and must shrink
    assert refs[-1]["total_loss"] < refs[0]["total_loss"]
    assert ours[-1]["total_loss"] < ours[0]["total_loss"]


def test_bbox_lr_trajectory_bit_equal(runs):
    """Our optax schedule evaluated at the update counter reproduces the
    reference's post-step `update_lr(i+1)` sequence exactly — update i
    runs at schedule(i) on both sides."""
    _, _, _, _, _, _, _, final_lr = runs
    sched = _lr_schedule()
    sched_mod = ref_loader._load_file(
        "_ref_lr_sched", f"{ref_loader.REF}/yolox/utils/lr_scheduler.py"
    )
    ref_sched = sched_mod.LRScheduler(
        "yoloxwarmcos", BASIC_LR_PER_IMG * BATCH, ITERS_PER_EPOCH,
        TOTAL_EPOCHS,
        warmup_epochs=WARMUP_EPOCHS, warmup_lr_start=0.0,
        no_aug_epochs=NO_AUG_EPOCHS, min_lr_ratio=MIN_LR_RATIO,
    )
    for i in range(ITERS_PER_EPOCH * TOTAL_EPOCHS):
        assert sched(i) == ref_sched.update_lr(i), i
    # and the lr the reference ended on is the one our next step would use
    assert sched(N_STEPS) == final_lr


def test_bbox_ema_tracks(runs):
    """The EMA state after N steps: torch's ramped in-place filter vs our
    pytree filter.  EMA params inherit the underlying chaos envelope;
    assert against the control run's EMA... the control run shares our
    implementation, so additionally pin the ramp itself: with N=40
    updates the effective decay is still small (d≈0.0198 at step 40), so
    the EMA must sit close to the CURRENT weights, not the init — a
    missing ramp (constant 0.9998) would freeze it at init."""
    (_, _, _, _, final_ours, final_ctrl, ema_model, _) = runs
    sd_ema_ours = variables_to_state_dict({
        "params": final_ours["ema_params"],
        "batch_stats": final_ours["ema_batch_stats"],
    })
    sd_ema_ref = ema_model.ema.state_dict()
    sd_cur_ours = variables_to_state_dict({
        "params": final_ours["params"],
        "batch_stats": final_ours["batch_stats"],
    })
    sd_ema_ctrl = variables_to_state_dict({
        "params": final_ctrl["ema_params"],
        "batch_stats": final_ctrl["ema_batch_stats"],
    })
    devs_cross, devs_env, ramp_gap = [], [], []
    for k, v in sd_ema_ours.items():
        if "num_batches_tracked" in k or k not in sd_ema_ref:
            continue
        a = np.asarray(v)
        b = sd_ema_ref[k].detach().numpy()
        scale = max(np.abs(b).max(), 1e-6)
        devs_cross.append(np.abs(a - b).max() / scale)
        devs_env.append(
            np.abs(a - np.asarray(sd_ema_ctrl[k])).max() / scale
        )
        ramp_gap.append(
            np.abs(a - np.asarray(sd_cur_ours[k])).max() / scale
        )
    devs_cross = np.array(devs_cross)
    devs_env = np.array(devs_env)
    assert np.median(devs_cross) < 10 * max(np.median(devs_env), 1e-5), (
        np.median(devs_cross), np.median(devs_env))
    assert devs_cross.max() < 10 * max(devs_env.max(), 1e-3), (
        devs_cross.max(), devs_env.max())
    # ramp sanity: EMA hugs the live weights early in training
    assert np.median(ramp_gap) < 5e-2, np.median(ramp_gap)
