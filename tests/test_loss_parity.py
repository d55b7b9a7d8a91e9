"""Full training-loss parity vs the reference `YOLOXHead.get_losses`
(SimOTA + IoU/obj/cls/L1 terms + normalization), fed identical synthetic
decoded outputs so the comparison is exact up to float associativity
(bypassing this image's reduced-precision XLA-CPU convolutions)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from eop_tpu.losses import YoloxLossConfig, yolox_losses
from eop_tpu.models.head import make_grids_and_strides

import ref_loader

HW = [(16, 16), (8, 8), (4, 4)]
STRIDES = [8, 16, 32]
C = 8


def _make_head(use_l1: bool):
    head_mod = ref_loader.ref_module("yolo_head")
    th = head_mod.YOLOXHead(C, 0.25)
    th.use_l1 = use_l1
    return th


def _synthetic_case(seed: int):
    rng = np.random.RandomState(seed)
    B = 2
    A = sum(h * w for h, w in HW)
    outputs = np.zeros((B, A, 5 + C), np.float32)
    outputs[..., 0:2] = rng.uniform(0, 128, (B, A, 2))     # decoded cx, cy
    outputs[..., 2:4] = rng.uniform(4, 80, (B, A, 2))      # decoded w, h
    outputs[..., 4:] = rng.randn(B, A, 1 + C)              # logits
    origin = rng.randn(B, A, 4).astype(np.float32)

    labels = np.zeros((B, 20, 5), np.float32)
    for b in range(B):
        for g in range(rng.randint(2, 7)):
            w, h = rng.uniform(15, 60, 2)
            cx = rng.uniform(w / 2, 128 - w / 2)
            cy = rng.uniform(h / 2, 128 - h / 2)
            labels[b, g] = (rng.randint(0, C), cx, cy, w, h)
    return outputs, origin, labels


def _ref_losses(th, outputs, origin, labels):
    x_shifts, y_shifts, expanded_strides, origin_preds = [], [], [], []
    off = 0
    for (h, w), s in zip(HW, STRIDES):
        yv, xv = torch.meshgrid([torch.arange(h), torch.arange(w)])
        grid = torch.stack((xv, yv), 2).view(1, -1, 2).float()
        x_shifts.append(grid[:, :, 0])
        y_shifts.append(grid[:, :, 1])
        expanded_strides.append(torch.full((1, h * w), float(s)))
        origin_preds.append(torch.from_numpy(origin[:, off: off + h * w]))
        off += h * w
    return th.get_losses(
        None, x_shifts, y_shifts, expanded_strides,
        torch.from_numpy(labels), torch.from_numpy(outputs),
        origin_preds, torch.float32,
    )


@pytest.mark.parametrize("use_l1", [False, True])
def test_full_bbox_loss_parity(use_l1):
    for seed in (0, 1, 2, 3):
        outputs, origin, labels = _synthetic_case(seed)
        th = _make_head(use_l1)
        with torch.no_grad():
            t_loss, t_iou, t_obj, t_cls, t_l1, t_fg = _ref_losses(
                th, outputs, origin, labels
            )

        grids, strides = make_grids_and_strides(HW, STRIDES)
        total, aux = yolox_losses(
            jnp.asarray(outputs), jnp.asarray(origin),
            jnp.asarray(labels), grids, strides,
            YoloxLossConfig(num_classes=C, use_l1=use_l1),
        )
        pairs = [
            ("num_fg/gt", float(t_fg), float(aux.num_fg_per_gt), 1e-6),
            ("iou", float(t_iou), float(aux.loss_iou), 1e-4),
            ("obj", float(t_obj), float(aux.loss_obj), 1e-4),
            ("cls", float(t_cls), float(aux.loss_cls), 1e-4),
            ("l1", float(t_l1), float(aux.loss_l1), 1e-4),
            ("total", float(t_loss), float(total), 1e-4),
        ]
        for name, a, b, tol in pairs:
            np.testing.assert_allclose(
                a, b, rtol=tol, atol=tol,
                err_msg=f"seed {seed} use_l1={use_l1} {name}: {a} vs {b}",
            )
