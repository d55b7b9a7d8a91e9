"""Full 24p training-loss parity vs the reference `Loss_Function.forward`
(polygon SimOTA + circle-GIoU 24-task vector + DWA weighting), fed
identical synthetic decoded outputs.

The reference hardcodes ``device='cuda:0'`` inside `pts_in_poly`
(`yolox_24p/models/losses.py:561,566`); the test monkeypatches the torch
factory functions to strip device kwargs so it runs on CPU unmodified.
"""

import contextlib

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from eop_tpu.losses import DWAState, Loss24PConfig
from eop_tpu.losses.loss_24p import loss_24p
from eop_tpu.models.head import make_grids_and_strides
from eop_tpu.ops.polygon import ANGLES

import ref_loader

HW = [(16, 16), (8, 8), (4, 4)]
STRIDES = [8, 16, 32]
C = 8
A = sum(h * w for h, w in HW)


@contextlib.contextmanager
def _cpu_torch_factories():
    """Strip `device=` kwargs from the factory fns the reference uses."""
    orig = {}

    def wrap(name):
        fn = getattr(torch, name)
        orig[name] = fn

        def patched(*args, **kwargs):
            kwargs.pop("device", None)
            return fn(*args, **kwargs)

        setattr(torch, name, patched)

    for name in ("zeros", "arange", "tensor", "full"):
        wrap(name)
    try:
        yield
    finally:
        for name, fn in orig.items():
            setattr(torch, name, fn)


def _synthetic_case(seed: int):
    rng = np.random.RandomState(seed)
    B = 2
    outputs = np.zeros((B, A, 27 + C), np.float32)
    outputs[..., 0:2] = rng.uniform(0, 128, (B, A, 2))     # centers
    outputs[..., 2:26] = rng.uniform(4, 60, (B, A, 24))    # radii
    outputs[..., 26:] = rng.randn(B, A, 1 + C)             # logits
    origin = rng.randn(B, A, 26).astype(np.float32)

    labels = np.zeros((B, 50, 51), np.float32)
    for b in range(B):
        for g in range(rng.randint(2, 6)):
            cx, cy = rng.uniform(25, 100, 2)
            r = rng.uniform(8, 25, 24)
            labels[b, g, 0] = rng.randint(0, C)
            labels[b, g, 1:3] = (cx, cy)
            labels[b, g, 3::2] = cx + r * np.cos(ANGLES)
            labels[b, g, 4::2] = cy + r * np.sin(ANGLES)
    return outputs, origin, labels


def _ref_losses(losses_mod, outputs, origin, labels, use_l1):
    lf = losses_mod.Loss_Function(C)
    lf.use_l1 = use_l1
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
    with _cpu_torch_factories():
        with torch.no_grad():
            return lf.forward(
                (x_shifts, y_shifts, expanded_strides,
                 torch.from_numpy(outputs), origin_preds),
                torch.from_numpy(labels),
            )


@pytest.mark.parametrize("use_l1", [False, True])
def test_full_24p_loss_parity(use_l1):
    losses_mod = ref_loader.ref_24p_losses()
    for seed in (0, 1, 2):
        outputs, origin, labels = _synthetic_case(seed)
        (t_loss, t_iou_w, t_obj, t_cls, t_l1, t_fg, _draw) = _ref_losses(
            losses_mod, outputs, origin, labels, use_l1
        )

        grids, strides = make_grids_and_strides(HW, STRIDES)
        total, aux, new_dwa = loss_24p(
            jnp.asarray(outputs), jnp.asarray(origin),
            jnp.asarray(labels), grids, strides,
            DWAState.init(),
            # the reference treats its pairwise GIoU *loss* as an IoU;
            # parity mode replicates that for the comparison
            Loss24PConfig(num_classes=C, use_l1=use_l1,
                          reference_parity=True),
        )
        np.testing.assert_allclose(
            float(t_fg), float(aux.num_fg_per_gt), atol=1e-6,
            err_msg=f"seed {seed} num_fg/gt",
        )
        np.testing.assert_allclose(
            np.asarray(t_iou_w), np.asarray(aux.loss_iou), rtol=1e-4,
            atol=1e-4, err_msg=f"seed {seed} weighted per-ray iou",
        )
        np.testing.assert_allclose(
            float(t_obj), float(aux.loss_obj), rtol=1e-4,
            err_msg=f"seed {seed} obj",
        )
        np.testing.assert_allclose(
            float(t_cls), float(aux.loss_cls), rtol=1e-4,
            err_msg=f"seed {seed} cls",
        )
        if use_l1:
            np.testing.assert_allclose(
                float(t_l1), float(aux.loss_l1), rtol=1e-4,
                err_msg=f"seed {seed} l1 (origin-distance quirk)",
            )
        np.testing.assert_allclose(
            float(t_loss), float(total), rtol=1e-4,
            err_msg=f"seed {seed} total",
        )
