"""24-point experiment defaults + factories.

Parity target: `Exp` (`/root/reference/yolox_24p/exp/yolox_base.py:14-214`)
— the 24p family: plain (non-mosaic) loader over the txt-label dataset,
26-channel head model, plain nesterov SGD, interleaved-coordinate
multiscale preprocess; evaluator pieces the reference commented out are
implemented here (AP via the bbox hull of the 24 points).
"""

from __future__ import annotations

import os
import random
from typing import Optional


from .base_exp import BaseExp
from .yolox_base import resolve_packed_early


class Exp24P(BaseExp):
    def __init__(self):
        super().__init__()

        # ---------------- model config ---------------- #
        self.num_classes = 80
        self.depth = 1.00
        self.width = 1.00
        self.act = "silu"

        # ---------------- dataloader config ---------------- #
        self.data_num_workers = 8
        self.input_size = (640, 640)
        self.multiscale_range = 5
        self.random_size: Optional[tuple] = None
        self.data_dir = None       # images directory
        self.label_dir = None      # 24p txt labels directory

        # --------------  training config --------------------- #
        self.warmup_epochs = 5
        self.max_epoch = 2000
        self.warmup_lr = 0
        self.basic_lr_per_img = 0.01 / 64.0
        self.scheduler = "yoloxwarmcos"
        self.no_aug_epochs = 100
        self.min_lr_ratio = 0.05
        self.ema = False
        self.ema_decay = 0.9998
        self.L1_epoch = 100        # enable L1 loss for the last N epochs
        # epoch-checkpoint cadence (1 = reference's every-epoch saves);
        # see yolox_base._TRAIN["ckpt_interval"]
        self.ckpt_interval = 1

        self.weight_decay = 0.0    # 24p trainer uses plain SGD (ref :120-124)
        self.momentum = 0.9
        self.print_interval = 10
        self.eval_interval = 10
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(
            "."
        )[0]

        # -----------------  testing config ------------------ #
        self.test_size = (640, 640)
        self.test_conf = 0.01
        self.nmsthre = 0.3
        self.reference_parity = False  # replicate θ·cosθ NMS + GIoU-as-IoU

        self.compute_dtype = "float32"
        # gradient checkpointing of the conv trunk (memory for ~15% time)
        self.remat = False
        # space-to-depth packed layout for the sub-128-channel early
        # backbone (ops/packed.py): False | True | "train" | "auto".
        # "auto" resolves to "train" — packed for training steps (1.33x
        # the 24p-s step on v5e), fine for inference (measured loss at
        # inference batch sizes) — when width <= 0.75 and not depthwise.
        # Parameters and checkpoints are layout-independent.
        self.packed_early = "auto"
        # inference programs pick the packed layout when the per-device
        # batch is at most this (v5e measured crossover, BASELINE.md r3)
        self.packed_infer_max_batch = 64
        # "exact" = stationarity-checked NMS fixpoint in eval/infer handles
        # (greedy-exact for any suppression-chain depth); serving keeps the
        # fixed budget
        self.nms_mode = "exact"

    # ------------------------------------------------------------------

    def get_model(self):
        """26-channel-reg YOLOX (ref `get_model:55-72`)."""
        import jax.numpy as jnp

        from ..models import YOLOX

        dtype = getattr(jnp, self.compute_dtype)
        if getattr(self, "model", None) is None:
            self.model = YOLOX(
                backbone_type="darknet",
                depth=self.depth,
                width=self.width,
                num_classes=self.num_classes,
                act=self.act,
                reg_dim=26,
                dtype=dtype,
                remat=self.remat,
                packed_early=resolve_packed_early(
                    getattr(self, "packed_early", False), self.width,
                ),
            )
        return self.model

    def get_data_loader(self, batch_size, is_distributed=False,
                        rank=0, world_size=1):
        """Plain loader over COCO24PDataset (ref `get_data_loader:75-91`,
        upgraded with the infinite rank-strided sampler for DP)."""
        from ..data.coco24p import COCO24PDataset, TrainTransform24P
        from ..data.dataloading import DataLoader, worker_init_reset_seed
        from ..data.samplers import InfiniteSampler, YoloBatchSampler

        dataset = COCO24PDataset(
            data_dir=self.data_dir,
            label_dir=self.label_dir,
            img_size=self.input_size,
            preproc=TrainTransform24P(max_labels=50),
        )
        self.dataset = dataset
        if is_distributed:
            batch_size = batch_size // world_size
        sampler = InfiniteSampler(
            len(dataset), seed=self.seed if self.seed else 0,
            rank=rank, world_size=world_size,
        )
        batch_sampler = YoloBatchSampler(
            sampler, batch_size, drop_last=False, mosaic=False,
        )
        return DataLoader(
            dataset,
            batch_sampler=batch_sampler,
            num_workers=self.data_num_workers,
            worker_init_fn=worker_init_reset_seed,
        )

    def preprocess(self, inputs, targets, tsize):
        """Multiscale resize scaling the interleaved 24p coords
        (ref `preprocess:109-118`)."""
        import jax
        import jax.numpy as jnp

        scale_y = tsize[0] / self.input_size[0]
        scale_x = tsize[1] / self.input_size[1]
        if scale_x != 1 or scale_y != 1:
            inputs = jax.image.resize(
                inputs,
                (inputs.shape[0], tsize[0], tsize[1], inputs.shape[3]),
                method="bilinear",
            )
            cls = targets[..., 0:1]
            xs = targets[..., 1::2] * scale_x
            ys = targets[..., 2::2] * scale_y
            out = jnp.zeros_like(targets)
            out = out.at[..., 0:1].set(cls)
            out = out.at[..., 1::2].set(xs)
            out = out.at[..., 2::2].set(ys)
            targets = out
        return inputs, targets

    def get_optimizer(self, batch_size: int,
                      iters_per_epoch: Optional[int] = None,
                      lr: Optional[float] = None):
        """Plain nesterov SGD at a fixed lr — the reference's 24p choice
        (`get_optimizer:120-124`).  Passing ``iters_per_epoch`` tabulates
        the ``self.scheduler`` schedule per step (an upgrade the minimal
        reference trainer lacks)."""
        from ..train.optimizer import build_sgd

        if lr is None:
            lr = self.basic_lr_per_img * batch_size
        schedule = None
        if iters_per_epoch is not None:
            from ..train.lr_schedule import tabulate_schedule

            schedule = tabulate_schedule(
                self.get_lr_scheduler(lr, iters_per_epoch),
                iters_per_epoch * self.max_epoch,
            )
        return build_sgd(
            schedule if schedule is not None else lr,
            momentum=self.momentum,
            weight_decay=self.weight_decay, nesterov=True,
        )

    def get_lr_scheduler(self, lr: float, iters_per_epoch: int):
        from ..train.lr_schedule import LRScheduler

        return LRScheduler(
            self.scheduler, lr, iters_per_epoch, self.max_epoch,
            warmup_epochs=self.warmup_epochs,
            warmup_lr_start=self.warmup_lr,
            no_aug_epochs=self.no_aug_epochs,
            min_lr_ratio=self.min_lr_ratio,
        )

    def random_resize(self, step: int = 0):
        """Deterministic in (exp.seed, step) so every host draws the same
        size at the same training step (see Exp.random_resize)."""
        if self.random_size is None:
            min_size = int(self.input_size[0] / 32) - self.multiscale_range
            max_size = int(self.input_size[0] / 32) + self.multiscale_range
            self.random_size = (min_size, max_size)
        rng = random.Random(((self.seed or 0) * 1_000_003) ^ step)
        size = rng.randint(*self.random_size)
        return (int(32 * size), int(32 * size))

    def get_eval_loader(self, batch_size):
        from ..data.coco24p import COCO24PDataset, TrainTransform24P
        from ..data.dataloading import DataLoader

        dataset = COCO24PDataset(
            data_dir=self.data_dir,
            label_dir=self.label_dir,
            img_size=self.test_size,
            preproc=TrainTransform24P(max_labels=50),
        )
        return DataLoader(dataset, batch_size=batch_size, shuffle=False,
                          num_workers=self.data_num_workers)

    def get_evaluator(self, batch_size, is_distributed=False):
        """COCO-style AP over the polygon enclosing boxes — the evaluator
        the reference left commented out (`yolox_24p/exp/base_exp.py:50-57`),
        implemented (see eval/evaluator_24p.py)."""
        from ..eval.evaluator_24p import Evaluator24P

        return Evaluator24P(
            dataloader=self.get_eval_loader(batch_size),
            img_size=self.test_size,
            confthre=self.test_conf,
            nmsthre=self.nmsthre,
            num_classes=self.num_classes,
        )


    def get_serving_fn(self, model, variables, src_hw, quant_scales=None,
                       quant_min_channels=64):
        """Fully-fused serving step: on-device letterbox (uint8 in) +
        forward + decode + NMS in ONE jitted program — zero host-side
        preprocessing (the north-star deployment path).

        ``src_hw``: static (H, W) of the raw input batch.
        ``quant_scales``: activation scales from
        ``quantize_for_inference`` — switches eligible convs to the
        MXU's int8 path (pass the deploy variables it returned too).
        """
        import jax

        from ..data.transforms import letterbox_batch_device

        @jax.jit
        def serve(raw_uint8):
            imgs = raw_uint8.astype(jax.numpy.float32)
            imgs, _ = letterbox_batch_device(imgs, src_hw, self.test_size)
            head_outs, _ = self._forward(
                model, variables, imgs, quant_scales, quant_min_channels
            )
            from ..eval.postprocess import postprocess_24p_heads

            return postprocess_24p_heads(
                head_outs,
                num_classes=self.num_classes,
                conf_thre=self.test_conf,
                nms_thre=self.nmsthre,
                reference_parity=self.reference_parity,
                nms_fixpoint_iters=self._nms_iters(),
            )

        return serve

    def get_data_input(self, img_path: str):
        """Letterbox a single image for inference
        (ref `load_eval/yolox_24p_eval.py:21-38`)."""
        import cv2

        from ..data.augment import preproc

        img = cv2.imread(img_path)
        assert img is not None, f"image {img_path} not found"
        padded, r = preproc(img, self.test_size)
        return padded[None], r, img

    def get_infer_fn(self, model, variables):
        """Jitted forward + decode + polygon NMS handle."""
        import jax

        return jax.jit(self._infer_body(model, variables))

    def eval(self, model, variables, evaluator, is_distributed=False,
             time_split=False, quant_scales=None, quant_min_channels=64):
        """Evaluate like the bbox base (`yolox_base.py::eval`) so
        `tools/eval.py` drives both families identically; ``time_split``
        has no 24p decode-only probe and is accepted-and-ignored.
        ``quant_scales`` runs the int8 PTQ path (pass the deploy
        variables from ``quantize_for_inference``)."""
        import jax

        del time_split  # no forward-vs-NMS split probe for this family
        infer_fn = jax.jit(self._infer_body(
            model, variables, quant_scales, quant_min_channels
        ))
        return evaluator.evaluate(infer_fn, is_distributed)

    def _infer_body(self, model, variables, quant_scales=None,
                    quant_min_channels=64, batch_divisor=1):
        """Unjitted forward + decode + polygon-NMS body (shared by the
        jitted single-device handle, the sharded multi-chip one, and the
        int8 PTQ handle when ``quant_scales`` is given).  ``batch_divisor``
        is the device count when the body is traced with global (sharded)
        shapes — the early-backbone layout decision is per-device."""
        import jax

        def infer(imgs):
            # fused postprocess: candidate selection on the raw bf16 head
            # maps, grid decode only on the candidates (bitwise-equal to
            # decode-everything-first; ~2x cheaper postprocess on v5e)
            from ..eval.postprocess import postprocess_24p_heads

            # accept uint8 inputs: transfer 4x less and cast on device
            imgs = imgs.astype(jax.numpy.float32)
            head_outs, _ = self._forward(
                model, variables, imgs, quant_scales, quant_min_channels,
                batch_divisor=batch_divisor,
            )
            return postprocess_24p_heads(
                head_outs,
                num_classes=self.num_classes,
                conf_thre=self.test_conf,
                nms_thre=self.nmsthre,
                reference_parity=self.reference_parity,
                nms_fixpoint_iters=self._nms_iters(),
            )

        return infer

    def get_sharded_infer_fn(self, model, variables, mesh,
                             quant_scales=None, quant_min_channels=64):
        """Multi-chip serving/eval: batch sharded on the data axis,
        detections sharded out, params replicated.  ``quant_scales``
        runs the int8 PTQ path on every chip."""
        from ..parallel.mesh import DATA_AXIS, shard_inference

        # per-device batch = global / data-axis extent (a space axis, if
        # any, splits H instead — see make_mesh(spatial=...))
        return shard_inference(
            self._infer_body(model, variables, quant_scales,
                             quant_min_channels,
                             batch_divisor=mesh.shape[DATA_AXIS]),
            mesh,
        )
