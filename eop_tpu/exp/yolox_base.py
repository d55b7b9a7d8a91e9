"""YOLOX-family experiment defaults + factories.

Parity target: `Exp` (`/root/reference/yolox/exp/yolox_base.py:15-285`) —
every hyperparameter default, the backbone-swappable model factory, the
mosaic train loader, multiscale `random_resize`/`preprocess`, the
wd-grouped optimizer, yoloxwarmcos scheduling, and the eval loader /
COCO evaluator factories.
"""

from __future__ import annotations

import os
import random
from typing import Optional, Tuple

import numpy as np

from .base_exp import BaseExp


def resolve_packed_early(flag, width: float, depthwise: bool = False):
    """Resolve the ``packed_early`` exp setting to a model flag.

    ``"auto"`` → ``"train"`` (packed layout for training calls only) when
    the early backbone is narrow enough to benefit on the MXU (width ≤
    0.75 keeps dark2 below 128 channels) and the blocks are plain convs;
    otherwise off.  String booleans are normalized (CLI ``merge`` cannot
    coerce them because the default is the string ``"auto"`` —
    ``packed_early False`` on the command line arrives as ``"False"``,
    which is truthy); any other value passes through.
    """
    if isinstance(flag, str):
        low = flag.lower()
        if low in ("false", "0", "off", "none"):
            flag = False
        elif low in ("true", "1", "on"):
            flag = True
    if flag == "auto":
        return "train" if (width <= 0.75 and not depthwise) else False
    return flag


class Exp(BaseExp):
    # Hyperparameter defaults, grouped as in the reference's Exp
    # (`yolox/exp/yolox_base.py:19-71`).  Values land as instance
    # attributes so ``merge()`` / repr / subclass overrides see them.
    _MODEL = dict(
        num_classes=80, depth=1.00, width=1.00,
        act="silu", backbone_type="darknet", depthwise=False,
    )
    _DATA = dict(
        data_num_workers=4,
        input_size=(640, 640),      # (height, width)
        multiscale_range=5,         # ±range×32 px
        random_size=None,           # Optional[Tuple[int, int]]
        data_dir=None,
        train_ann="instances_train2017.json",
        val_ann="instances_val2017.json",
        test_ann="instances_test2017.json",
    )
    _TRANSFORM = dict(
        mosaic_prob=1.0, mixup_prob=1.0, hsv_prob=1.0, flip_prob=0.5,
        degrees=10.0, translate=0.1, shear=2.0,
        mosaic_scale=(0.1, 2), mixup_scale=(0.5, 1.5), enable_mixup=True,
    )
    _TRAIN = dict(
        warmup_epochs=5, max_epoch=300,
        warmup_lr=0, basic_lr_per_img=0.01 / 64.0,
        scheduler="yoloxwarmcos", no_aug_epochs=15, min_lr_ratio=0.05,
        ema=True, ema_decay=0.9998,
        weight_decay=5e-4, momentum=0.9,
        print_interval=10, eval_interval=10,
        # epoch-checkpoint cadence (1 = every epoch, the reference's
        # behavior).  At large widths the per-epoch save is a full
        # state_to_host fetch (~650 MB for width 1.0 over a device
        # tunnel) — raise this for tunnel-attached drives; the final
        # epoch and the pre-no-aug checkpoint always save regardless.
        ckpt_interval=1,
    )
    _TEST = dict(test_size=(640, 640), test_conf=0.01, nmsthre=0.65)
    _TPU = dict(
        # compute dtype for the conv trunk ("bfloat16" for TPU speed)
        compute_dtype="float32",
        # gradient checkpointing of the conv trunk (memory for ~15% time)
        remat=False,
        # NMS fixpoint mode for eval/infer/serving handles: "exact"
        # iterates the suppression recurrence to stationarity (greedy-
        # exact for any chain depth, and measured FASTER than the fixed
        # budget — tools/bench_postprocess.py); "budget" or an int pins a
        # fixed iteration count for a hard static schedule
        nms_mode="exact",
        # space-to-depth packed layout for the sub-128-channel early
        # backbone (ops/packed.py) — an exact re-expression that keeps the
        # MXU's 128 contraction lanes full.  "auto" resolves to "train"
        # (packed for training steps, fine for inference — measured the
        # win/loss split on v5e, BASELINE.md round 3) when the model is
        # narrow enough to benefit (width <= 0.75, not depthwise), else
        # off.  Parameters and checkpoints are layout-independent.
        packed_early="auto",
        # inference programs additionally pick the packed layout when the
        # per-device batch is at most this (measured crossover on v5e
        # @640: packed wins 1.18-1.99x at B<=64, loses ~0.90x at B>=128 —
        # BASELINE.md round 3); 0 disables packed inference entirely
        packed_infer_max_batch=64,
    )

    def __init__(self):
        super().__init__()
        for group in (self._MODEL, self._DATA, self._TRANSFORM,
                      self._TRAIN, self._TEST, self._TPU):
            self.__dict__.update(group)
        from .build import config_name

        self.exp_name = config_name(__file__)

    # ------------------------------------------------------------------

    def get_model(self, backbone_type: Optional[str] = None):
        """Flax model definition (ref `get_model:73-90`; BN eps/momentum are
        baked into the blocks, prior-prob bias init into the head)."""
        import jax.numpy as jnp

        from ..models import YOLOX

        dtype = getattr(jnp, self.compute_dtype)
        if getattr(self, "model", None) is None:
            self.model = YOLOX(
                backbone_type=backbone_type or self.backbone_type,
                depth=self.depth,
                width=self.width,
                num_classes=self.num_classes,
                act=self.act,
                depthwise=self.depthwise,
                dtype=dtype,
                remat=self.remat,
                packed_early=resolve_packed_early(
                    getattr(self, "packed_early", False),
                    self.width, self.depthwise,
                ),
            )
        return self.model

    def get_data_loader(self, batch_size, is_distributed, no_aug=False,
                        cache_img=False, rank=0, world_size=1, seed=None):
        """Mosaic train loader (ref `get_data_loader:92-164`)."""
        from ..data.coco_dataset import COCODataset

        dataset = COCODataset(
            data_dir=self.data_dir,
            json_file=self.train_ann,
            img_size=self.input_size,
            preproc=self.build_train_transform(max_labels=50),
            cache=cache_img,
        )
        return self.wrap_train_dataset(
            dataset, batch_size, is_distributed=is_distributed,
            no_aug=no_aug, rank=rank, world_size=world_size, seed=seed,
        )

    def build_train_transform(self, max_labels: int):
        from ..data.augment import TrainTransform

        return TrainTransform(
            max_labels=max_labels, flip_prob=self.flip_prob,
            hsv_prob=self.hsv_prob,
        )

    def wrap_train_dataset(self, dataset, batch_size, is_distributed=False,
                           no_aug=False, rank=0, world_size=1, seed=None):
        """Shared tail of every train-loader factory: Mosaic/MixUp wrap +
        infinite rank-strided sampling + worker pool.  Dataset-specific
        exps (e.g. the VOC config) build their dataset and delegate here
        instead of duplicating this wiring like the reference's VOC exp
        does (`exps/example/yolox_voc/yolox_voc_s.py:24-86`)."""
        from ..data.dataloading import DataLoader, worker_init_reset_seed
        from ..data.mosaic import MosaicDetection
        from ..data.samplers import InfiniteSampler, YoloBatchSampler

        dataset = MosaicDetection(
            dataset,
            mosaic=not no_aug,
            img_size=self.input_size,
            preproc=self.build_train_transform(max_labels=120),
            degrees=self.degrees,
            translate=self.translate,
            mosaic_scale=self.mosaic_scale,
            mixup_scale=self.mixup_scale,
            shear=self.shear,
            enable_mixup=self.enable_mixup,
            mosaic_prob=self.mosaic_prob,
            mixup_prob=self.mixup_prob,
            seed=seed,
        )
        self.dataset = dataset

        if is_distributed:
            batch_size = batch_size // world_size
        sampler = InfiniteSampler(
            len(dataset), seed=self.seed if self.seed else 0,
            rank=rank, world_size=world_size,
        )
        batch_sampler = YoloBatchSampler(
            sampler, batch_size, drop_last=False,
            mosaic=not no_aug,
            input_dimension=self.input_size,
        )
        return DataLoader(
            dataset,
            batch_sampler=batch_sampler,
            num_workers=self.data_num_workers,
            worker_init_fn=worker_init_reset_seed,
        )

    def random_resize(self, step: int = 0):
        """Draw a multiscale size (ref `random_resize:166-185`).

        Deterministic in ``(exp.seed, step)`` so every host draws the SAME
        size at the same training step — the seed-synchronized equivalent
        of the reference's rank-0 `dist.broadcast` of the drawn tensor
        (global `random.randint` would desynchronize hosts and stitch
        differently-sized local batches into one global array)."""
        if self.random_size is None:
            min_size = int(self.input_size[0] / 32) - self.multiscale_range
            max_size = int(self.input_size[0] / 32) + self.multiscale_range
            self.random_size = (min_size, max_size)
        rng = random.Random(((self.seed or 0) * 1_000_003) ^ step)
        size = rng.randint(*self.random_size)
        # the reference preserves the exp's aspect ratio (size_factor =
        # W/H, `random_resize:169-177`) — a square draw would aspect-
        # distort every multiscale batch of a non-square input_size
        size_factor = self.input_size[1] / self.input_size[0]
        return (int(32 * size), 32 * int(size * size_factor))

    def preprocess(self, inputs, targets, tsize):
        """Multiscale on-device resize + target rescale
        (ref `preprocess:187-196`); jit-compatible per target size."""
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
            targets = jnp.concatenate(
                [
                    targets[..., 0:1],
                    targets[..., 1:2] * scale_x,
                    targets[..., 2:3] * scale_y,
                    targets[..., 3:4] * scale_x,
                    targets[..., 4:5] * scale_y,
                ],
                axis=-1,
            )
        return inputs, targets

    def get_optimizer(self, batch_size: int, iters_per_epoch: int = 1):
        """Scheduled SGD with the reference's wd groups
        (ref `get_optimizer:198-224` + per-iter scheduler).

        optax calls the schedule with a traced step count, so the python
        scheduler is tabulated once over the full run and looked up on
        device.
        """
        from ..train.lr_schedule import tabulate_schedule
        from ..train.optimizer import build_sgd

        lr = self.basic_lr_per_img * batch_size
        sched = self.get_lr_scheduler(lr, iters_per_epoch)
        schedule = tabulate_schedule(
            sched, iters_per_epoch * self.max_epoch
        )
        return build_sgd(
            schedule,
            momentum=self.momentum,
            weight_decay=self.weight_decay,
            nesterov=True,
        )

    def get_lr_scheduler(self, lr: float, iters_per_epoch: int):
        from ..train.lr_schedule import LRScheduler

        return LRScheduler(
            self.scheduler,
            lr,
            iters_per_epoch,
            self.max_epoch,
            warmup_epochs=self.warmup_epochs,
            warmup_lr_start=self.warmup_lr,
            no_aug_epochs=self.no_aug_epochs,
            min_lr_ratio=self.min_lr_ratio,
        )

    def get_eval_loader(self, batch_size, is_distributed=False,
                        testdev=False, legacy=False):
        """(ref `get_eval_loader:241-270`)."""
        from ..data.augment import ValTransform
        from ..data.coco_dataset import COCODataset
        from ..data.dataloading import DataLoader

        valdataset = COCODataset(
            data_dir=self.data_dir,
            json_file=self.val_ann if not testdev else self.test_ann,
            name="val2017" if not testdev else "test2017",
            img_size=self.test_size,
            preproc=ValTransform(legacy=legacy),
        )
        sampler = None
        if is_distributed:
            # per-host slice of the val set (the reference's eval-side
            # batch split, `get_eval_loader:241-270`); the evaluator
            # all_gathers the per-host results before COCOeval
            from ..parallel import dist

            sampler = list(range(
                dist.get_rank(), len(valdataset), dist.get_world_size()
            ))
        return DataLoader(
            valdataset, batch_size=batch_size, shuffle=False,
            sampler=sampler,
            num_workers=self.data_num_workers,
        )

    def get_evaluator(self, batch_size, is_distributed=False, testdev=False,
                      legacy=False):
        """(ref `get_evaluator:272-285`)."""
        from ..eval.coco_evaluator import COCOEvaluator

        return COCOEvaluator(
            dataloader=self.get_eval_loader(
                batch_size, is_distributed, testdev, legacy
            ),
            img_size=self.test_size,
            confthre=self.test_conf,
            nmsthre=self.nmsthre,
            num_classes=self.num_classes,
            testdev=testdev,
        )

    def get_infer_fn(self, model, variables):
        """Jitted forward + decode + NMS handle for evaluators."""
        import jax

        return jax.jit(self._infer_body(model, variables))

    def _infer_body(self, model, variables, quant_scales=None,
                    quant_min_channels=64, batch_divisor=1):
        """Unjitted forward + decode + NMS body (shared by the jitted
        single-device handle, the sharded multi-chip one, and the int8
        PTQ handle when ``quant_scales`` is given).  ``batch_divisor`` is
        the device count when the body is traced with global (sharded)
        shapes — the early-backbone layout decision is per-device."""
        import jax

        def infer(imgs):
            # fused postprocess: candidate selection on the raw bf16 head
            # maps, grid decode only on the candidates (bitwise-equal to
            # decode-everything-first; ~2x cheaper postprocess on v5e)
            from ..eval.postprocess import postprocess_bbox_heads

            # accept uint8 inputs: transfer 4x less and cast on device
            imgs = imgs.astype(jax.numpy.float32)
            head_outs, _ = self._forward(
                model, variables, imgs, quant_scales, quant_min_channels,
                batch_divisor=batch_divisor,
            )
            return postprocess_bbox_heads(
                head_outs,
                num_classes=self.num_classes,
                conf_thre=self.test_conf,
                nms_thre=self.nmsthre,
                nms_fixpoint_iters=self._nms_iters(),
            )

        return infer

    def get_sharded_infer_fn(self, model, variables, mesh,
                             quant_scales=None, quant_min_channels=64):
        """Multi-chip serving/eval: the same inference program jitted over
        a device mesh — batch sharded on the data axis, detections sharded
        out, params replicated (capability the reference lacks: its
        demo/eval paths are single-GPU).  ``quant_scales`` runs the int8
        PTQ path on every chip."""
        from ..parallel.mesh import DATA_AXIS, shard_inference

        # per-device batch = global / data-axis extent (a space axis, if
        # any, splits H instead — see make_mesh(spatial=...))
        return shard_inference(
            self._infer_body(model, variables, quant_scales,
                             quant_min_channels,
                             batch_divisor=mesh.shape[DATA_AXIS]),
            mesh,
        )

    def get_decode_fn(self, model, variables):
        """Jitted forward + decode WITHOUT NMS — used by the evaluator to
        split forward vs NMS time like the reference
        (`yolox/evaluators/coco_evaluator.py:161-189`).  Returns a scalar
        checksum so the host fetch that synchronizes the timing is tiny."""
        import jax

        @jax.jit
        def decode_only(imgs):
            from ..models import inference_outputs

            imgs = imgs.astype(jax.numpy.float32)
            # same layout decision as the timed infer program — otherwise
            # the forward-vs-NMS split misattributes the layout delta
            head_outs, _ = self._forward(model, variables, imgs)
            decoded = inference_outputs(head_outs,
                                        out_dtype=jax.numpy.float32)
            return decoded.sum()

        return decode_only

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
            from ..eval.postprocess import postprocess_bbox_heads

            return postprocess_bbox_heads(
                head_outs,
                num_classes=self.num_classes,
                conf_thre=self.test_conf,
                nms_thre=self.nmsthre,
                nms_fixpoint_iters=self._nms_iters(),
            )

        return serve

    def eval(self, model, variables, evaluator, is_distributed=False,
             time_split=False, quant_scales=None, quant_min_channels=64):
        """``time_split`` enables the forward-vs-NMS timing estimate: it
        compiles a second (decode-only) program and runs a few extra
        forwards, so it stays off in training loops and on for the
        diagnostic CLI (tools/eval.py).

        ``quant_scales`` (from ``quantize_for_inference``, pass its
        deploy variables too) evaluates the int8 PTQ path instead; the
        timing split is skipped there — the decode-only probe runs fp
        and would misattribute the difference to NMS.
        """
        import jax

        infer_fn = jax.jit(self._infer_body(
            model, variables, quant_scales, quant_min_channels
        ))
        return evaluator.evaluate(
            infer_fn, is_distributed,
            decode_fn=(
                self.get_decode_fn(model, variables)
                if time_split and not quant_scales else None
            ),
        )


