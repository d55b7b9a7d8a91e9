"""Full-featured epoch/iter trainer (bbox family).

Parity target: `Trainer` (`/root/reference/yolox/core/trainer.py:33-329`) —
the reference's *latent* DDP trainer, implemented here as a first-class,
actually-wired component: per-iter scheduled LR, EMA, MeterBuffer logging
with ETA, multiscale every 10 iters, the no-aug switch (close mosaic +
enable L1 + eval every epoch), resume/fine-tune, eval with EMA weights and
best-checkpoint tracking.

TPU re-design notes:
* the iteration body is one jitted step (forward+SimOTA+loss+grad+SGD+EMA);
  two step programs exist (L1 off/on) because ``use_l1`` is structural;
* data parallelism is the mesh sharding from `eop_tpu.parallel` — no
  launcher, no DDP wrapper, no GradScaler (bf16 needs no loss scaling);
* multiscale resizing happens on device inside the step's shape bucket —
  each of the 11 sizes compiles once and is cached;
* BN stats are globally synced by GSPMD automatically (see parallel/mesh).
"""

from __future__ import annotations

import datetime
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import YoloxLossConfig
from ..parallel.mesh import (
    MODEL_AXIS,
    shard_batch,
    make_mesh,
    place_state,
    shard_train_step,
)
from ..utils.logger import logger, setup_logger
from ..utils.metric import (
    CandidateDropMonitor,
    MeterBuffer,
    device_mem_usage,
)
from ..utils.model_utils import get_model_info
from .checkpoint import (
    load_checkpoint,
    load_ckpt_partial,
    save_checkpoint,
    state_to_host,
)
from .steps import TrainState, create_train_state, make_train_step_bbox



from ..utils.setup_env import enable_compile_cache

class Trainer:
    def __init__(self, exp, args):
        enable_compile_cache()
        self.exp = exp
        self.args = args

        self.max_epoch = exp.max_epoch
        self.is_distributed = jax.device_count() > 1
        self.use_ema = exp.ema
        self.start_epoch = 0

        self.input_size = exp.input_size
        self.best_ap = 0.0
        self.meter = MeterBuffer(window_size=exp.print_interval)
        self.drop_monitor = CandidateDropMonitor(logger)
        from ..parallel.dist import get_rank, is_main_process

        self.is_main = is_main_process()
        self.file_name = os.path.join(
            exp.output_dir, getattr(args, "experiment_name", exp.exp_name)
        )
        if self.is_main:
            os.makedirs(self.file_name, exist_ok=True)
        setup_logger(self.file_name, get_rank(),
                     filename="train_log.txt", mode="a")

    # ------------------------------------------------------------------

    def train(self):
        self.before_train()
        try:
            self.train_in_epoch()
        finally:
            self.after_train()

    def before_train(self):
        exp = self.exp
        args = self.args
        logger.info(f"args: {args}")
        logger.info(f"exp value:\n{exp}")

        batch_size = args.batch_size
        self.model = exp.get_model()
        rng = jax.random.PRNGKey(exp.seed or 0)
        sample = jnp.zeros(
            (1, self.input_size[0], self.input_size[1], 3), jnp.float32
        )

        # Resolve the resume epoch BEFORE building the loader: no_aug (and
        # with it mosaic state + L1 + eval cadence) depends on start_epoch
        # (the reference resumes first, then computes no_aug and builds the
        # loader — `yolox/core/trainer.py:137-147`).  The state tree itself
        # can only be restored later (it needs the optimizer, which needs
        # the loader length), so the payload is stashed for resume_train.
        self._resume_payload = None
        if getattr(args, "resume", False):
            ckpt_file = args.ckpt or os.path.join(
                self.file_name, "latest_ckpt"
            )
            self._resume_payload = load_checkpoint(ckpt_file)
            self.start_epoch = (
                args.start_epoch
                if getattr(args, "start_epoch", None) is not None
                else self._resume_payload.get("metadata", {}).get(
                    "start_epoch", 0
                )
            )

        self.no_aug = self.start_epoch >= self.max_epoch - exp.no_aug_epochs
        # ``batch_size`` is the GLOBAL batch.  Under multi-host each
        # process loads only its 1/P share via the rank-strided sampler
        # (the exp divides batch_size when is_distributed — the
        # reference's per-rank split, `yolox/exp/yolox_base.py:143-144`);
        # shard_batch stitches the local shares back into the global
        # array on the mesh.
        nproc = jax.process_count()
        assert batch_size % max(nproc, 1) == 0, (batch_size, nproc)
        self.train_loader = exp.get_data_loader(
            batch_size=batch_size,
            is_distributed=nproc > 1,
            no_aug=self.no_aug,
            cache_img=getattr(args, "cache", False),
            rank=jax.process_index(),
            world_size=nproc,
        )
        self.iters_per_epoch = len(self.train_loader)
        self.tx = exp.get_optimizer(batch_size, self.iters_per_epoch)

        self.state = create_train_state(
            self.model, self.tx, rng, sample, use_ema=self.use_ema
        )
        logger.info(
            "Model summary: "
            + get_model_info(
                self.model,
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats},
                exp.test_size,
            )
        )
        self.resume_train()

        self.mesh = make_mesh(
            spatial=getattr(args, "spatial", 1),
            tensor=getattr(args, "tensor", 1),
        )
        # ZeRO-style state sharding and/or channel tensor parallelism:
        # place the (possibly resumed) state on its param_specs shardings
        # once, so every compiled step is donation-stable from step 1
        self.fsdp = bool(getattr(args, "fsdp", False))
        if self.fsdp or MODEL_AXIS in self.mesh.axis_names:
            self.state = place_state(self.state, self.mesh, fsdp=self.fsdp)
        self._steps = {}  # (use_l1,) -> compiled step
        self.evaluator = (
            # both halves of distributed eval wired together: the
            # loader slices the val set per host, evaluate() gathers
            exp.get_evaluator(batch_size=batch_size,
                              is_distributed=nproc > 1)
            if getattr(args, "data_available", True) and exp.data_dir
            else None
        )
        self.use_l1 = False
        self._epoch_iter = None
        self._mosaic_switched = False
        self._prewarm_started = False
        self._prewarm_thread = None
        self._seen_buckets = {tuple(self.input_size)}

        self.tblogger = None
        if self.is_main:
            try:
                from tensorboardX import SummaryWriter

                self.tblogger = SummaryWriter(
                    os.path.join(self.file_name, "tensorboard")
                )
            except ImportError:
                logger.info("tensorboardX unavailable; scalar logs only")
        logger.info("Training start...")

    def _get_step(self):
        key = (self.use_l1,)
        if key not in self._steps:
            cfg = YoloxLossConfig(
                num_classes=self.exp.num_classes, use_l1=self.use_l1
            )
            step = make_train_step_bbox(
                self.model, self.tx, cfg,
                ema_decay=self.exp.ema_decay if self.use_ema else None,
                accum_steps=getattr(self.args, "accum", 1),
            )
            self._steps[key] = shard_train_step(
                step, self.mesh, state=self.state, fsdp=self.fsdp
            )
        return self._steps[key]

    def train_in_epoch(self):
        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            self.train_one_epoch()
            self.after_epoch()

    def before_epoch(self):
        logger.info(f"---> start train epoch{self.epoch + 1}")
        exp = self.exp
        if not getattr(self, "_no_aug_applied", False) and (
            self.epoch + 1 == self.max_epoch - exp.no_aug_epochs
            or self.no_aug
        ):
            self._no_aug_applied = True
            logger.info("--->No mosaic aug now!")
            self.train_loader.close_mosaic()
            self._mosaic_switched = True
            logger.info("--->Add additional L1 loss now!")
            self.use_l1 = True
            exp.eval_interval = 1
            # use_l1 is structural: _get_step now returns a brand-new
            # jitted program whose multiscale buckets are all uncompiled
            # (multiscale draws continue through the no-aug tail), so the
            # background prewarm must run again for it — otherwise every
            # bucket stalls the main thread on a synchronous XLA compile,
            # the exact failure prewarm.py exists to prevent.
            if self._prewarm_thread is not None:
                self._prewarm_thread.stop_event.set()
            self._prewarm_started = False
            self._seen_buckets = {tuple(self.input_size)}
            if not self.no_aug:
                self.save_ckpt(ckpt_name="last_mosaic_epoch")
        # persistent iterator: the sampler is infinite and re-creating it
        # would respawn the loader workers every epoch.  Re-created only
        # when the mosaic switch must reach the workers.
        if getattr(self, "_epoch_iter", None) is None or self._mosaic_switched:
            self._epoch_iter = iter(self.train_loader)
            self._mosaic_switched = False

    def train_one_epoch(self):
        step_fn = self._get_step()
        tsize = self.input_size
        for it in range(self.iters_per_epoch):
            self._it = it
            iter_start = time.time()
            imgs, labels, _, _ = next(self._epoch_iter)
            imgs = jnp.asarray(np.ascontiguousarray(imgs, np.float32))
            labels = jnp.asarray(np.ascontiguousarray(labels, np.float32))
            if not self._prewarm_started:
                self._prewarm_started = True
                self._maybe_start_prewarm(step_fn, imgs, labels)
            if tsize != self.input_size:
                imgs, labels = self.exp.preprocess(imgs, labels, tsize)
            data_time = time.time() - iter_start

            if tuple(tsize) not in self._seen_buckets:
                # claim the bucket before dispatch: if the prewarm thread
                # is mid-compiling this exact size, wait for its result
                # instead of running a duplicate concurrent XLA compile
                # (measured: 143 s racing vs ~10 s cache hit)
                claims = getattr(self._prewarm_thread, "claims", None)
                if claims is not None and not claims.claim(tsize):
                    t0 = time.time()
                    claims.wait(tsize)
                    if time.time() - t0 > 1.0:
                        logger.info(
                            f"bucket {tsize[0]}px: waited "
                            f"{time.time() - t0:.1f}s for the in-flight "
                            "prewarm compile"
                        )
                elif claims is not None:
                    # main thread owns the compile; unblock any waiter
                    claims.release(tsize)

            with self.mesh:
                # multi-host aware: local batches stitch into the global
                # array (see parallel.mesh.shard_batch)
                sb = shard_batch(self.mesh, {"i": imgs, "l": labels})
                imgs, labels = sb["i"], sb["l"]
                self.state, metrics = step_fn(
                    self.state, imgs, labels,
                    jax.random.PRNGKey(self.progress_in_iter),
                )
            iter_time = time.time() - iter_start
            if tuple(tsize) not in self._seen_buckets:
                # first dispatch of this shape bucket: surfaces whether
                # the background prewarm actually paid off (a cache hit
                # is seconds; an unprewarmed XLA compile is minutes)
                self._seen_buckets.add(tuple(tsize))
                pw = getattr(self._prewarm_thread, "done_sizes", set())
                logger.info(
                    f"bucket {tsize[0]}px first step: {iter_time:.1f}s "
                    f"(prewarmed={tuple(tsize) in pw})"
                )
            host_metrics = jax.device_get(metrics)  # one tunnel round trip
            self.meter.update(
                iter_time=iter_time,
                data_time=data_time,
                total_loss=float(host_metrics["total_loss"]),
                cand_dropped=float(host_metrics.get("cand_dropped", 0.0)),
                iou_loss=float(host_metrics["iou_loss"]),
                conf_loss=float(host_metrics["conf_loss"]),
                cls_loss=float(host_metrics["cls_loss"]),
                l1_loss=float(host_metrics["l1_loss"]),
                num_fg=float(host_metrics["num_fg"]),
            )
            self.drop_monitor.update(
                host_metrics.get("cand_dropped", 0.0)
            )

            if (it + 1) % self.exp.print_interval == 0:
                self._log_iter(it, tsize)
                self.meter.clear_meters()

            # multiscale: draw a new size every 10 iters (ref :251-254);
            # seeded by the global step so all hosts agree
            if (self.progress_in_iter + 1) % 10 == 0:
                tsize = self.exp.random_resize(self.progress_in_iter + 1)

    def _maybe_start_prewarm(self, step_fn, imgs, labels):
        """Kick off background compilation of every multiscale bucket.

        A fresh-cache run otherwise stalls minutes per bucket when the
        10-iter multiscale draw first lands on a new size (measured:
        tools/measure_compile_cost.py, BASELINE.md).  Uses the first real
        batch's shapes so the AOT signature matches the dispatch path
        exactly; the base bucket is skipped (the main thread compiles it
        at iter 0).  Disable with ``--no-prewarm`` / EOP_NO_PREWARM=1.
        """
        if not getattr(self.args, "prewarm", True):
            return
        if os.environ.get("EOP_NO_PREWARM"):
            return
        from .prewarm import multiscale_buckets, start_prewarm_thread

        sizes = multiscale_buckets(self.exp)
        base = tuple(self.input_size)
        if not [s for s in sizes if s != base]:
            return
        nproc = max(jax.process_count(), 1)
        global_b = imgs.shape[0] * nproc
        lbl_shape = (global_b,) + tuple(labels.shape[1:])
        n_todo = len([s for s in sizes if s != base])
        logger.info(
            f"prewarm: compiling {n_todo} multiscale buckets in the "
            "background"
        )
        # abstract the state NOW: its buffers are about to be donated by
        # the jitted step, and the thread must never touch live arrays
        state_abs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
            self.state,
        )
        self._prewarm_thread = start_prewarm_thread(
            step_fn, state_abs, sizes, global_b, lbl_shape,
            skip=[base], log=logger.info,
        )

    def _log_iter(self, it, tsize):
        left_iters = (
            self.iters_per_epoch * self.max_epoch
            - (self.progress_in_iter + 1)
        )
        eta_seconds = self.meter["iter_time"].global_avg * left_iters
        eta_str = f"ETA: {datetime.timedelta(seconds=int(eta_seconds))}"
        progress_str = (
            f"epoch: {self.epoch + 1}/{self.max_epoch}, "
            f"iter: {it + 1}/{self.iters_per_epoch}"
        )
        loss_meter = self.meter.get_filtered_meter("loss")
        loss_str = ", ".join(
            f"{k}: {v.latest:.1f}" for k, v in loss_meter.items()
        )
        time_meter = self.meter.get_filtered_meter("time")
        time_str = ", ".join(
            f"{k}: {v.avg:.3f}s" for k, v in time_meter.items()
        )
        logger.info(
            f"{progress_str}, mem: {device_mem_usage():.0f}MB, "
            f"{time_str}, {loss_str}, size: {tsize[0]}, {eta_str}"
        )
        if self.tblogger:
            for k, v in loss_meter.items():
                self.tblogger.add_scalar(
                    f"train/{k}", v.latest, self.progress_in_iter
                )

    def after_epoch(self):
        interval = getattr(self.exp, "ckpt_interval", 1)
        if ((self.epoch + 1) % interval == 0
                or self.epoch + 1 == self.max_epoch):
            self.save_ckpt(ckpt_name="latest")
        if (self.epoch + 1) % self.exp.eval_interval == 0:
            self.evaluate_and_save_model()

    def after_train(self):
        logger.info(
            f"Training of experiment is done and the best AP is "
            f"{self.best_ap * 100:.2f}"
        )
        t = getattr(self, "_prewarm_thread", None)
        if t is not None and t.is_alive():
            # a short run can end mid-prewarm: stop between buckets and
            # give the in-flight native compile a bounded grace period
            # rather than tearing down the interpreter under it
            t.stop_event.set()
            t.join(timeout=30)
            if t.is_alive():
                logger.info("prewarm thread still compiling; exiting "
                            "without it (daemon)")
        if hasattr(self, "train_loader"):
            self.train_loader.shutdown()

    @property
    def progress_in_iter(self):
        return self.epoch * self.iters_per_epoch + getattr(self, "_it", 0)

    # ------------------------------------------------------------------

    def resume_train(self):
        args = self.args
        if getattr(args, "resume", False):
            logger.info("resume training")
            payload = self._resume_payload  # loaded in before_train
            merged, report = load_ckpt_partial(
                jax.tree.map(np.asarray, self.state), payload["state"]
            )
            self.state = jax.tree.map(jnp.asarray, merged)
            self._resume_payload = None
            if report["skipped"]:
                logger.warning(
                    f"resume: {len(report['skipped'])} mismatched/missing "
                    f"keys kept their fresh values (first: "
                    f"{report['skipped'][:3]})"
                )
            logger.info(
                f"resumed at epoch {self.start_epoch} "
                f"({len(report['loaded'])} leaves restored)"
            )
        elif getattr(args, "ckpt", None):
            logger.info("loading checkpoint for fine tuning")
            payload = load_checkpoint(args.ckpt)
            host_state = jax.tree.map(np.asarray, self.state)
            merged, report = load_ckpt_partial(
                host_state, payload["state"]
            )
            self.state = jax.tree.map(jnp.asarray, merged)
            if report["skipped"]:
                logger.info(
                    f"fine-tune: skipped {len(report['skipped'])} "
                    "mismatched/missing keys"
                )

    def evaluate_and_save_model(self):
        if self.evaluator is None:
            self.save_ckpt(ckpt_name="last_epoch")
            return
        use_ema = self.use_ema and self.state.ema_params is not None
        # state_to_host: under multi-host FSDP the weights span processes
        # and each rank's eval program needs a local copy (collective —
        # evaluate runs on all ranks); no-op otherwise
        eval_vars = state_to_host({
            "params": self.state.ema_params if use_ema else self.state.params,
            # the reference's EMA covers BN running stats too (ema.py:42-53)
            "batch_stats": self.state.ema_batch_stats
            if use_ema and self.state.ema_batch_stats is not None
            else self.state.batch_stats,
        })
        ap50_95, ap50, summary = self.exp.eval(
            self.model, eval_vars, self.evaluator,
            is_distributed=jax.process_count() > 1,
        )
        logger.info(f"\n{summary}")
        if self.tblogger:
            self.tblogger.add_scalar("val/COCOAP50", ap50, self.epoch + 1)
            self.tblogger.add_scalar(
                "val/COCOAP50_95", ap50_95, self.epoch + 1
            )
        self.save_ckpt("last_epoch", ap50_95 > self.best_ap)
        self.best_ap = max(self.best_ap, ap50_95)

    def save_ckpt(self, ckpt_name: str, update_best_ckpt: bool = False):
        # collective when FSDP shards state across hosts (every rank joins
        # the gather; all save_ckpt call sites run on all ranks) — must
        # happen BEFORE the rank-0-only write gate
        host_state = state_to_host(self.state)
        if not getattr(self, "is_main", True):
            return  # one writer per checkpoint dir under multi-host
        logger.info(f"Save weights to {self.file_name}")
        save_checkpoint(
            host_state,
            update_best_ckpt,
            self.file_name,
            ckpt_name,
            metadata={"start_epoch": self.epoch + 1
                      if hasattr(self, "epoch") else 0},
        )
