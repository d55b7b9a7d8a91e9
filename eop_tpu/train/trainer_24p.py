"""24-point detector trainer.

Parity target: the minimal single-device trainer in
`/root/reference/yolox_24p/train_24p.py:22-177`: plain SGD, tqdm epoch
loop, per-step TensorBoard stream of total/conf/cls losses plus the **24
per-radius IoU losses and the 26-scaled DWA weights** (`TB_data:115-137`),
a ``last_epoch`` checkpoint per epoch, and the (unused there) GT-vs-pred
circle overlay — provided here as `render_train_sample`.

Upgrades over the reference (flagged, defaults preserve its behavior):
wired ``--resume`` (the reference parses but ignores it, `:193-197`),
optional EMA, optional LR scheduling, mesh data parallelism.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import Loss24PConfig
from ..parallel.mesh import (
    MODEL_AXIS,
    make_mesh,
    place_state,
    shard_batch,
    shard_train_step,
)
from ..utils.logger import logger, setup_logger
from ..utils.metric import CandidateDropMonitor
from .checkpoint import (
    load_checkpoint,
    load_ckpt_partial,
    save_checkpoint,
    state_to_host,
)
from .steps import create_train_state, make_train_step_24p



from ..utils.setup_env import enable_compile_cache

class Trainer24P:
    def __init__(self, exp, args):
        enable_compile_cache()
        self.exp = exp
        self.args = args
        self.max_epoch = exp.max_epoch
        self.input_size = exp.input_size
        self.start_epoch = 0
        self.drop_monitor = CandidateDropMonitor(logger)

        from ..parallel.dist import get_rank, is_main_process

        self.is_main = is_main_process()
        self.file_name = os.path.join(exp.output_dir, exp.exp_name)
        if self.is_main:
            os.makedirs(self.file_name, exist_ok=True)
        # rank-0 writes the log file; other hosts keep stderr only
        setup_logger(self.file_name, get_rank(), filename="train_log.txt")

        # args.batch_size is the GLOBAL batch; under multi-host the exp
        # divides it and the rank-strided sampler hands each process its
        # 1/P share, which shard_batch stitches back on the mesh.
        nproc = jax.process_count()
        assert args.batch_size % max(nproc, 1) == 0, (
            args.batch_size, nproc)
        self.train_loader = exp.get_data_loader(
            args.batch_size,
            is_distributed=nproc > 1,
            rank=jax.process_index(),
            world_size=nproc,
        )
        self.iters_per_epoch = len(self.train_loader)
        self._dump_sampler_coverage()

        self.tblogger = None
        if self.is_main:
            try:
                from tensorboardX import SummaryWriter

                self.tblogger = SummaryWriter(
                    os.path.join(self.file_name, "tensorboard")
                )
            except ImportError:
                pass

    def _dump_sampler_coverage(self):
        """Debug probe (EOP_DUMP_SAMPLER=<path>): write this process's
        first-epoch sample indices + rank/world to a json file.

        Lets the multi-host CLI regression test assert that ranks draw
        disjoint shares of the dataset — the exact data-duplication bug
        class fixed in round 2 (trainers forgetting to hand rank/world to
        the samplers trains P identical copies)."""
        path = os.environ.get("EOP_DUMP_SAMPLER")
        if not path:
            return
        import itertools
        import json

        import jax

        sampler = self.train_loader.batch_sampler.sampler
        n = len(self.train_loader.dataset)
        world = max(jax.process_count(), 1)
        indices = list(itertools.islice(iter(sampler), n // world))
        with open(path, "w") as f:
            json.dump(
                {"rank": jax.process_index(), "world": world,
                 "dataset_len": n, "indices": indices},
                f,
            )

    def train(self):
        exp = self.exp
        args = self.args
        model = exp.get_model()
        lr = getattr(args, "lr", None) or exp.basic_lr_per_img * args.batch_size
        tx = exp.get_optimizer(args.batch_size, lr=lr)

        rng = jax.random.PRNGKey(exp.seed or 0)
        sample = jnp.zeros(
            (1, self.input_size[0], self.input_size[1], 3), jnp.float32
        )
        state = create_train_state(
            model, tx, rng, sample, use_ema=exp.ema, with_dwa=True
        )
        state = self._maybe_resume(state)

        mesh = make_mesh(
            spatial=getattr(args, "spatial", 1),
            tensor=getattr(args, "tensor", 1),
        )
        fsdp = bool(getattr(args, "fsdp", False))
        if fsdp or MODEL_AXIS in mesh.axis_names:
            # ZeRO-style state sharding / channel tensor parallelism:
            # one-time placement keeps every step donation-stable
            state = place_state(state, mesh, fsdp=fsdp)
        steps = {}

        def get_step(use_l1: bool):
            if use_l1 not in steps:
                cfg = Loss24PConfig(
                    num_classes=exp.num_classes,
                    use_l1=use_l1,
                    reference_parity=exp.reference_parity,
                )
                steps[use_l1] = shard_train_step(
                    make_train_step_24p(
                        model, tx, cfg,
                        ema_decay=exp.ema_decay if exp.ema else None,
                        accum_steps=getattr(args, "accum", 1),
                    ),
                    mesh, state=state, fsdp=fsdp,
                )
            return steps[use_l1]

        evaluator = None
        if getattr(args, "eval", False):
            evaluator = exp.get_evaluator(args.batch_size)
        best_ap = 0.0

        logger.info("24p training start...")
        global_step = 0
        # one persistent iterator: the sampler is infinite, and re-creating
        # it each epoch would respawn the worker processes (~20 s/epoch)
        it = iter(self.train_loader)
        for epoch in range(self.start_epoch, self.max_epoch):
            self.epoch = epoch
            use_l1 = epoch >= self.max_epoch - exp.L1_epoch
            step_fn = get_step(use_l1)
            epoch_start = time.time()
            for i in range(self.iters_per_epoch):
                imgs, labels, _, _ = next(it)
                with mesh:
                    # multi-host aware: local batches stitch into the
                    # global array (see parallel.mesh.shard_batch)
                    sb = shard_batch(mesh, {
                        "imgs": np.ascontiguousarray(imgs, np.float32),
                        "labels": np.ascontiguousarray(labels, np.float32),
                    })
                    imgs, labels = sb["imgs"], sb["labels"]
                    state, metrics = step_fn(
                        state, imgs, labels, jax.random.PRNGKey(global_step)
                    )
                if (i + 1) % self.exp.print_interval == 0:
                    logger.info(
                        f"epoch {epoch + 1}/{self.max_epoch} "
                        f"iter {i + 1}/{self.iters_per_epoch} "
                        f"loss {float(metrics['total_loss']):.4f} "
                        f"conf {float(metrics['conf_loss']):.4f} "
                        f"cls {float(metrics['cls_loss']):.4f} "
                        f"fg/gt {float(metrics['num_fg']):.2f}"
                        + (
                            f" cand_dropped {dropped}"
                            if (dropped := int(metrics.get(
                                "cand_dropped", 0))) else ""
                        )
                    )
                    # sampled at print cadence: each probe is a host fetch
                    self.drop_monitor.update(dropped)
                if self.tblogger is not None:
                    # one host transfer for the whole metric tree (each
                    # float() is a full tunnel round trip)
                    self._tb_data(jax.device_get(metrics), global_step)
                global_step += 1
            logger.info(
                f"epoch {epoch + 1} done in {time.time() - epoch_start:.1f}s"
            )
            # collective when FSDP shards state across hosts (every rank
            # joins the gather) — must run BEFORE the rank-0 write gate
            interval = getattr(exp, "ckpt_interval", 1)
            want_eval = evaluator and (epoch + 1) % exp.eval_interval == 0
            host_state = None
            if ((epoch + 1) % interval == 0 or epoch + 1 == self.max_epoch
                    or want_eval):
                host_state = state_to_host(state)
                if self.is_main:  # one writer per checkpoint dir
                    save_checkpoint(
                        host_state, False, self.file_name, "last_epoch",
                        metadata={"start_epoch": epoch + 1},
                    )
            if evaluator and (epoch + 1) % exp.eval_interval == 0:
                use_ema = exp.ema and state.ema_params is not None
                # state_to_host: under multi-host FSDP each rank's eval
                # program needs a local weight copy (collective; no-op
                # otherwise)
                eval_vars = state_to_host({
                    "params": state.ema_params if use_ema else state.params,
                    # EMA covers BN running stats too (ref ema.py:42-53)
                    "batch_stats": state.ema_batch_stats
                    if use_ema and state.ema_batch_stats is not None
                    else state.batch_stats,
                })
                ap5095, ap50, summary = evaluator.evaluate(
                    exp.get_infer_fn(model, eval_vars)
                )
                logger.info(f"epoch {epoch + 1} eval:\n{summary}")
                logger.info(f"AP50:95={ap5095:.4f} AP50={ap50:.4f}")
                if self.tblogger:
                    self.tblogger.add_scalar("val/AP50", ap50, epoch + 1)
                    self.tblogger.add_scalar(
                        "val/AP50_95", ap5095, epoch + 1)
                if ap5095 > best_ap:
                    best_ap = ap5095
                    if self.is_main:
                        # host_state gathered above this epoch; the
                        # optimizer step count hasn't advanced since
                        save_checkpoint(
                            host_state, True, self.file_name, "last_epoch",
                            metadata={"start_epoch": epoch + 1},
                        )
        self.train_loader.shutdown()
        return state

    def _maybe_resume(self, state):
        args = self.args
        if getattr(args, "resume", False) or getattr(args, "ckpt", None):
            ckpt_file = getattr(args, "ckpt", None) or os.path.join(
                self.file_name, "last_epoch_ckpt"
            )
            logger.info(f"loading checkpoint {ckpt_file}")
            payload = load_checkpoint(ckpt_file)
            host = jax.tree.map(np.asarray, state)
            merged, report = load_ckpt_partial(host, payload["state"])
            state = jax.tree.map(jnp.asarray, merged)
            if getattr(args, "resume", False):
                explicit = getattr(args, "start_epoch", None)
                self.start_epoch = (
                    explicit if explicit is not None
                    else payload.get("metadata", {}).get("start_epoch", 0)
                )
        return state

    def _tb_data(self, metrics, step: int):
        """Per-step observability: total/conf/cls + 24 per-radius IoU
        losses + DWA weights (ref `TB_data:115-137`)."""
        if self.tblogger is None:
            return
        tb = self.tblogger
        tb.add_scalar("train/total_loss",
                      float(metrics["total_loss"]), step)
        tb.add_scalar("train/conf_loss", float(metrics["conf_loss"]), step)
        tb.add_scalar("train/cls_loss", float(metrics["cls_loss"]), step)
        iou24 = np.asarray(metrics["iou_losses_24"])
        reg_w = np.asarray(metrics["dwa_reg_w"])
        for r in range(24):
            tb.add_scalar(f"iou_loss/radius_{r:02d}", float(iou24[r]), step)
            tb.add_scalar(f"dwa_weight/reg_{r:02d}", float(reg_w[r]), step)
        tb.add_scalar("dwa_weight/obj", float(metrics["dwa_obj_w"]), step)
        tb.add_scalar("dwa_weight/cls", float(metrics["dwa_cls_w"]), step)
        if "cand_dropped" in metrics:
            # SimOTA compaction overflow telemetry (upper bound: counts
            # shed *superset* anchors, not only true candidates)
            tb.add_scalar("train/cand_dropped",
                          float(metrics["cand_dropped"]), step)

    def render_train_sample(self, image, pred_rows, gt_rows, out_path):
        """GT-vs-pred circle overlay (ref `show_train_results:156-177`)."""
        import cv2

        from ..ops.polygon import radii_from_points

        img = np.ascontiguousarray(image).astype(np.uint8)
        for row in np.asarray(gt_rows):
            if row.sum() == 0:
                continue
            cx, cy = row[1], row[2]
            radii = np.asarray(
                radii_from_points(jnp.asarray(row[None, 1:]))
            )[0]
            cv2.circle(img, (int(cx), int(cy)), int(radii.mean()),
                       (0, 255, 0), 1)
        for row in np.asarray(pred_rows):
            cx, cy = row[0], row[1]
            cv2.circle(img, (int(cx), int(cy)),
                       int(np.mean(row[2:26])), (0, 0, 255), 1)
        cv2.imwrite(out_path, img)
        return out_path
