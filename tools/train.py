#!/usr/bin/env python3
"""Full-trainer entry point (bbox family).

Parity target: the reference's latent launch/Trainer stack
(`yolox/core/launch.py:39-98`, `yolox/core/trainer.py:33-88`) — here
first-class and launcher-free: one process drives the whole device mesh
(`jax.distributed.initialize()` for multi-host slices).

    python tools/train.py -n yolox-s -b 64 --data-dir datasets/COCO
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    parser = argparse.ArgumentParser("eop_tpu train")
    parser.add_argument("-expn", "--experiment-name", type=str, default=None)
    parser.add_argument("-n", "--name", type=str, default=None,
                        help="model name, e.g. yolox-s")
    parser.add_argument("-f", "--exp_file", type=str, default=None)
    parser.add_argument("-b", "--batch_size", type=int, default=64)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("-c", "--ckpt", type=str, default=None)
    parser.add_argument("-e", "--start_epoch", type=int, default=None)
    parser.add_argument("--cache", action="store_true",
                        help="cache resized images via np.memmap")
    parser.add_argument("--data-dir", type=str, default=None)
    parser.add_argument("--no-prewarm", dest="prewarm", action="store_false",
                        help="skip background AOT compile of the "
                             "multiscale shape buckets")
    parser.add_argument("--spatial", type=int, default=1,
                        help="shard image height over this many devices "
                             "on top of data parallelism (2-D mesh; "
                             "capability the reference's DDP lacks)")
    parser.add_argument("--tensor", type=int, default=1,
                        help="shard parameter channel dims over this many "
                             "devices (model axis / tensor parallelism)")
    parser.add_argument("--fsdp", action="store_true",
                        help="ZeRO-style sharding of params/optimizer/EMA "
                             "over the data axis (all-gather on use, "
                             "reduce-scatter grads)")
    parser.add_argument("--accum", type=int, default=1,
                        help="gradient accumulation micro-steps per "
                             "optimizer step (lax.scan in-program; "
                             "effective batch = batch_size, activation "
                             "memory ~ batch_size/accum)")
    parser.add_argument("--profile-port", type=int, default=None,
                        help="start jax.profiler.start_server(PORT): live "
                             "on-demand device traces via TensorBoard's "
                             "capture-profile button or "
                             "tools/profile_train.py --attach")
    parser.add_argument("--multi-host", action="store_true",
                        help="call jax.distributed.initialize() first")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 (omit on TPU pods "
                             "where jax auto-detects)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--platform", type=str, default=None,
                        help="pin jax_platforms (e.g. cpu) BEFORE "
                             "distributed init — device-plugin discovery "
                             "can otherwise override the platform choice")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                        help="exp overrides: key value ...")
    return parser


def main():
    args = make_parser().parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.multi_host:
        import jax

        kw = {}
        if args.coordinator:
            kw = dict(coordinator_address=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id)
        jax.distributed.initialize(**kw)

    if args.profile_port:
        import jax

        # live profiling: a TensorBoard "capture profile" (or
        # jax.profiler.trace_from_url) can attach to this port any time
        # during the run — closes the offline-only profiling gap
        jax.profiler.start_server(args.profile_port)
    from eop_tpu.exp import get_exp
    from eop_tpu.train import Trainer

    exp = get_exp(args.exp_file, args.name)
    if args.opts:
        exp.merge(args.opts)
    if args.data_dir:
        exp.data_dir = args.data_dir
    if exp.seed is not None:
        random.seed(exp.seed)
        warnings.warn(
            "You have chosen to seed training. This will slow down your "
            "training considerably!"
        )
    args.experiment_name = args.experiment_name or exp.exp_name

    trainer = Trainer(exp, args)
    trainer.train()


if __name__ == "__main__":
    from eop_tpu.utils.logger import catch

    catch(main)()
