#!/usr/bin/env python3
"""24-point detector training entry point.

Parity target: `/root/reference/yolox_24p/train_24p.py:180-211` — the
documented primary train flow (`README.md:84`):
    python tools/train_24p.py -f load_train/yolox_24p_train.py -b 20 -l 0.01
The reference's `-s/-d` CUDA_VISIBLE_DEVICES plumbing is obsolete on TPU
(XLA owns the devices); `--resume/-c/-e` are wired (the reference parses
but ignores them, `train_24p.py:193-197`).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    parser = argparse.ArgumentParser("eop_tpu train_24p")
    parser.add_argument("-f", "--exp_file", type=str,
                        default="load_train/yolox_24p_train.py")
    parser.add_argument("-b", "--batch_size", type=int, default=20)
    parser.add_argument("-l", "--lr", type=float, default=0.01)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("-c", "--ckpt", type=str, default=None)
    parser.add_argument("-e", "--start_epoch", type=int, default=None)
    parser.add_argument("--data-dir", type=str, default=None,
                        help="images directory")
    parser.add_argument("--label-dir", type=str, default=None,
                        help="24p txt labels directory")
    parser.add_argument("--max-epoch", type=int, default=None)
    parser.add_argument("--eval", action="store_true",
                        help="evaluate COCO-24p AP every eval_interval "
                             "epochs (the reference trains blind)")
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
    from eop_tpu.train import Trainer24P

    exp = get_exp(args.exp_file)
    if args.opts:
        exp.merge(args.opts)
    if args.data_dir:
        exp.data_dir = args.data_dir
    if args.label_dir:
        exp.label_dir = args.label_dir
    if args.max_epoch:
        exp.max_epoch = args.max_epoch
    assert exp.data_dir and exp.label_dir, (
        "set --data-dir/--label-dir (or exp.data_dir/label_dir) to the "
        "images and 24p txt label directories; generate labels with "
        "tools/labels_create_24p.py"
    )
    trainer = Trainer24P(exp, args)
    trainer.train()


if __name__ == "__main__":
    from eop_tpu.utils.logger import catch

    catch(main)()
