#!/usr/bin/env python3
"""Standalone COCO/VOC AP evaluation from a checkpoint.

Counterpart of the reference's evaluator flow inside the trainer
(`yolox/core/trainer.py:294-329` -> `COCOEvaluator.evaluate`), exposed as a
CLI:

    python tools/eval.py -n yolox-s -c <ckpt> -b 64 --data-dir datasets/COCO
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_parser():
    parser = argparse.ArgumentParser("eop_tpu eval")
    parser.add_argument("-n", "--name", type=str, default=None)
    parser.add_argument("-f", "--exp_file", type=str, default=None)
    parser.add_argument("-c", "--ckpt", type=str, default=None,
                        help="orbax dir or torch .pth")
    parser.add_argument("-b", "--batch_size", type=int, default=64)
    parser.add_argument("--conf", type=float, default=None)
    parser.add_argument("--nms", type=float, default=None)
    parser.add_argument("--tsize", type=int, default=None)
    parser.add_argument("--data-dir", type=str, default=None)
    parser.add_argument("--testdev", action="store_true")
    parser.add_argument("--legacy", action="store_true")
    parser.add_argument("--per-class-ap", action="store_true")
    parser.add_argument("--int8", action="store_true",
                        help="int8 PTQ eval: calibrate activation scales "
                             "on the first val batches, run eligible "
                             "convs on the MXU int8 path")
    parser.add_argument("--quant-min-channels", type=int, default=64)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return parser


def load_variables(exp, args):
    import jax
    import jax.numpy as jnp

    model = exp.get_model()
    from eop_tpu.models import init_model

    variables = init_model(
        model,
        jax.random.PRNGKey(0),
        jnp.zeros((1, exp.test_size[0], exp.test_size[1], 3), jnp.float32),
        on_host=True,
    )
    if args.ckpt:
        from eop_tpu.train.checkpoint import load_eval_variables

        variables = load_eval_variables(args.ckpt, variables)
    return model, variables


def main():
    args = make_parser().parse_args()
    from eop_tpu.exp import get_exp

    exp = get_exp(args.exp_file, args.name)
    if args.opts:
        exp.merge(args.opts)
    if args.data_dir:
        exp.data_dir = args.data_dir
    if args.conf is not None:
        exp.test_conf = args.conf
    if args.nms is not None:
        exp.nmsthre = args.nms
    if args.tsize is not None:
        exp.test_size = (args.tsize, args.tsize)

    model, variables = load_variables(exp, args)
    # the 24p family's get_evaluator takes no testdev/legacy (those are
    # COCO-bbox notions); pass only what the exp's signature accepts
    import inspect

    accepted = inspect.signature(exp.get_evaluator).parameters
    extra_kw = {
        k: v for k, v in
        (("testdev", args.testdev), ("legacy", args.legacy))
        if k in accepted
    }
    evaluator = exp.get_evaluator(batch_size=args.batch_size, **extra_kw)
    evaluator.per_class_AP = args.per_class_ap
    quant_scales = None
    if args.int8:
        calib = [
            np.asarray(batch[0], np.float32)
            for batch, _ in zip(evaluator.dataloader, range(2))
        ]
        variables, quant_scales = exp.quantize_for_inference(
            model, variables, calib, args.quant_min_channels
        )
        print(f"int8 PTQ: {len(quant_scales)} convs quantized "
              f"(min_channels={args.quant_min_channels})")
    # diagnostic CLI: enable the forward-vs-NMS timing split
    ap50_95, ap50, summary = exp.eval(
        model, variables, evaluator, time_split=True,
        quant_scales=quant_scales,
        quant_min_channels=args.quant_min_channels,
    )
    print(summary)
    print(f"AP50:95 = {ap50_95:.4f}  AP50 = {ap50:.4f}")


if __name__ == "__main__":
    from eop_tpu.utils.logger import catch

    catch(main)()
