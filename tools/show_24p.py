#!/usr/bin/env python3
"""24-point inference + visualization over a folder of images.

Parity target: `/root/reference/yolox_24p/show_24p.py` — load checkpoint,
letterbox each image, decode + polygon NMS (conf 0.01, nms 0.3), draw the
24-point polygon per detection with per-class colours, save under a
timestamped output dir.

Usage (ref `README.md:88`):
    python tools/show_24p.py -f load_eval/yolox_24p_eval.py \
        -w <ckpt> -p demo_images
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_parser():
    parser = argparse.ArgumentParser("eop_tpu show_24p")
    parser.add_argument("-f", "--exp_file", type=str,
                        default="load_eval/yolox_24p_eval.py")
    parser.add_argument("-w", "--weights", type=str, default=None,
                        help="orbax checkpoint dir or torch .pth file")
    parser.add_argument("-p", "--path", type=str, default="demo_images",
                        help="directory of images to run on")
    parser.add_argument("--conf", type=float, default=None)
    parser.add_argument("--nms", type=float, default=None)
    parser.add_argument("--reference-parity", action="store_true",
                        help="replicate the reference's θ·cosθ NMS quirk")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                        help="exp overrides: key value ...")
    return parser


class Evaluator:
    """(ref `show_24p.py:25-305`)"""

    def __init__(self, exp, args):
        self.exp = exp
        self.args = args
        if args.conf is not None:
            exp.test_conf = args.conf
        if args.nms is not None:
            exp.nmsthre = args.nms
        if args.reference_parity:
            exp.reference_parity = True

    def load_model(self):
        import jax
        import jax.numpy as jnp

        exp = self.exp
        model = exp.get_model()
        rng = jax.random.PRNGKey(0)
        sample = jnp.zeros(
            (1, exp.test_size[0], exp.test_size[1], 3), jnp.float32
        )
        from eop_tpu.models import init_model

        variables = init_model(model, rng, sample, on_host=True)
        w = self.args.weights
        if w:
            from eop_tpu.train.checkpoint import load_eval_variables

            variables = load_eval_variables(w, variables)
        return model, variables

    def eval(self):
        import cv2

        from eop_tpu.data.coco_classes import COCO_CLASSES
        from eop_tpu.utils.visualize import vis_24p

        exp = self.exp
        model, variables = self.load_model()
        infer = exp.get_infer_fn(model, variables)

        save_dir = os.path.join(
            exp.output_dir, exp.exp_name,
            time.strftime("%Y_%m_%d_%H_%M_%S", time.localtime()),
        )
        os.makedirs(save_dir, exist_ok=True)

        files = sorted(
            f for f in os.listdir(self.args.path)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )
        import jax

        for fname in files:
            path = os.path.join(self.args.path, fname)
            imgs, ratio, original = exp.get_data_input(path)
            dets = jax.device_get(infer(imgs))
            rows = dets.rows[0][dets.valid[0].astype(bool)]
            out = vis_24p(
                original.copy(), rows, ratio=ratio, conf=exp.test_conf,
                class_names=COCO_CLASSES,
            )
            out_path = os.path.join(save_dir, fname)
            cv2.imwrite(out_path, out)
            print(f"{fname}: {len(rows)} detections -> {out_path}")
        return save_dir


def main():
    args = make_parser().parse_args()
    from eop_tpu.exp import get_exp

    exp = get_exp(args.exp_file)
    if args.opts:
        exp.merge(args.opts)
    Evaluator(exp, args).eval()


if __name__ == "__main__":
    from eop_tpu.utils.logger import catch

    catch(main)()
