#!/usr/bin/env python3
"""One-command detection demo: image / folder / video -> annotated media.

The reference ships numpy demo post-processing helpers
(`yolox/utils/demo_utils.py:17-124`) and a 24-point folder visualizer
(`yolox_24p/show_24p.py`), but no single demo CLI for the bbox family.
This tool closes that user-facing gap for BOTH families: it loads any exp
(bbox or 24-point), letterboxes each input on the host, runs the jitted
forward + decode + NMS program (optionally on the int8 PTQ path), and
writes annotated images / an annotated video.

Usage:
    python tools/demo.py -f exps/default/yolox_s.py -w <ckpt> -p img.jpg
    python tools/demo.py -f load_eval/yolox_24p_eval.py -w <ckpt> -p dir/
    python tools/demo.py -n yolox-l -w <ckpt> -p clip.mp4 --int8

Weights may be an orbax checkpoint dir from this repo's trainers or a
torch ``.pth`` from the reference's release table (`README.md:3-46`).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

IMAGE_EXT = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
VIDEO_EXT = (".mp4", ".avi", ".mov", ".mkv", ".webm")


def make_parser():
    parser = argparse.ArgumentParser("eop_tpu demo")
    parser.add_argument("-f", "--exp_file", type=str, default=None)
    parser.add_argument("-n", "--name", type=str, default=None,
                        help="model name (e.g. yolox-s) if no exp file")
    parser.add_argument("-w", "--weights", type=str, default=None,
                        help="orbax checkpoint dir or torch .pth file")
    parser.add_argument("-p", "--path", type=str, required=True,
                        help="image file, directory of images, or video")
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--nms", type=float, default=None)
    parser.add_argument("--tsize", type=int, default=None)
    parser.add_argument("--save-dir", type=str, default=None,
                        help="output dir (default <output_dir>/<exp>/vis_<ts>)")
    parser.add_argument("--int8", action="store_true",
                        help="run eligible convs on the MXU int8 PTQ path "
                             "(calibrated on the first inputs)")
    parser.add_argument("--quant-min-channels", type=int, default=64)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                        help="exp overrides: key value ...")
    return parser


def collect_inputs(path: str):
    """-> ("video", file) | ("images", [files])."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.lower().endswith(IMAGE_EXT)
        )
        assert files, f"no images under {path}"
        return "images", files
    assert os.path.isfile(path), f"{path} not found"
    if path.lower().endswith(VIDEO_EXT):
        return "video", path
    return "images", [path]


class Demo:
    def __init__(self, exp, args):
        self.exp = exp
        self.args = args
        exp.test_conf = args.conf
        if args.nms is not None:
            exp.nmsthre = args.nms
        if args.tsize is not None:
            exp.test_size = (args.tsize, args.tsize)
        from eop_tpu.exp.yolox_24p_base import Exp24P

        self.is_24p = isinstance(exp, Exp24P)

    def load(self, calib_batches):
        import jax
        import jax.numpy as jnp

        from eop_tpu.models import init_model

        exp = self.exp
        model = exp.get_model()
        sample = jnp.zeros(
            (1, exp.test_size[0], exp.test_size[1], 3), jnp.float32
        )
        variables = init_model(model, jax.random.PRNGKey(0), sample,
                               on_host=True)
        if self.args.weights:
            from eop_tpu.train.checkpoint import load_eval_variables

            variables = load_eval_variables(self.args.weights, variables)
        if self.args.int8:
            infer, scales = exp.get_quant_infer_fn(
                model, variables, calib_batches,
                self.args.quant_min_channels,
            )
            print(f"int8 PTQ: {len(scales)} convs on the MXU int8 path")
            return infer
        return exp.get_infer_fn(model, variables)

    def detect(self, infer, frame):
        """BGR frame -> (rows kept above conf, letterbox ratio)."""
        import jax

        from eop_tpu.data.augment import preproc

        padded, r = preproc(frame, self.exp.test_size)
        dets = jax.device_get(infer(padded[None]))
        rows = dets.rows[0][dets.valid[0].astype(bool)]
        return rows, r

    def draw(self, frame, rows, ratio):
        from eop_tpu.data.coco_classes import COCO_CLASSES
        from eop_tpu.utils.visualize import vis, vis_24p

        names = COCO_CLASSES if self.exp.num_classes == 80 else None
        if self.is_24p:
            # rows: [x, y, r1..r24, obj, cls_conf, cls] in letterbox coords
            return vis_24p(frame, rows, ratio=ratio,
                           conf=self.exp.test_conf, class_names=names)
        # rows: [x1, y1, x2, y2, obj, cls_conf, cls] in letterbox coords
        return vis(frame, rows[:, :4] / ratio, rows[:, 4] * rows[:, 5],
                   rows[:, 6], conf=self.exp.test_conf, class_names=names)


def run_images(demo: Demo, files, save_dir):
    import cv2

    from eop_tpu.data.augment import preproc

    # Only the calibration subset is decoded eagerly; the main loop streams
    # one frame at a time so a large folder can't exhaust host memory.
    calib = []
    for f in files[:4]:
        img = cv2.imread(f)
        assert img is not None, f"cannot read {f}"
        calib.append(preproc(img, demo.exp.test_size)[0][None])
    infer = demo.load(calib)
    t0, n_det = time.perf_counter(), 0
    for f in files:
        img = cv2.imread(f)
        assert img is not None, f"cannot read {f}"
        rows, r = demo.detect(infer, img)
        out = demo.draw(img.copy(), rows, r)
        out_path = os.path.join(save_dir, os.path.basename(f))
        cv2.imwrite(out_path, out)
        n_det += len(rows)
        print(f"{os.path.basename(f)}: {len(rows)} detections -> {out_path}")
    dt = time.perf_counter() - t0
    print(f"{len(files)} images, {n_det} detections, "
          f"{dt / len(files) * 1e3:.1f} ms/img incl. compile+IO")


def run_video(demo: Demo, src, save_dir):
    import cv2

    cap = cv2.VideoCapture(src)
    assert cap.isOpened(), f"cannot open video {src}"
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    # mp4v only reliably writes into .mp4 containers; everything else
    # (.mkv/.webm/.mov sources included) goes out as .avi/MJPG, which the
    # bundled OpenCV can always encode.
    base = os.path.basename(src)
    stem, ext = os.path.splitext(base)
    if ext.lower() == ".mp4":
        out_path, fourcc = os.path.join(save_dir, base), "mp4v"
    else:
        out_path, fourcc = os.path.join(save_dir, stem + ".avi"), "MJPG"
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*fourcc), fps, (w, h)
    )
    assert writer.isOpened(), (
        f"cannot open video writer for {out_path} (fourcc {fourcc})"
    )
    from eop_tpu.data.augment import preproc

    ok, first = cap.read()
    assert ok, f"empty video {src}"
    infer = demo.load([preproc(first, demo.exp.test_size)[0][None]])
    frames, t0 = 0, time.perf_counter()
    ok, frame = True, first
    while ok:
        rows, r = demo.detect(infer, frame)
        writer.write(demo.draw(frame, rows, r))
        frames += 1
        ok, frame = cap.read()
    cap.release()
    writer.release()
    dt = time.perf_counter() - t0
    print(f"{frames} frames -> {out_path} "
          f"({frames / dt:.1f} fps incl. compile+IO)")


def main():
    args = make_parser().parse_args()
    from eop_tpu.exp import get_exp

    exp = get_exp(args.exp_file, args.name)
    if args.opts:
        exp.merge(args.opts)
    demo = Demo(exp, args)

    save_dir = args.save_dir or os.path.join(
        exp.output_dir, exp.exp_name,
        time.strftime("vis_%Y_%m_%d_%H_%M_%S", time.localtime()),
    )
    os.makedirs(save_dir, exist_ok=True)

    kind, src = collect_inputs(args.path)
    if kind == "video":
        run_video(demo, src, save_dir)
    else:
        run_images(demo, src, save_dir)
    return save_dir


if __name__ == "__main__":
    from eop_tpu.utils.logger import catch

    catch(main)()
