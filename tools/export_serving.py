"""Export the fused serving program to a portable StableHLO artifact.

Freezes letterbox + forward + decode + NMS (with the checkpoint's
weights baked in) into one ``jax.export`` blob that any JAX process can
load and run without this repo's model code:

    python tools/export_serving.py -f load_eval/yolox_24p_eval.py \
        -w runs/yolox_24p/best_ckpt --batch 8 --src-hw 720,1280 \
        --out serving_24p.stablehlo [--platforms tpu,cpu] [--smoke]

Load side (anywhere):

    from jax import export
    exported = export.deserialize(open("serving_24p.stablehlo","rb").read())
    out = exported.call(raw_uint8)   # {"rows": [B,max_det,D], "valid": [B,max_det]}
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("export_serving")
    p.add_argument("-n", "--name", type=str, default=None)
    p.add_argument("-f", "--exp_file", type=str, default=None)
    p.add_argument("-w", "--weights", type=str, default=None,
                   help="orbax ckpt dir or reference torch .pth "
                        "(omit for random weights — smoke use only)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--src-hw", type=str, default=None,
                   help="H,W of the raw serving input (default: test_size)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--platforms", type=str, default=None,
                   help="comma list, e.g. tpu,cpu (default: current backend)")
    p.add_argument("--smoke", action="store_true",
                   help="deserialize + run the artifact once on zeros")
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ: bake quantized weights, run eligible "
                        "convs on the MXU int8 path (calibrate on --calib)")
    p.add_argument("--calib", type=str, default=None,
                   help="directory of images for int8 calibration "
                        "(serving-preprocessed; uniform noise if omitted "
                        "— smoke use only)")
    p.add_argument("--quant-min-channels", type=int, default=64)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                   help="exp overrides: key value ...")
    return p


def _calib_batch(calib_dir, src_hw, exp, n_max=32):
    """One letterboxed calibration batch, preprocessed exactly as the
    serving program will see its inputs."""
    import glob

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from eop_tpu.data.transforms import letterbox_batch_device

    raws = []
    if calib_dir:
        paths = sorted(
            p for p in glob.glob(os.path.join(calib_dir, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
        )[:n_max]
        for path in paths:
            img = cv2.imread(path)
            if img is not None:
                raws.append(cv2.resize(img, (src_hw[1], src_hw[0])))
    if not raws:
        print("WARNING: no --calib images — calibrating on uniform noise; "
              "accuracy of the exported int8 program is unvalidated")
        raw = np.random.RandomState(0).randint(
            0, 255, (8, src_hw[0], src_hw[1], 3), np.uint8
        )
    else:
        raw = np.stack(raws)
    letterboxed, _ = letterbox_batch_device(
        jnp.asarray(raw, jnp.float32), src_hw, exp.test_size
    )
    return letterboxed


def main():
    args = make_parser().parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eop_tpu.exp import get_exp
    from eop_tpu.models import init_model
    from eop_tpu.utils.serving_export import (
        export_serving,
        load_serving_artifact,
        save_serving_artifact,
    )

    exp = get_exp(args.exp_file, args.name)
    if args.opts:
        exp.merge(args.opts)

    model = exp.get_model()
    variables = init_model(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, exp.test_size[0], exp.test_size[1], 3), jnp.float32),
    )
    if args.weights:
        from eop_tpu.train.checkpoint import load_eval_variables

        variables = load_eval_variables(args.weights, variables)

    src_hw = (
        tuple(int(v) for v in args.src_hw.split(","))
        if args.src_hw else tuple(exp.test_size)
    )
    platforms = args.platforms.split(",") if args.platforms else None
    quant_scales = None
    if args.int8:
        calib = _calib_batch(args.calib, src_hw, exp)
        variables, quant_scales = exp.quantize_for_inference(
            model, variables, [calib], args.quant_min_channels
        )
        print(f"int8 PTQ: {len(quant_scales)} convs quantized "
              f"(min_channels={args.quant_min_channels})")
    exported = export_serving(
        exp, model, variables, args.batch, src_hw, platforms=platforms,
        quant_scales=quant_scales,
        quant_min_channels=args.quant_min_channels,
    )
    size = save_serving_artifact(exported, args.out)
    print(
        f"exported {args.out}: {size / 1e6:.1f} MB, "
        f"platforms={exported.platforms}, "
        f"input=uint8[{args.batch},{src_hw[0]},{src_hw[1]},3]"
    )

    if args.smoke:
        art = load_serving_artifact(args.out)
        out = art.call(
            np.zeros((args.batch, src_hw[0], src_hw[1], 3), np.uint8)
        )
        rows, valid = np.asarray(out["rows"]), np.asarray(out["valid"])
        print(f"smoke: rows{rows.shape} valid{valid.shape} "
              f"n_det={int(valid.sum())}")


if __name__ == "__main__":
    main()
