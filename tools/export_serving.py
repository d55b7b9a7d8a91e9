"""Export the fused serving program to a portable StableHLO artifact.

Freezes letterbox + forward + decode + NMS (with the checkpoint's
weights baked in) into one ``jax.export`` blob that any JAX process can
load and run without this repo's model code:

    python tools/export_serving.py -f load_eval/yolox_24p_eval.py \
        -w runs/yolox_24p/best_ckpt --batch 8 --src-hw 720,1280 \
        --out serving_24p.stablehlo [--platforms tpu,cpu] [--smoke]

Load side (anywhere with jax; the artifact is a small JSON-metadata
header — test_size etc. — followed by the StableHLO blob):

    from eop_tpu.utils.serving_export import load_serving_artifact
    exported, meta = load_serving_artifact("serving_24p.stablehlo",
                                           with_meta=True)
    out = exported.call(raw_uint8)   # {"rows": [B,max_det,D], "valid": [B,max_det]}

(or strip the header by hand — magic b"EOPSRV1\\n" + 4-byte BE length +
JSON — and ``jax.export.deserialize`` the rest; no framework needed.)
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


def main():
    args = make_parser().parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eop_tpu.exp import get_exp
    from eop_tpu.models import init_model
    from eop_tpu.utils.serving_export import (
        calibration_batch,
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
        on_host=True,
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
        calib = calibration_batch(args.calib, src_hw, exp.test_size)
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
    # metadata travels with the blob: the serving site must never have to
    # hand-supply test_size (a wrong value silently mis-scales every
    # returned coordinate — DetectionService.from_artifact reads it back)
    meta = {
        "test_size": list(exp.test_size),
        "src_hw": list(src_hw),
        "batch": args.batch,
        "num_classes": exp.num_classes,
        "int8": bool(args.int8),
    }
    size = save_serving_artifact(exported, args.out, meta=meta)
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
