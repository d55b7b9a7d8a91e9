"""Production detection server: dynamic batching over the fused program.

Serves either family's fused serving step (on-device uint8 letterbox +
forward + decode + NMS) over HTTP with dynamic request batching —
concurrent clients coalesce into full device batches (eop_tpu/serving/).

From an exp + checkpoint:

    python tools/serve.py -f load_eval/yolox_24p_eval.py -w runs/best_ckpt \
        --batch 16 --src-hw 720,1280 --port 8000 [--int8 --calib imgs/] \
        [--max-wait-ms 5] [opts...]

From a portable StableHLO artifact (no model code / checkpoint needed
beyond the blob — tools/export_serving.py):

    python tools/serve.py --artifact serving.stablehlo --port 8000
    # (test_size/batch/src_hw come from the artifact's metadata)

Client:

    curl -s -X POST --data-binary @frame.jpg localhost:8000/v1/detect
    curl -s localhost:8000/v1/stats

The reference has no serving path (its demo re-runs eager per-image
torch, `/root/reference/yolox_24p/show_24p.py:266-305`).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("serve")
    p.add_argument("-n", "--name", type=str, default=None)
    p.add_argument("-f", "--exp_file", type=str, default=None)
    p.add_argument("-w", "--weights", type=str, default=None,
                   help="orbax ckpt dir or reference torch .pth")
    p.add_argument("--artifact", type=str, default=None,
                   help="StableHLO blob from tools/export_serving.py "
                        "(replaces -f/-w)")
    p.add_argument("--test-size", type=str, default=None,
                   help="model input H,W for a pre-metadata artifact "
                        "(newer artifacts carry it; a mismatch would "
                        "silently mis-scale coordinates)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--src-hw", type=str, default=None,
                   help="H,W of the serving canvas (default: test_size); "
                        "pick the camera's native size for zero host work")
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="batching window after the first request")
    p.add_argument("--max-queue", type=int, default=256)
    p.add_argument("--frontend", choices=["async", "threaded"],
                   default="async",
                   help="HTTP front end: selectors event loop (default; "
                        "scales to hundreds of persistent connections) "
                        "or stdlib thread-per-connection")
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ (calibrate on --calib images)")
    p.add_argument("--calib", type=str, default=None)
    p.add_argument("--quant-min-channels", type=int, default=64)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[],
                   help="exp overrides: key value ...")
    return p


def _parse_hw(text: str):
    parts = tuple(int(v) for v in text.split(","))
    if len(parts) != 2:
        raise SystemExit(f"expected H,W (two comma-separated ints), "
                         f"got {text!r}")
    return parts


def build_service(args):
    from eop_tpu.serving import DetectionService

    if args.artifact:
        # the blob's input spec fixes these — a silently ignored flag
        # would make the operator believe they changed something
        for flag, default in (("--batch", 16), ("--src-hw", None)):
            name = flag.lstrip("-").replace("-", "_")
            if getattr(args, name) != default:
                raise SystemExit(f"{flag} is baked into the artifact; "
                                 "re-export to change it")
        ts = _parse_hw(args.test_size) if args.test_size else None
        return DetectionService.from_artifact(
            args.artifact, ts, max_wait_ms=args.max_wait_ms,
            max_queue=args.max_queue,
        )

    import jax
    import jax.numpy as jnp

    from eop_tpu.exp import get_exp
    from eop_tpu.models import init_model
    from eop_tpu.utils.setup_env import enable_compile_cache

    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    ))
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
    else:
        print("WARNING: serving RANDOM weights (no -w) — smoke use only")

    src_hw = (_parse_hw(args.src_hw)
              if args.src_hw else tuple(exp.test_size))
    quant_scales = None
    if args.int8:
        from eop_tpu.utils.serving_export import calibration_batch

        calib = calibration_batch(args.calib, src_hw, exp.test_size)
        variables, quant_scales = exp.quantize_for_inference(
            model, variables, [calib], args.quant_min_channels
        )
        print(f"int8 PTQ: {len(quant_scales)} convs quantized")

    class_names = None
    if exp.num_classes == 80:
        from eop_tpu.data.coco_classes import COCO_CLASSES

        class_names = COCO_CLASSES
    return DetectionService.from_exp(
        exp, model, variables, args.batch, src_hw,
        quant_scales=quant_scales,
        quant_min_channels=args.quant_min_channels,
        class_names=class_names, max_wait_ms=args.max_wait_ms,
        max_queue=args.max_queue,
    )


def main():
    args = make_parser().parse_args()
    from eop_tpu.serving import make_async_http_server, make_http_server

    print("building + compiling the serving program "
          "(first build can take a minute)...")
    service = build_service(args)
    # event-loop front end by default: a single IO thread multiplexes
    # every connection, so hundreds of persistent clients never hit the
    # thread-per-connection resets the round-4 load test exposed
    make_server = (make_http_server if args.frontend == "threaded"
                   else make_async_http_server)
    server = make_server(service, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port}  "
          f"batch={service.batch} src_hw={service.src_hw} "
          f"test_size={service.test_size} "
          f"window={args.max_wait_ms}ms", flush=True)
    print("  POST /v1/detect (image bytes) | GET /v1/stats | GET /healthz",
          flush=True)
    warm = service.stats().get("warm_buckets", [])
    if len(warm) < len(getattr(service, "buckets", warm)):
        print(f"  bucket programs warm: {warm} of {service.buckets} — "
              "the rest compile in the background (requests pad to the "
              "largest warm bucket meanwhile; progress in /v1/stats)",
              flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
