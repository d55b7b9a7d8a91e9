"""Abstract experiment config ("Exp") base.

Parity target: `BaseExp` (`/root/reference/yolox/exp/base_exp.py:17-75`) —
the experiment object is both configuration and factory (model, data,
optimizer, scheduler, evaluator), printable as a table, with CLI override
via ``merge(["key", "value", ...])`` and type coercion.
"""

from __future__ import annotations

import ast
import pprint
from abc import ABCMeta, abstractmethod

from tabulate import tabulate


class BaseExp(metaclass=ABCMeta):
    """Basic class for any experiment."""

    def __init__(self):
        self.seed = None
        self.output_dir = "./eop_outputs"
        self.print_interval = 100
        self.eval_interval = 10

    @abstractmethod
    def get_model(self):
        pass

    @abstractmethod
    def get_data_loader(self, batch_size: int, is_distributed: bool):
        pass

    @abstractmethod
    def get_optimizer(self, batch_size: int, iters_per_epoch: int):
        pass

    @abstractmethod
    def get_lr_scheduler(self, lr: float, iters_per_epoch: int, **kwargs):
        pass

    def get_evaluator(self, batch_size: int, is_distributed: bool):
        raise NotImplementedError

    def eval(self, model_variables, evaluator):
        raise NotImplementedError

    def _nms_iters(self):
        """Map the exp's ``nms_mode`` to a `_suppress` fixpoint argument:
        ``"exact"`` (default) -> the stationarity-checked adaptive loop
        (greedy-exact for any chain depth; also measured faster than the
        old scaled budget, tools/bench_postprocess.py); an int -> that
        fixed iteration budget; ``"budget"`` -> 64, the old scaled default
        at the 512-candidate capacity (only wanted for a hard static
        schedule)."""
        mode = getattr(self, "nms_mode", "exact")
        if isinstance(mode, int) and not isinstance(mode, bool):
            return mode
        return "exact" if mode == "exact" else 64

    def _infer_model(self, model, batch, quant_scales=None,
                     batch_divisor=1):
        """Pick the early-backbone layout for an inference program.

        The packed layout (``ops/packed.py``) wins inference below the MXU
        saturation batch and loses above it (measured on v5e @640, 24p-s
        e2e: 1.18–1.99x for B ≤ 64, 0.90x at B ≥ 128 — BASELINE.md round
        3), so programs are built packed when the *per-device* batch is at
        most ``packed_infer_max_batch``.  Parameters are layout-
        independent, so this is purely a program-build decision —
        ``jax.jit`` retraces per input shape and each shape gets the right
        layout.  int8 PTQ composes with either layout (round 4): scales
        are keyed layout-invariantly (``<module>/conv``, see
        `ops/quant.packed_act_scale`), and in the packed layout the early
        stages' 4x channel widening lifts them over the int8 channel gate
        their fine form fails.
        """
        packed = getattr(model, "packed_early", False)
        per_device = batch // max(1, batch_divisor)
        if packed and per_device <= getattr(self, "packed_infer_max_batch",
                                            64):
            return model.clone(packed_early=True)
        return model

    def _forward(self, model, variables, imgs, quant_scales=None,
                 quant_min_channels=64, batch_divisor=1):
        """``model.apply`` with optional int8-quantized conv compute and
        batch-aware early-backbone layout (:meth:`_infer_model`).

        Shared by every inference/serving body in both families so the
        quantized path is one code path, not a copy per entry point.
        """
        model = self._infer_model(model, imgs.shape[0], quant_scales,
                                  batch_divisor)
        if quant_scales:
            from ..ops.quant import quantized

            with quantized(quant_scales, quant_min_channels):
                return model.apply(variables, imgs, False)
        return model.apply(variables, imgs, False)

    def quantize_for_inference(self, model, variables, calib_batches,
                               min_channels=64):
        """Prepare int8 PTQ deployment state: fold BN into the convs,
        then calibrate per-conv activation scales on ``calib_batches``
        (an iterable of preprocessed image batches, uint8 or float).

        Returns ``(deploy_variables, act_scales)`` — feed both to
        ``get_quant_infer_fn``/``get_serving_fn``.  Capability beyond
        the reference: its fastest eval mode is fp16 autocast
        (`yolox/evaluators/coco_evaluator.py:139-142`); on TPU the MXU
        doubles throughput again at int8.
        """
        import jax
        from flax import linen as nn

        from ..ops import quant
        from ..utils.model_utils import fuse_conv_bn

        # calibration observes the fine layout: packing is a permutation,
        # so per-conv absmax is layout-invariant and the scales (keyed
        # ``<module>/conv``) serve programs of either layout.  The
        # observation gate is 4x lower than the quant gate so the convs
        # that only become int8-eligible when packing widens their
        # channels 4x still get calibrated scales.
        if getattr(model, "packed_early", False):
            model = model.clone(packed_early=False)
        observe_min = max(1, min_channels // 4)

        if "batch_stats" in variables:
            fused_p, fused_s = fuse_conv_bn(
                variables["params"], variables["batch_stats"]
            )
            variables = dict(variables, params=fused_p, batch_stats=fused_s)

        @jax.jit
        def observe(imgs):
            imgs = imgs.astype("float32")
            with nn.intercept_methods(
                quant.observe_interceptor(observe_min)
            ):
                _, stats = model.apply(
                    variables, imgs, False, mutable=[quant.QUANT_STATS]
                )
            return stats

        scales = quant.calibrate_act_scales(
            lambda b: jax.device_get(observe(b)), calib_batches
        )
        return variables, scales

    def get_quant_infer_fn(self, model, variables, calib_batches,
                           min_channels=64):
        """Jitted int8-PTQ inference handle (forward + decode + NMS with
        eligible convs running on the MXU's int8 path).

        Returns ``(infer_fn, act_scales)``.  Requires the family to
        define ``_infer_body`` (both bbox and 24p bases do).
        """
        import jax

        variables, scales = self.quantize_for_inference(
            model, variables, calib_batches, min_channels
        )
        body = self._infer_body(
            model, variables, quant_scales=scales,
            quant_min_channels=min_channels,
        )
        return jax.jit(body), scales

    def __repr__(self):
        table_header = ["keys", "values"]
        exp_table = [
            (str(k), pprint.pformat(v))
            for k, v in vars(self).items()
            if not k.startswith("_")
        ]
        return tabulate(exp_table, headers=table_header,
                        tablefmt="fancy_grid")

    def merge(self, cfg_list):
        """CLI override: alternating key/value strings (ref `merge:63-75`)."""
        assert len(cfg_list) % 2 == 0
        for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
            if hasattr(self, k):
                src_value = getattr(self, k)
                src_type = type(src_value)
                if src_value is None and isinstance(v, str):
                    # None-default attrs (seed, data_dir, random_size...):
                    # parse literals, keep plain strings as strings
                    try:
                        v = ast.literal_eval(v)
                    except (ValueError, SyntaxError):
                        pass
                elif src_value is not None and src_type != type(v):
                    if src_type in (tuple, list, dict, bool):
                        # container/bool targets: parse the literal, then
                        # cast (naive tuple("(1,2)") would char-split)
                        v = src_type(ast.literal_eval(v))
                    else:
                        try:
                            v = src_type(v)
                        except Exception:
                            v = ast.literal_eval(v)
                setattr(self, k, v)
