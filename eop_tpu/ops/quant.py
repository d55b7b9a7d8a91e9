"""Post-training int8 quantization for the inference/serving paths.

TPU-native rationale: the v5e MXU runs int8 at twice the bf16 rate
(394 vs 197 T-ops/s peak), and XLA lowers integer convolutions with
``preferred_element_type=int32`` straight onto it.  The reference has no
quantized path at all (its fastest eval mode is fp16 autocast,
`yolox/evaluators/coco_evaluator.py:139-142`), so this is capability the
rebuild adds beyond parity, in the spirit of "beat the reference on its
own hardware bar".

Scheme — standard symmetric PTQ, re-derived for the flax/XLA stack:

* **weights**: per-output-channel symmetric int8, quantized inside the
  traced program from the BN-folded fp32 kernels.  Under ``jit`` the
  weights are arguments, so quantization is a cheap elementwise op on
  the (small) kernels; under ``jax.export`` serving freeze they are
  constants and the rounding constant-folds away entirely.
* **activations**: per-tensor symmetric int8.  Scales are calibrated by
  running representative batches with an *observer interceptor* that
  ``sow``s each eligible conv input's absmax into a mutable collection —
  no model-code changes, works for every `nn.Conv` in every family.
* **accumulation**: int32 on the MXU; the dequant multiply
  ``(s_x * s_w[c])`` is an elementwise tail XLA fuses into the conv,
  exactly where the BN multiply used to sit.
* **selection**: only non-grouped convs with ``min(C_in, C_out) >=
  min_channels`` run quantized.  In the FINE layout the narrow early
  stages are emitter-bound rather than MXU-bound on TPU (measured,
  BASELINE.md round 3) *and* are the most accuracy-sensitive —
  quantizing them costs accuracy for zero speed.  Depthwise convs
  barely touch the MXU and are skipped likewise.  In the PACKED layout
  (`packed_act_scale`) the gate is applied to the packed channel dims:
  packing multiplies the early stages' channels 4x, which changes the
  SPEED half of the rationale (the convs become MXU-bound matmuls, and
  int8 measurably wins there — BASELINE.md round 4) but not the
  numerics (packing is a permutation, so per-output accumulation depth
  and quantization error are the same as quantizing the fine conv
  would be).  The accuracy half is therefore covered by measurement,
  not by the gate: the packed-int8 path's AP is regression-checked on
  trained checkpoints (BASELINE.md round-4 fisheye drive: AP50 −0.2 /
  AP50:95 −0.7 vs bf16) — re-verify on any new checkpoint family
  before serving it packed-int8.

The mechanism is `flax.linen.intercept_methods`: a context installed
around ``model.apply`` that replaces eligible ``nn.Conv.__call__``s with
the quantized computation.  Model definitions stay untouched — any
backbone/head in the zoo (and any future one built from `nn.Conv`)
quantizes for free.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Iterable, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

# Collection name for calibration observers (kept out of 'intermediates'
# so user sow() calls are never mixed with ours).
QUANT_STATS = "quant_stats"

_INT8_MAX = 127.0


def _module_path(mod: nn.Module) -> str:
    """Stable string key for a bound module: 'backbone/dark3/.../conv'."""
    return "/".join(str(p) for p in mod.path)


def _nontrivial(dilation) -> bool:
    if dilation is None:
        return False
    if isinstance(dilation, int):
        return dilation != 1
    return any(d != 1 for d in dilation)


def _eligible(mod: nn.Module, x: jax.Array, min_channels: int) -> bool:
    if not isinstance(mod, nn.Conv):
        return False
    if mod.feature_group_count != 1:  # depthwise: no MXU win
        return False
    # the quantized replacement reproduces plain strided convs; dilated
    # or circular/causal-padded convs fall through to the fp path
    # rather than being silently mis-computed
    if _nontrivial(mod.kernel_dilation) or _nontrivial(mod.input_dilation):
        return False
    if isinstance(mod.padding, str) and mod.padding.upper() not in (
        "SAME", "VALID"
    ):
        return False
    if x.ndim != 4 or len(mod.kernel_size) != 2:  # NHWC 2-D convs only
        return False
    c_in = x.shape[-1]
    c_out = mod.features
    return min(int(c_in), int(c_out)) >= min_channels


def observe_interceptor(min_channels: int = 64):
    """Interceptor that records each eligible conv input's absmax.

    Run ``model.apply(..., mutable=[QUANT_STATS])`` under
    ``nn.intercept_methods(observe_interceptor(...))``; the returned
    mutable collection maps module paths to scalar absmax values
    (running max within one apply via the sow reduce_fn).
    """

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (
            context.method_name == "__call__"
            and args
            and isinstance(args[0], jax.Array)
            and _eligible(mod, args[0], min_channels)
        ):
            absmax = jnp.max(jnp.abs(args[0].astype(jnp.float32)))
            mod.sow(
                QUANT_STATS,
                "absmax",
                absmax,
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        return next_fun(*args, **kwargs)

    return interceptor


def _flatten_stats(tree: Mapping[str, Any]) -> Dict[str, float]:
    """{'a/b/conv': absmax} from the sown QUANT_STATS collection."""
    out: Dict[str, float] = {}

    def walk(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                if k == "absmax":
                    out["/".join(path)] = float(np.asarray(v))
                else:
                    walk(v, path + (k,))

    walk(tree, ())
    return out


def calibrate_act_scales(
    observe_fn: Callable[[Any], Mapping[str, Any]],
    batches: Iterable[Any],
) -> Dict[str, float]:
    """Run calibration batches, return {conv_path: activation_scale}.

    ``observe_fn(batch)`` must run the model forward the same way
    inference will (same dtypes, same preprocessing) under
    ``observe_interceptor`` with ``mutable=[QUANT_STATS]`` and return
    the sown collection — see ``BaseExp.quantize_for_inference`` for
    the canonical wiring.  Scales are ``absmax / 127`` with the max
    taken across all batches.
    """
    running: Dict[str, float] = {}
    for batch in batches:
        stats = observe_fn(batch)
        stats = stats.get(QUANT_STATS, stats)
        for path, absmax in _flatten_stats(stats).items():
            running[path] = max(running.get(path, 0.0), absmax)
    return {
        path: absmax / _INT8_MAX
        for path, absmax in running.items()
        if absmax > 0.0
    }


def _quantize_kernel(kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 (HWIO kernel)."""
    kernel = kernel.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))  # [O]
    s_w = jnp.where(absmax > 0.0, absmax / _INT8_MAX, 1.0)
    q = jnp.clip(jnp.round(kernel / s_w), -_INT8_MAX, _INT8_MAX)
    return q.astype(jnp.int8), s_w


def quant_interceptor(
    act_scales: Mapping[str, float],
    min_channels: int = 64,
):
    """Interceptor replacing eligible `nn.Conv` calls with int8 compute.

    Convs without a calibrated scale (or below the channel threshold)
    fall through to the normal fp path, so a partially-calibrated model
    still runs correctly.
    """

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if not (
            context.method_name == "__call__"
            and args
            and isinstance(args[0], jax.Array)
            and _eligible(mod, args[0], min_channels)
        ):
            return next_fun(*args, **kwargs)
        s_x = act_scales.get(_module_path(mod))
        if s_x is None or s_x <= 0.0:
            return next_fun(*args, **kwargs)

        x = args[0]
        params = mod.variables["params"]
        kernel = params["kernel"]  # HWIO, fp32
        q_w, s_w = _quantize_kernel(kernel)
        q_x = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s_x), -_INT8_MAX, _INT8_MAX
        ).astype(jnp.int8)

        strides = mod.strides
        if isinstance(strides, int):
            strides = (strides, strides)
        dn = lax.conv_dimension_numbers(
            q_x.shape, q_w.shape, ("NHWC", "HWIO", "NHWC")
        )
        acc = lax.conv_general_dilated(
            q_x,
            q_w,
            window_strides=tuple(strides),
            padding=mod.padding,
            dimension_numbers=dn,
            preferred_element_type=jnp.int32,
        )
        out_dtype = mod.dtype or x.dtype
        y = acc.astype(jnp.float32) * (s_x * s_w)
        if mod.use_bias:
            y = y + params["bias"].astype(jnp.float32)
        return y.astype(out_dtype)

    return interceptor


# Active quant config for the PACKED conv path (`ops/packed.py`): the
# packed early backbone bypasses nn.Conv (its convs are direct
# lax.conv calls on layout-transformed weights), so the interceptor
# can't reach it; `BaseConv`'s packed branch queries this context at
# trace time instead.  contextvars are safe here because interception /
# tracing happens synchronously inside the `quantized()` block.
import contextvars

_PACKED_QUANT: contextvars.ContextVar = contextvars.ContextVar(
    "eop_packed_quant", default=None
)


def packed_act_scale(mod: nn.Module, in_ch: int, out_ch: int):
    """Activation scale for a packed-layout conv, or None to stay fp.

    ``in_ch`` / ``out_ch`` are the channel counts of the conv ACTUALLY
    executed (packed dims — what the MXU contracts over), so the
    ``min_channels`` gate measures real MXU utilization: a fine C=32
    stage runs 128-channel packed convs and clears the default gate its
    fine form fails.  Scales are keyed at ``<module>/conv`` — the same
    key the fine layout's inner ``nn.Conv`` (and the packed kernel
    holder ``_FocusKernel``) occupy — so one calibration (done in the
    fine layout, `BaseExp.quantize_for_inference`) serves programs of
    either layout; absmax is layout-invariant because packing is a
    permutation."""
    cfg = _PACKED_QUANT.get()
    if cfg is None:
        return None
    act_scales, min_channels = cfg
    if min(int(in_ch), int(out_ch)) < min_channels:
        return None
    s_x = act_scales.get(_module_path(mod) + "/conv")
    if s_x is None or s_x <= 0.0:
        return None
    return s_x


@contextlib.contextmanager
def quantized(act_scales: Mapping[str, float], min_channels: int = 64):
    """``with quantized(scales): model.apply(...)`` — int8 conv compute.

    Must be entered *inside* the traced function (interception happens
    at trace time).  Covers both conv paths: fine-layout ``nn.Conv``s via
    the interceptor, packed-layout convs via the `_PACKED_QUANT` context
    consulted in ``BaseConv``'s packed branch."""
    token = _PACKED_QUANT.set((dict(act_scales), min_channels))
    try:
        with nn.intercept_methods(
            quant_interceptor(act_scales, min_channels)
        ):
            yield
    finally:
        _PACKED_QUANT.reset(token)
