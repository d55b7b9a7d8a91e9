"""Load modules from the read-only reference repo for parity testing.

The reference imports some packages absent from this image (torchvision,
loguru, pycocotools); we stub those in sys.modules *of the test process
only* — the reference tree itself is never modified.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

REF = "/root/reference"


def _ensure_stub(name: str, **attrs) -> types.ModuleType:
    if name in sys.modules:
        # a foreign module may already occupy the name (e.g. a stray
        # top-level `utils`); graft the needed attrs onto it so the
        # reference's `from utils import ...` still resolves
        mod = sys.modules[name]
        for k, v in attrs.items():
            if not hasattr(mod, k):
                setattr(mod, k, v)
        return mod
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _DummyLogger:
    def __getattr__(self, _):
        def _noop(*a, **k):
            return None

        return _noop

    def catch(self, *a, **k):
        if a and callable(a[0]):
            return a[0]
        return lambda f: f


def install_stubs():
    _ensure_stub("loguru", logger=_DummyLogger())
    tv = _ensure_stub("torchvision")
    ops = _ensure_stub("torchvision.ops")
    tv.ops = ops

    def _unavailable(*a, **k):
        raise NotImplementedError("torchvision stub")

    ops.nms = _unavailable
    ops.batched_nms = _unavailable
    _ensure_stub("thop", profile=_unavailable)


def _synthetic_package(alias: str, path: str) -> types.ModuleType:
    if alias in sys.modules:
        return sys.modules[alias]
    pkg = types.ModuleType(alias)
    pkg.__path__ = [path]
    pkg.__package__ = alias
    sys.modules[alias] = pkg
    return pkg


def _load_file(alias: str, file_path: str) -> types.ModuleType:
    if alias in sys.modules:
        return sys.modules[alias]
    spec = importlib.util.spec_from_file_location(alias, file_path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[alias] = mod
    spec.loader.exec_module(mod)
    return mod


def ref_models():
    """The reference `yolox/models` package (torch), stubs installed."""
    install_stubs()
    # yolo_head does `from yolox.utils import bboxes_iou`: provide the REAL
    # reference implementation under that name (boxes.py only needs the
    # torchvision stub at import time).
    if "yolox" not in sys.modules:
        boxes = _load_file("_ref_yolox_boxes", f"{REF}/yolox/utils/boxes.py")
        fake_yolox = _ensure_stub("yolox")
        fake_utils = _ensure_stub("yolox.utils",
                                  bboxes_iou=boxes.bboxes_iou,
                                  postprocess=boxes.postprocess)
        fake_yolox.utils = fake_utils
    _synthetic_package("ref_models", f"{REF}/yolox/models")
    return importlib.import_module("ref_models")


def ref_module(name: str):
    """Import `ref_models.<name>` (e.g. 'darknet', 'yolo_pafpn')."""
    ref_models()
    return importlib.import_module(f"ref_models.{name}")


def ref_24p_losses():
    """The reference 24p loss module (`yolox_24p/models/losses.py`)."""
    install_stubs()
    if "utils" not in sys.modules or not hasattr(
        sys.modules.get("utils"), "bboxes_iou"
    ):
        boxes24 = _load_file(
            "_ref_24p_boxes", f"{REF}/yolox_24p/utils/boxes.py"
        )
        _ensure_stub("utils",
                     bboxes_iou=boxes24.bboxes_iou,
                     postprocess=boxes24.postprocess)
    _synthetic_package("ref_models_24p", f"{REF}/yolox_24p/models")
    return importlib.import_module("ref_models_24p.losses")


def ref_24p_boxes():
    install_stubs()
    return _load_file("_ref_24p_boxes", f"{REF}/yolox_24p/utils/boxes.py")


def ref_24p_model(depth: float, width: float, num_classes: int):
    """Build the reference's torch YOLOX-24p model (CSPDarknet PAFPN +
    26-channel head, `yolox_24p/models/`), eval mode on CPU."""
    ref_24p_losses()  # installs the `utils` stub + ref_models_24p package
    pafpn_mod = importlib.import_module("ref_models_24p.yolo_pafpn")
    head_mod = importlib.import_module("ref_models_24p.yolo_head_24p")
    yolox_mod = importlib.import_module("ref_models_24p.yolox")
    model = yolox_mod.YOLOX(
        backbone=pafpn_mod.YOLOPAFPN(depth=depth, width=width),
        head=head_mod.YOLOXHead(num_classes, width=width),
    )
    return model.eval()


def ref_demo_featuremap():
    """Import the reference's demo_featuremap.py (all logic is under the
    __main__ guard, so the import is side-effect free).  Its heavy imports
    (pycocotools, prettytable, exp plumbing) are stubbed; seaborn and
    matplotlib are real."""
    install_stubs()
    ref_models()  # installs the fake yolox package w/ real utils.postprocess
    yolox_pkg = sys.modules["yolox"]
    if not hasattr(yolox_pkg, "data"):
        fake_data = _ensure_stub("yolox.data", ValTransform=object)
        fake_da = _ensure_stub("yolox.data.data_augment", ValTransform=object)
        fake_ds = _ensure_stub("yolox.data.datasets", COCO_CLASSES=())
        fake_data.data_augment = fake_da
        fake_data.datasets = fake_ds
        yolox_pkg.data = fake_data
        fake_exp = _ensure_stub("yolox.exp", get_exp=lambda *a, **k: None)
        yolox_pkg.exp = fake_exp
        u = sys.modules["yolox.utils"]
        u.get_model_info = lambda *a, **k: ""
        u.vis = lambda *a, **k: None
    _ensure_stub("pycocotools")
    _ensure_stub("pycocotools.coco", COCO=object)
    _ensure_stub("pycocotools.cocoeval", COCOeval=object)
    sys.modules["pycocotools"].coco = sys.modules["pycocotools.coco"]
    sys.modules["pycocotools"].cocoeval = sys.modules["pycocotools.cocoeval"]
    _ensure_stub("prettytable", PrettyTable=object)
    import matplotlib

    matplotlib.use("Agg")
    return _load_file("_ref_demo_featuremap",
                      f"{REF}/yolox/demo_featuremap.py")


import contextlib


@contextlib.contextmanager
def cpu_torch_factories():
    """Strip ``device=`` kwargs from the torch factory functions for the
    duration of the block.

    The reference hardcodes CUDA devices inside its hot paths
    (`yolox_24p/models/losses.py:561,566` builds bool masks on 'cuda:0';
    `yolox_24p/models/yolo_head_24p.py:176` builds expanded_strides on
    'cuda'), so running its training forward on CPU needs the kwargs
    dropped.  The reference tree itself is never modified."""
    import torch

    orig = {}

    def wrap(name):
        fn = getattr(torch, name)
        orig[name] = fn

        def patched(*args, **kwargs):
            kwargs.pop("device", None)
            return fn(*args, **kwargs)

        setattr(torch, name, patched)

    for name in ("zeros", "arange", "tensor", "full", "ones"):
        wrap(name)
    try:
        yield
    finally:
        for name, fn in orig.items():
            setattr(torch, name, fn)


def apply_init_yolo(torch_model):
    """The reference's get_model BN re-init: eps 1e-3, momentum 0.03
    (`yolox/exp/yolox_base.py:76-80`)."""
    import torch.nn as nn

    for m in torch_model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.03
    return torch_model
