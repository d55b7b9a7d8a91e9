"""DetectionService: images in, detection dicts out, batched on-device.

Wraps the fused serving program (``exp.get_serving_fn`` — on-device
uint8 letterbox + forward + decode + NMS — or a portable StableHLO
artifact from ``tools/export_serving.py``) behind a ``DynamicBatcher``:

    svc = DetectionService.from_exp(exp, model, variables, batch=16,
                                    src_hw=(720, 1280))
    dets = svc.detect(frame_bgr)     # any HxW uint8 image, thread-safe

The serving program's input shape is static (``[batch, *src_hw, 3]``
uint8).  Arbitrary client images are letterboxed onto that canvas on the
host (uint8, pad 114 — the same convention as training,
`/root/reference/yolox/data/data_augment.py:144-160`); the device
program letterboxes ``src_hw -> test_size`` again.  Both ratios are
composed and divided back out, so returned coordinates are in the
ORIGINAL image's pixel space.  Pick ``src_hw`` = the camera's native
resolution and the host does no pixel work at all (same-size frames
skip the canvas entirely and the single resize happens on device).

The reference has no serving path — its closest analogue re-runs eager
per-image torch (`/root/reference/yolox_24p/show_24p.py:266-305`).
"""

from __future__ import annotations

import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .batcher import DynamicBatcher

# the one letterbox pad convention, shared with the device-side letterbox
# (data/transforms.py) and the training preproc (data/augment.py)
from ..data.transforms import PAD_VALUE as _PAD_F

PAD_VALUE = int(_PAD_F)


def _host_letterbox(img: np.ndarray, src_hw: Tuple[int, int]):
    """uint8 HWC image -> (uint8 [*src_hw, 3] canvas, ratio)."""
    import cv2

    h, w = img.shape[:2]
    if (h, w) == tuple(src_hw):
        return np.ascontiguousarray(img), 1.0
    r = min(src_hw[0] / h, src_hw[1] / w)
    nh, nw = int(h * r), int(w * r)
    canvas = np.full((src_hw[0], src_hw[1], 3), PAD_VALUE, np.uint8)
    canvas[:nh, :nw] = cv2.resize(img, (nw, nh),
                                  interpolation=cv2.INTER_LINEAR)
    return canvas, r


def _polygon_points(center_xy: np.ndarray, radii: np.ndarray) -> np.ndarray:
    """Decode 24 radii to xy vertices — the correct-math convention the
    reference's own drawing path uses (`show_24p.py:346-353`); the
    θ·cosθ NMS quirk never leaks into responses."""
    from ..ops.polygon import COS_ANGLES, SIN_ANGLES

    x = center_xy[0] + radii * COS_ANGLES
    y = center_xy[1] + radii * SIN_ANGLES
    return np.stack([x, y], axis=-1)


class DetectionService:
    """Thread-safe, dynamically batched detection over one device program.

    ``serve_fn``: ``uint8 [batch, *src_hw, 3] -> Detections`` (or the
    artifact's ``{"rows", "valid"}`` dict).  ``test_size`` is the model
    input the device program letterboxes to — needed to undo that ratio.
    """

    def __init__(self, serve_fn, batch: int, src_hw: Tuple[int, int],
                 test_size: Tuple[int, int],
                 class_names: Optional[Sequence[str]] = None,
                 max_wait_ms: float = 5.0, max_queue: int = 256,
                 max_queue_bytes: Optional[int] = 1 << 30,
                 warmup: bool = True,
                 buckets: Optional[Sequence[int]] = None):
        self._serve_fn = serve_fn
        self.batch = int(batch)
        self.src_hw = tuple(int(v) for v in src_hw)
        self.test_size = tuple(int(v) for v in test_size)
        self.class_names = list(class_names) if class_names else None
        # Batch-size buckets: a partial batch is padded only up to the
        # smallest compiled bucket that fits, not to ``batch`` — padding
        # waste (host->device bytes AND device FLOPs are both linear in
        # the padded size) tracks the actual load.  Static shapes mean
        # one compiled program per bucket; default: powers of two.
        if buckets is None:
            buckets = [b for b in (1, 2, 4, 8, 16, 32, 64, 128, 256)
                       if b < self.batch] + [self.batch]
        self.buckets = sorted(set(int(b) for b in buckets))
        if self.buckets[-1] != self.batch:
            raise ValueError(
                f"largest bucket {self.buckets[-1]} != batch {self.batch}"
            )
        # the device program's letterbox ratio (static: both shapes fixed)
        self.dev_ratio = min(self.test_size[0] / self.src_hw[0],
                             self.test_size[1] / self.src_hw[1])
        self._pad_canvas = np.full(
            (1, *self.src_hw, 3), PAD_VALUE, np.uint8
        )
        self._bucket_hits = {b: 0 for b in self.buckets}
        # Background warmup (round 4; same design as the trainers'
        # multiscale prewarm, train/prewarm.py): a cold start used to
        # compile every bucket program serially before accepting a single
        # request — measured ~25 min for 7 buckets of the 24p-s fused
        # serving program on the build host.  Now only the LARGEST bucket
        # (which can serve any partial batch by padding) compiles before
        # the service reports ready; the rest compile on a daemon thread,
        # and dispatch pads to the smallest bucket that is both big
        # enough and already compiled.
        self._warm_lock = threading.Lock()
        self._warm: set = set()
        self._warm_failed: dict = {}  # bucket -> repr(exception)
        if warmup:
            self._device_call(
                np.zeros((self.batch, *self.src_hw, 3), np.uint8)
            )
            with self._warm_lock:
                self._warm.add(self.batch)

            def _warm_rest():
                for b in self.buckets:
                    with self._warm_lock:
                        if b in self._warm:
                            continue
                    try:
                        self._device_call(
                            np.zeros((b, *self.src_hw, 3), np.uint8)
                        )
                    except Exception as e:  # noqa: BLE001
                        # the largest bucket still serves — but record and
                        # surface the failure (stats.warm_failed) so
                        # wait_warm() terminates instead of blocking on a
                        # bucket that will never compile (ADVICE r4)
                        import logging

                        logging.getLogger("eop_tpu.serving").warning(
                            "bucket %d warmup failed: %r", b, e
                        )
                        with self._warm_lock:
                            self._warm_failed[b] = repr(e)
                        continue
                    with self._warm_lock:
                        self._warm.add(b)

            threading.Thread(target=_warm_rest, name="eop-serve-warm",
                             daemon=True).start()
        else:
            # no warmup: every bucket is fair game (first use compiles
            # lazily, blocking that batch) — the test-friendly mode
            self._warm.update(self.buckets)
        # each queued request pins a full src_hw canvas on the host, so
        # the queue must be bounded in BYTES too (256 queued 4K canvases
        # are ~6.4 GB — a count bound alone under-protects); default 1 GiB
        self._canvas_bytes = int(np.prod(self.src_hw)) * 3
        self._batcher = DynamicBatcher(
            self._run_batch, max_batch=self.batch,
            max_wait_ms=max_wait_ms, max_queue=max_queue,
            max_queue_cost=max_queue_bytes,
        )

    # ------------------------------------------------------- constructors

    @classmethod
    def from_exp(cls, exp, model, variables, batch: int,
                 src_hw: Optional[Tuple[int, int]] = None,
                 quant_scales=None, quant_min_channels: int = 64,
                 class_names=None, **kw) -> "DetectionService":
        src_hw = tuple(src_hw or exp.test_size)
        serve = exp.get_serving_fn(
            model, variables, src_hw, quant_scales=quant_scales,
            quant_min_channels=quant_min_channels,
        )
        return cls(serve, batch, src_hw, tuple(exp.test_size),
                   class_names=class_names, **kw)

    @classmethod
    def from_artifact(cls, path: str,
                      test_size: Optional[Tuple[int, int]] = None,
                      class_names=None, **kw) -> "DetectionService":
        """Serve a StableHLO blob — no model code or checkpoint needed.
        Batch and ``src_hw`` come from the artifact's input spec;
        ``test_size`` and class names come from the artifact's metadata
        (a hand-supplied wrong test_size would silently mis-scale every
        coordinate, so the export bakes it in — pass it explicitly only
        for pre-metadata blobs).  The artifact carries ONE compiled
        shape, so every dispatch pads to its full batch (no bucketing —
        export several artifacts and run several services if
        partial-batch waste matters)."""
        from ..utils.serving_export import load_serving_artifact

        exported, meta = load_serving_artifact(path, with_meta=True)
        if test_size is None:
            if "test_size" not in meta:
                raise ValueError(
                    f"{path} carries no test_size metadata (pre-metadata "
                    "blob?) — pass test_size= explicitly"
                )
            test_size = tuple(meta["test_size"])
        if class_names is None:
            class_names = meta.get("class_names")
        (aval,) = exported.in_avals
        b, h, w, _ = aval.shape
        return cls(exported.call, b, (h, w), test_size,
                   class_names=class_names, buckets=[b], **kw)

    # ------------------------------------------------------------- public

    def detect(self, img: np.ndarray,
               timeout: Optional[float] = 30.0) -> List[dict]:
        """Detect on one uint8 HWC (BGR) image of any size; blocks until
        its batch completes.  Returns one dict per detection with
        coordinates in the input image's pixel space."""
        if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
            raise ValueError(
                f"expected uint8 HWC 3-channel image, got "
                f"{img.dtype}{list(img.shape)}"
            )
        return self._batcher.submit(_host_letterbox(img, self.src_hw),
                                    timeout=timeout,
                                    cost=self._canvas_bytes)

    def detect_async(self, img: np.ndarray, callback) -> None:
        """Non-blocking :meth:`detect`: ``callback(dets, error)`` fires
        from the batcher's dispatcher thread when the batch settles.
        Admission failures (``QueueFullError`` / ``BatcherClosedError``)
        raise synchronously and never invoke the callback — the
        event-loop HTTP front end maps them to 429/503 inline."""
        if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
            raise ValueError(
                f"expected uint8 HWC 3-channel image, got "
                f"{img.dtype}{list(img.shape)}"
            )
        self._batcher.submit_nowait(
            _host_letterbox(img, self.src_hw), callback,
            cost=self._canvas_bytes,
        )

    def wait_warm(self, timeout: Optional[float] = None) -> bool:
        """Block until every bucket program is compiled (or ``timeout``
        seconds elapse); returns whether all are warm.  The service is
        usable before this — cold buckets just pad up to the largest."""
        import time as _time

        deadline = None if timeout is None else _time.time() + timeout
        while True:
            with self._warm_lock:
                if len(self._warm) == len(self.buckets):
                    return True
                # every remaining bucket failed to compile: settled — a
                # timeout=None wait must not spin forever on buckets that
                # will never warm (ADVICE r4)
                if len(self._warm) + len(self._warm_failed) >= \
                        len(self.buckets):
                    return False
            if deadline is not None and _time.time() >= deadline:
                return False
            _time.sleep(0.05)

    def stats(self) -> dict:
        s = self._batcher.stats()
        with self._warm_lock:
            warm = sorted(self._warm)
            failed = dict(sorted(self._warm_failed.items()))
        s.update(src_hw=list(self.src_hw), test_size=list(self.test_size),
                 class_names=bool(self.class_names),
                 bucket_hits={str(k): v
                              for k, v in self._bucket_hits.items() if v},
                 warm_buckets=warm)
        if failed:
            s["warm_failed"] = {str(k): v for k, v in failed.items()}
        return s

    def close(self) -> None:
        self._batcher.close()

    # ------------------------------------------------------------ batched

    def _device_call(self, canvases: np.ndarray):
        out = self._serve_fn(canvases)
        if isinstance(out, dict):  # artifact surface
            rows, valid = out["rows"], out["valid"]
        else:  # Detections namedtuple
            rows, valid = out.rows, out.valid
        # host fetch = the only real synchronization over the axon tunnel
        return np.asarray(rows), np.asarray(valid)

    def _run_batch(self, items) -> List[List[dict]]:
        n = len(items)
        with self._warm_lock:
            warm = self._warm.copy()
        # smallest bucket that fits AND is compiled; the largest bucket
        # is always warm, so a cold start pads to it rather than jitting
        # mid-request
        bucket = next(b for b in self.buckets if b >= n and b in warm)
        self._bucket_hits[bucket] += 1
        canvases = np.concatenate(
            [c[None] for c, _ in items]
            + [self._pad_canvas] * (bucket - n)
        )
        rows, valid = self._device_call(canvases)
        return [
            self._to_dicts(rows[i], valid[i], items[i][1])
            for i in range(n)
        ]

    def _to_dicts(self, rows: np.ndarray, valid: np.ndarray,
                  host_ratio: float) -> List[dict]:
        ratio = self.dev_ratio * host_ratio
        out = []
        d = rows.shape[-1]
        for row in rows[valid.astype(bool)]:
            obj, cls_conf, cls_id = (
                float(row[d - 3]), float(row[d - 2]), int(row[d - 1])
            )
            det = {
                "class_id": cls_id,
                "score": obj * cls_conf,
                "obj": obj,
                "cls_conf": cls_conf,
            }
            if self.class_names:
                det["class_name"] = self.class_names[cls_id]
            if d == 7:        # bbox family: x1 y1 x2 y2 obj conf cls
                det["bbox"] = (row[:4] / ratio).tolist()
            elif d == 29:     # 24p family: x y r1..r24 obj conf cls
                center = row[:2] / ratio
                radii = row[2:26] / ratio
                det["center"] = center.tolist()
                det["radii"] = radii.tolist()
                det["points"] = _polygon_points(center, radii).tolist()
            else:  # pragma: no cover — future families
                det["raw"] = row[: d - 3].tolist()
            out.append(det)
        return out
