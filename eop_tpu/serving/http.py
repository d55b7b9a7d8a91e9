"""Minimal HTTP front end for ``DetectionService`` (stdlib only).

Endpoints:

* ``POST /v1/detect`` — body: an encoded image (JPEG/PNG/BMP, any size),
  or raw uint8 HWC bytes with an ``X-Raw-Shape: H,W,3`` header (skips
  the image decode — the low-overhead path for camera/video pipelines
  that already hold raw frames).
  Response: ``{"detections": [...], "image_hw": [H, W], "ms": float}``
  with coordinates in the posted image's pixel space.
* ``GET /v1/stats``  — batcher/service counters (occupancy, latency
  percentiles, queue depth).
* ``GET /healthz``   — liveness.

Threading model: ``ThreadingHTTPServer`` gives one thread per in-flight
request; every handler blocks in ``DynamicBatcher.submit`` so concurrent
requests coalesce into full device batches (that is the point — see
batcher.py).  Saturation returns 429, decode failures 400, batcher
errors 500; the device program itself never sees a malformed request.
"""

from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .batcher import BatcherClosedError, QueueFullError

MAX_BODY_BYTES = 32 * 1024 * 1024
# cap on DECODED pixels: the body cap does not bound the decoded
# allocation (a ~1 MB PNG can declare 50000x50000 = ~7.5 GB of BGR), so
# dims are read from the container header and checked BEFORE imdecode
MAX_PIXELS = 64 * 1024 * 1024  # 64 MP ≈ 192 MB decoded


def _declared_dims(buf: bytes):
    """(h, w) declared by a JPEG/PNG/BMP header, or None if not parseable.
    Pure header reads — nothing is decoded."""
    if buf[:8] == b"\x89PNG\r\n\x1a\n" and len(buf) >= 24:
        return (int.from_bytes(buf[20:24], "big"),
                int.from_bytes(buf[16:20], "big"))
    if buf[:2] == b"BM" and len(buf) >= 26:
        return (abs(int.from_bytes(buf[22:26], "little", signed=True)),
                int.from_bytes(buf[18:22], "little", signed=True))
    if buf[:2] == b"\xff\xd8":  # JPEG: find the first SOF segment
        i = 2
        while i + 9 < len(buf):
            if buf[i] != 0xFF:
                i += 1
                continue
            marker = buf[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(buf[i + 2:i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (int.from_bytes(buf[i + 5:i + 7], "big"),
                        int.from_bytes(buf[i + 7:i + 9], "big"))
            i += 2 + seg_len
    return None


def decode_request_image(raw: bytes, shape_hdr):
    """Request body -> ``(img, None)`` or ``(None, (status, payload))``.

    ``shape_hdr`` is the ``X-Raw-Shape`` header value (raw uint8 HWC fast
    path) or None (JPEG/PNG/BMP body, bomb-checked before decode).
    Shared by the threaded and event-loop front ends.
    """
    import cv2

    if shape_hdr:
        try:
            shape = tuple(int(v) for v in shape_hdr.split(","))
            if len(shape) != 3 or shape[2] != 3:
                raise ValueError(shape_hdr)
            img = np.frombuffer(raw, np.uint8).reshape(shape)
        except ValueError:
            return None, (400, {
                "error": f"X-Raw-Shape {shape_hdr!r} does not describe "
                         f"the {len(raw)}-byte body as uint8 [H,W,3]",
            })
        return img, None
    # reject decompression bombs BEFORE decoding: the body cap does not
    # bound the decoded allocation
    dims = _declared_dims(raw)
    if dims is None:
        return None, (400, {
            "error": "unsupported or corrupt image format "
                     "(JPEG/PNG/BMP, or raw + X-Raw-Shape)",
        })
    if dims[0] * dims[1] > MAX_PIXELS:
        return None, (413, {
            "error": f"image {dims[0]}x{dims[1]} exceeds "
                     f"{MAX_PIXELS} decoded pixels",
        })
    img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        return None, (400, {"error": "could not decode image"})
    return img, None


def make_http_server(service, host: str = "0.0.0.0", port: int = 8000,
                     max_body: int = MAX_BODY_BYTES) -> ThreadingHTTPServer:
    """Build (not start) a ``ThreadingHTTPServer`` serving ``service``.
    Call ``.serve_forever()`` (or ``.shutdown()`` from another thread)."""

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: the default HTTP/1.0 closes the socket
        # after every response, so a client reusing its connection loses
        # one request per reconnect and every request pays a TCP
        # handshake (found by tools/load_test_serving.py: hundreds of
        # client-side resets per 8 s step at 100+ rps).  Every response
        # sets Content-Length, which 1.1 keep-alive requires.
        protocol_version = "HTTP/1.1"

        # keep the default request logging out of the hot path
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send_json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if self.close_connection:
                # advertise the close (set on error paths that leave the
                # declared body unread — ADVICE r4) so keep-alive clients
                # reconnect instead of reusing a desynced connection
                self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            if self.path == "/healthz":
                self._send_json(200, {"status": "ok"})
            elif self.path == "/v1/stats":
                self._send_json(200, service.stats())
            else:
                self._send_json(404, {"error": "not found"})

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/detect":
                self._send_json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                # the body boundary is unknowable — the unread bytes would
                # be parsed as the NEXT request line and desync the
                # keep-alive connection (ADVICE r4), so close it
                self.close_connection = True
                self._send_json(400, {"error": "malformed Content-Length"})
                return
            if not 0 < length <= max_body:
                # error responses on paths that do not consume the
                # declared body must not keep the connection alive
                self.close_connection = True
                self._send_json(
                    413 if length > max_body else 400,
                    {"error": f"body length {length} not in (0, {max_body}]"},
                )
                return
            raw = self.rfile.read(length)
            img, err = decode_request_image(
                raw, self.headers.get("X-Raw-Shape")
            )
            if err is not None:
                self._send_json(*err)
                return
            t0 = time.perf_counter()
            try:
                dets = service.detect(img)
            except QueueFullError as e:
                self._send_json(429, {"error": str(e)})
                return
            except (BatcherClosedError, TimeoutError) as e:
                self._send_json(503, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — surface, don't crash the server
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._send_json(200, {
                "detections": dets,
                "image_hw": [int(img.shape[0]), int(img.shape[1])],
                "ms": round((time.perf_counter() - t0) * 1e3, 2),
            })

    return ThreadingHTTPServer((host, port), Handler)
