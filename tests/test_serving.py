"""Serving stack: dynamic batcher semantics, DetectionService coordinate
mapping / batch padding, the HTTP front end, and the StableHLO-artifact
path (eop_tpu/serving/)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eop_tpu.serving import (
    BatcherClosedError,
    DetectionService,
    DynamicBatcher,
    QueueFullError,
    make_http_server,
)

# --------------------------------------------------------------- batcher


def test_batcher_coalesces_concurrent_requests():
    sizes = []

    def run(items):
        sizes.append(len(items))
        time.sleep(0.01)
        return [x * 2 for x in items]

    b = DynamicBatcher(run, max_batch=8, max_wait_ms=400)
    results = [None] * 6

    def worker(i):
        results[i] = b.submit(i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    assert results == [0, 2, 4, 6, 8, 10]
    assert max(sizes) >= 2, f"no coalescing happened: {sizes}"
    s_total = sum(sizes)
    assert s_total == 6


def test_batcher_partial_batch_after_window():
    """A lone request must not wait for a full batch."""
    b = DynamicBatcher(lambda xs: xs, max_batch=64, max_wait_ms=30)
    t0 = time.perf_counter()
    assert b.submit("x") == "x"
    assert time.perf_counter() - t0 < 5.0
    b.close()


def test_batcher_error_propagates_to_all_waiters():
    def run(items):
        raise ValueError("boom")

    b = DynamicBatcher(run, max_batch=4, max_wait_ms=50)
    errs = []

    def worker():
        try:
            b.submit(1)
        except ValueError as e:
            errs.append(str(e))

    ts = [threading.Thread(target=worker) for _ in range(3)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errs == ["boom"] * 3
    assert b.stats()["errors"] == 3
    b.close()


def test_batcher_queue_full_and_close():
    release = threading.Event()

    def run(items):
        release.wait(5)
        return items

    b = DynamicBatcher(run, max_batch=1, max_wait_ms=1, max_queue=2)
    ts = [threading.Thread(target=lambda: b.submit(0)) for _ in range(3)]
    for t in ts:
        t.start()
    # dispatcher holds one batch; wait until the queue actually fills
    # behind it (a fixed sleep flakes on a loaded 1-vCPU box)
    for _ in range(200):
        if b.stats()["queue_depth"] >= 2:
            break
        time.sleep(0.02)
    assert b.stats()["queue_depth"] >= 2
    with pytest.raises(QueueFullError):
        b.submit(99)
    release.set()
    for t in ts:
        t.join()
    b.close()
    with pytest.raises(BatcherClosedError):
        b.submit(1)


def test_batcher_cost_backpressure():
    """Byte-cost admission: the summed cost of admitted-but-unfinished
    requests is bounded; a single oversized request is still admitted
    when nothing is queued (no self-deadlock)."""
    release = threading.Event()

    def run(items):
        release.wait(5)
        return items

    b = DynamicBatcher(run, max_batch=1, max_wait_ms=1, max_queue=64,
                       max_queue_cost=100)
    ts = [threading.Thread(target=lambda: b.submit(0, cost=60))
          for _ in range(2)]
    for t in ts:
        t.start()
    time.sleep(0.3)
    with pytest.raises(QueueFullError):
        b.submit(1, cost=60)          # 120 admitted > 100
    release.set()
    for t in ts:
        t.join()
    # drained: a single over-bound request is admitted when idle
    for _ in range(50):
        if b.stats()["queue_cost"] == 0:
            break
        time.sleep(0.02)
    assert b.submit(2, cost=500) == 2
    b.close()


def test_declared_dims_and_bomb_rejection():
    """Header-sniffed dimensions match cv2's for all accepted formats,
    and a bomb-sized PNG header is rejected before any decode."""
    import cv2

    from eop_tpu.serving.http import MAX_PIXELS, _declared_dims

    img = np.random.RandomState(0).randint(0, 255, (37, 53, 3), np.uint8)
    for ext in (".jpg", ".png", ".bmp"):
        buf = cv2.imencode(ext, img)[1].tobytes()
        assert _declared_dims(buf) == (37, 53), ext
    assert _declared_dims(b"GIF89a" + b"\0" * 64) is None

    # forge a PNG IHDR declaring 50000x50000 (~7.5 GB decoded)
    big = bytearray(cv2.imencode(".png", img)[1].tobytes())
    big[16:20] = (50000).to_bytes(4, "big")
    big[20:24] = (50000).to_bytes(4, "big")
    h, w = _declared_dims(bytes(big))
    assert h * w > MAX_PIXELS


# --------------------------------------------------------------- service

from eop_tpu.exp import Exp
from eop_tpu.exp.yolox_24p_base import Exp24P
from eop_tpu.models import init_model


def _tiny(exp):
    exp.depth, exp.width = 0.33, 0.125
    exp.num_classes = 3
    exp.input_size = exp.test_size = (64, 64)
    # random-init obj*cls scores sit at the squared 0.01 prior-prob bias
    # (1e-4); a lower threshold keeps detections flowing without trained
    # weights
    exp.test_conf = 5e-5
    model = exp.get_model()
    variables = init_model(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    return exp, model, variables


@pytest.fixture(scope="module")
def svc_24p():
    exp, model, variables = _tiny(Exp24P())
    svc = DetectionService.from_exp(
        exp, model, variables, batch=2, src_hw=(48, 80),
        max_wait_ms=1.0, class_names=["a", "b", "c"],
    )
    # the steady-state contract (tight-bucket dispatch, bucket-exact
    # mapping parity) needs every bucket compiled, not just the largest
    assert svc.wait_warm(timeout=300)
    yield svc, exp, model, variables
    svc.close()


def test_service_24p_mapping_and_padding(svc_24p):
    """detect() on an odd-size image == running the serving program by
    hand on the letterboxed canvas and unscaling by both ratios; the
    pad rows of a partial batch never leak into results."""
    svc, exp, model, variables = svc_24p
    img = np.random.RandomState(1).randint(0, 255, (100, 160, 3), np.uint8)
    dets = svc.detect(img)
    assert dets, "random-init detector should fire at conf 5e-5"

    # manual reference: host letterbox -> device program -> unscale
    from eop_tpu.serving.service import PAD_VALUE, _host_letterbox

    canvas, r_host = _host_letterbox(img, svc.src_hw)
    # a lone detect() dispatches in bucket 1 (same compiled shape here —
    # XLA picks slightly different conv algorithms per batch size, so the
    # reference must run the same bucket for exact agreement)
    batch = canvas[None]
    out = exp.get_serving_fn(model, variables, svc.src_hw)(batch)
    rows = np.asarray(out.rows)[0]
    valid = np.asarray(out.valid)[0].astype(bool)
    ratio = svc.dev_ratio * r_host
    assert len(dets) == int(valid.sum())
    got_centers = np.array([d["center"] for d in dets])
    np.testing.assert_allclose(
        got_centers, rows[valid][:, :2] / ratio, rtol=1e-6
    )
    got_radii = np.array([d["radii"] for d in dets])
    np.testing.assert_allclose(
        got_radii, rows[valid][:, 2:26] / ratio, rtol=1e-6
    )
    d0 = dets[0]
    assert d0["class_name"] in ("a", "b", "c")
    assert np.asarray(d0["points"]).shape == (24, 2)
    assert 0.0 < d0["score"] <= 1.0
    # polygon points decode with the CORRECT angle math (not the
    # reference's theta*cos(theta) NMS quirk): point 0 lies on the +x ray
    np.testing.assert_allclose(
        d0["points"][0],
        [d0["center"][0] + d0["radii"][0], d0["center"][1]],
        rtol=1e-5,
    )


def test_service_same_size_image_is_identity_ratio(svc_24p):
    """src_hw-sized input: no host resize, coords = rows / dev_ratio."""
    svc, exp, model, variables = svc_24p
    img = np.random.RandomState(2).randint(
        0, 255, (*svc.src_hw, 3), np.uint8
    )
    dets = svc.detect(img)
    rows = np.asarray(
        exp.get_serving_fn(model, variables, svc.src_hw)(img[None]).rows
    )[0]
    np.testing.assert_allclose(
        dets[0]["center"], rows[0, :2] / svc.dev_ratio, rtol=1e-6
    )


def test_service_bbox_family_and_input_validation():
    exp, model, variables = _tiny(Exp())
    svc = DetectionService.from_exp(
        exp, model, variables, batch=2, max_wait_ms=1.0
    )
    try:
        assert svc.wait_warm(timeout=300)  # tight-bucket dispatch below
        img = np.random.RandomState(3).randint(0, 255, (64, 64, 3), np.uint8)
        dets = svc.detect(img)
        assert dets
        assert "bbox" in dets[0] and len(dets[0]["bbox"]) == 4
        assert "center" not in dets[0]
        with pytest.raises(ValueError):
            svc.detect(img.astype(np.float32))
        with pytest.raises(ValueError):
            svc.detect(img[..., 0])
        # a lone request dispatches in the SMALLEST bucket (1), not the
        # full compiled batch — padding waste tracks the load
        assert svc.buckets == [1, 2]
        assert svc.stats()["bucket_hits"].get("1", 0) >= 1
    finally:
        svc.close()


def test_service_from_artifact(tmp_path, svc_24p):
    """The StableHLO-artifact service returns what the live one does."""
    svc, exp, model, variables = svc_24p
    from eop_tpu.utils.serving_export import (
        export_serving,
        save_serving_artifact,
    )

    path = str(tmp_path / "svc.stablehlo")
    save_serving_artifact(
        export_serving(exp, model, variables, 2, svc.src_hw,
                       platforms=("cpu",)),
        path,
        meta={"test_size": list(exp.test_size)},
    )
    # no hand-supplied test_size: it comes from the artifact's metadata
    art_svc = DetectionService.from_artifact(path, max_wait_ms=1.0)
    assert art_svc.test_size == tuple(exp.test_size)
    # the artifact carries ONE shape (batch 2, buckets=[2]); compare
    # against a live service pinned to the same bucket so both sides run
    # the identical compiled shape
    live_svc = DetectionService.from_exp(
        exp, model, variables, batch=2, src_hw=svc.src_hw,
        buckets=[2], max_wait_ms=1.0,
    )
    try:
        assert art_svc.batch == 2 and art_svc.src_hw == svc.src_hw
        assert art_svc.buckets == [2]
        img = np.random.RandomState(4).randint(
            0, 255, (72, 96, 3), np.uint8
        )
        live, art = live_svc.detect(img), art_svc.detect(img)
        assert live and json.dumps(live) == json.dumps(art)
    finally:
        art_svc.close()
        live_svc.close()


# ------------------------------------------------------------------ HTTP


@pytest.fixture(scope="module", params=["threaded", "async"])
def http_server(request, svc_24p):
    """The full HTTP battery runs against BOTH front ends: the stdlib
    thread-per-connection server and the selectors event loop (r5)."""
    from eop_tpu.serving import make_async_http_server

    svc, *_ = svc_24p
    make = (make_http_server if request.param == "threaded"
            else make_async_http_server)
    server = make(svc, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _post(url, body, timeout=60):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_detect_stats_health(http_server):
    import cv2

    base = http_server
    with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
        assert json.loads(r.read())["status"] == "ok"

    img = np.random.RandomState(5).randint(0, 255, (90, 120, 3), np.uint8)
    ok, jpg = cv2.imencode(".jpg", img)
    assert ok
    code, payload = _post(base + "/v1/detect", jpg.tobytes())
    assert code == 200, payload
    assert payload["image_hw"] == [90, 120]
    assert payload["detections"], "expected detections at conf 5e-5"
    det = payload["detections"][0]
    assert {"class_id", "score", "center", "radii", "points"} <= set(det)

    code, payload = _post(base + "/v1/detect", b"not an image")
    assert code == 400

    # raw-tensor fast path: X-Raw-Shape bypasses the image decode and
    # must produce identical detections to the encoded-PNG (lossless)
    # path for the same pixels
    png = cv2.imencode(".png", img)[1].tobytes()
    _, via_png = _post(base + "/v1/detect", png)
    req = urllib.request.Request(
        base + "/v1/detect", data=img.tobytes(), method="POST",
        headers={"X-Raw-Shape": "90,120,3"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        via_raw = json.loads(r.read())
    assert via_raw["detections"] == via_png["detections"]
    req = urllib.request.Request(
        base + "/v1/detect", data=img.tobytes(), method="POST",
        headers={"X-Raw-Shape": "17,11,3"},  # wrong byte count
    )
    try:
        urllib.request.urlopen(req, timeout=60)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised

    with urllib.request.urlopen(base + "/v1/stats", timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1 and stats["batches"] >= 1

    # decompression bomb: a small body whose PNG header declares a huge
    # decode is 413'd BEFORE cv2.imdecode allocates anything
    bomb = bytearray(png)
    bomb[16:20] = (50000).to_bytes(4, "big")
    bomb[20:24] = (50000).to_bytes(4, "big")
    code, payload = _post(base + "/v1/detect", bytes(bomb))
    assert code == 413, payload

    # malformed Content-Length: a clean 400, not a dropped connection
    import http.client

    host = base.split("//", 1)[1]
    conn = http.client.HTTPConnection(host, timeout=10)
    conn.putrequest("POST", "/v1/detect", skip_accept_encoding=True)
    conn.putheader("Content-Length", "abc")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_http_concurrent_requests_batch_together(http_server):
    import cv2

    base = http_server
    img = np.random.RandomState(6).randint(0, 255, (48, 80, 3), np.uint8)
    body = cv2.imencode(".jpg", img)[1].tobytes()
    before = json.loads(
        urllib.request.urlopen(base + "/v1/stats", timeout=10).read()
    )
    codes = []

    def worker():
        codes.append(_post(base + "/v1/detect", body)[0])

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert codes == [200] * 4
    after = json.loads(
        urllib.request.urlopen(base + "/v1/stats", timeout=10).read()
    )
    n_req = after["requests"] - before["requests"]
    n_bat = after["batches"] - before["batches"]
    assert n_req == 4
    # batch capacity is 2: 4 requests need >= 2 batches; coalescing means
    # strictly fewer batches than requests (the 5 ms window on a 1-core
    # box reliably groups at least one pair)
    assert n_bat < n_req, f"{n_bat} batches for {n_req} requests"


def test_http_keepalive_connection_reuse(http_server):
    """HTTP/1.1 keep-alive (round 4, found by the serving load test): a
    client reusing ONE connection must complete several requests.  Under
    the previous HTTP/1.0 behavior the server closed the socket after
    each response, so the second request on the same connection failed
    with a reset/BadStatusLine and load generators lost one request per
    reconnect."""
    import http.client

    import cv2

    base = http_server
    host = base.split("//", 1)[1]
    img = np.random.RandomState(9).randint(0, 255, (40, 64, 3), np.uint8)
    body = cv2.imencode(".jpg", img)[1].tobytes()
    conn = http.client.HTTPConnection(host, timeout=60)
    try:
        for i in range(3):
            conn.request("POST", "/v1/detect", body=body)
            resp = conn.getresponse()
            payload = json.loads(resp.read())
            assert resp.status == 200, (i, payload)
            assert resp.version == 11, "server must speak HTTP/1.1"
            assert "detections" in payload
        # stats over the same connection too
        conn.request("GET", "/v1/stats")
        resp = conn.getresponse()
        assert resp.status == 200
        json.loads(resp.read())
    finally:
        conn.close()


def test_background_bucket_warmup():
    """Round 4: only the LARGEST bucket compiles before the service is
    ready (it can serve any partial batch by padding); the rest warm on
    a background thread and dispatch pads to the smallest bucket that is
    both big enough and already compiled.  (A cold start previously
    compiled every bucket serially — ~25 min for 7 buckets of the fused
    serving program on the build host.)"""
    from eop_tpu.serving.service import DetectionService

    gate = threading.Event()
    calls = []

    def fake_serve(canvases):
        b = canvases.shape[0]
        calls.append(b)
        if b != 8 and not gate.is_set():
            # background warmup calls block here until released
            gate.wait(timeout=30)
        return {
            "rows": np.zeros((b, 4, 29), np.float32),
            "valid": np.zeros((b, 4), bool),
        }

    svc = DetectionService(
        fake_serve, batch=8, src_hw=(32, 32), test_size=(32, 32),
        max_wait_ms=1.0, warmup=True,
    )
    try:
        # ready immediately after the largest bucket compiled
        assert calls[0] == 8
        assert 8 in svc.stats()["warm_buckets"]
        # a single request while small buckets are still cold pads to 8
        img = np.zeros((20, 20, 3), np.uint8)
        svc.detect(img)
        hits = {int(k): v for k, v in svc.stats()["bucket_hits"].items()}
        assert hits.get(8, 0) >= 1 and hits.get(1, 0) == 0
        # release the background warmup; all buckets become warm
        gate.set()
        deadline = time.time() + 30
        while time.time() < deadline:
            if svc.stats()["warm_buckets"] == [1, 2, 4, 8]:
                break
            time.sleep(0.05)
        assert svc.stats()["warm_buckets"] == [1, 2, 4, 8]
        # now a single request uses the tight bucket
        svc.detect(img)
        hits = {int(k): v for k, v in svc.stats()["bucket_hits"].items()}
        assert hits.get(1, 0) == 1
    finally:
        gate.set()
        svc.close()


# ---------------------------------------------------- async front end (r5)


def test_batcher_submit_nowait_callbacks():
    done = []
    b = DynamicBatcher(lambda xs: [x * 2 for x in xs], max_batch=4,
                       max_wait_ms=5)
    for i in range(3):
        b.submit_nowait(i, lambda r, e, i=i: done.append((i, r, e)))
    deadline = time.time() + 10
    while len(done) < 3 and time.time() < deadline:
        time.sleep(0.01)
    b.close()
    assert sorted(done) == [(0, 0, None), (1, 2, None), (2, 4, None)]


def test_batcher_submit_nowait_error_and_close():
    got = []
    ev = threading.Event()

    def boom(xs):
        raise RuntimeError("kaput")

    b = DynamicBatcher(boom, max_batch=2, max_wait_ms=1)
    b.submit_nowait("x", lambda r, e: (got.append((r, e)), ev.set()))
    assert ev.wait(10)
    assert got[0][0] is None and isinstance(got[0][1], RuntimeError)
    b.close()
    with pytest.raises(BatcherClosedError):
        b.submit_nowait("y", lambda r, e: None)


def test_batcher_submit_nowait_queue_full_raises_synchronously():
    gate = threading.Event()

    def slow(xs):
        gate.wait(10)
        return xs

    b = DynamicBatcher(slow, max_batch=1, max_wait_ms=1, max_queue=1)
    b.submit_nowait("a", lambda r, e: None)   # taken by dispatcher
    time.sleep(0.2)
    b.submit_nowait("b", lambda r, e: None)   # fills the queue
    with pytest.raises(QueueFullError):
        b.submit_nowait("c", lambda r, e: None)
    gate.set()
    b.close()


class _StubService:
    """Front-end-only tests: detect returns [] instantly."""

    def __init__(self):
        import threading as _t

        self._lock = _t.Lock()
        self.n = 0

    def detect(self, img, timeout=None):
        with self._lock:
            self.n += 1
        return []

    def detect_async(self, img, callback):
        with self._lock:
            self.n += 1
        callback([], None)

    def stats(self):
        return {"requests": self.n}


@pytest.mark.parametrize("frontend", ["threaded", "async"])
def test_http_oversized_body_closes_cleanly(frontend):
    """ADVICE r4 (medium): an error response on a path that does NOT
    consume the declared body must close the connection — otherwise the
    unread body bytes desync the next keep-alive request.  The client
    must see a clean 413 + Connection: close, and a follow-up request
    (auto-reconnect) must succeed."""
    import http.client

    from eop_tpu.serving import make_async_http_server

    make = (make_http_server if frontend == "threaded"
            else make_async_http_server)
    server = make(_StubService(), host="127.0.0.1", port=0, max_body=1024)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        body = b"z" * 4096  # over max_body
        conn.request("POST", "/v1/detect", body=body)
        resp = conn.getresponse()
        assert resp.status == 413
        assert (resp.getheader("Connection") or "").lower() == "close"
        resp.read()
        # http.client reconnects on a closed keep-alive connection; the
        # follow-up must be a clean request, not desynced garbage
        import cv2

        img = np.zeros((8, 8, 3), np.uint8)
        ok_body = cv2.imencode(".png", img)[1].tobytes()
        conn.request("POST", "/v1/detect", body=ok_body)
        resp2 = conn.getresponse()
        assert resp2.status == 200, resp2.read()
        json.loads(resp2.read())
        conn.close()
    finally:
        server.shutdown()


def test_async_many_persistent_connections():
    """The point of the event loop (VERDICT r4 item 2): many idle
    persistent connections are free — every one of them completes
    requests with zero resets (ThreadingHTTPServer reset connections at
    >=128 persistent clients on the 1-core load-test host)."""
    import http.client

    from eop_tpu.serving import make_async_http_server

    server = make_async_http_server(_StubService(), host="127.0.0.1",
                                    port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    conns = []
    try:
        for _ in range(160):
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=15)
            c.connect()
            conns.append(c)
        # every connection stays usable: two rounds over all of them
        for rnd in range(2):
            for i, c in enumerate(conns):
                c.request("GET", "/healthz")
                resp = c.getresponse()
                assert resp.status == 200, (rnd, i)
                resp.read()
    finally:
        for c in conns:
            try:
                c.close()
            except Exception:
                pass
        server.shutdown()


def test_async_detect_roundtrip_and_pipelined_next_request():
    """After an async detect completes, buffered pipelined bytes are
    parsed (responses stay in order)."""
    import http.client

    import cv2

    from eop_tpu.serving import make_async_http_server

    server = make_async_http_server(_StubService(), host="127.0.0.1",
                                    port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = np.zeros((8, 8, 3), np.uint8)
        body = cv2.imencode(".png", img)[1].tobytes()
        head = (
            f"POST /v1/detect HTTP/1.1\r\nHost: x\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        get = b"GET /v1/stats HTTP/1.1\r\nHost: x\r\n\r\n"
        s = socket_create("127.0.0.1", port)
        # two detects + a stats, all pipelined in one write
        s.sendall(head + body + head + body + get)
        data = b""
        deadline = time.time() + 30
        while data.count(b"HTTP/1.1 200") < 3 and time.time() < deadline:
            chunk = s.recv(65536)
            if not chunk:
                break
            data += chunk
        assert data.count(b"HTTP/1.1 200") == 3, data[:400]
        # responses in request order: two detections then stats
        # split by head/body separators: seg[i] is body_i + head_{i+1}
        bodies = [seg for seg in data.split(b"\r\n\r\n") if seg]
        assert b"detections" in bodies[1]
        assert b"detections" in bodies[2]
        assert b"requests" in bodies[3]
        s.close()
    finally:
        server.shutdown()


def socket_create(host, port):
    import socket as _socket

    s = _socket.create_connection((host, port), timeout=15)
    return s


def test_warm_failure_surfaced_and_wait_warm_terminates():
    """ADVICE r4 (low): a bucket whose warmup compile fails is recorded
    (stats.warm_failed) and wait_warm(timeout=None) returns False
    instead of blocking forever."""

    def fake_serve(canvases):
        b = canvases.shape[0]
        if b == 2:
            raise RuntimeError("compile failed for bucket 2")
        return {
            "rows": np.zeros((b, 4, 29), np.float32),
            "valid": np.zeros((b, 4), bool),
        }

    svc = DetectionService(
        fake_serve, batch=4, src_hw=(16, 16), test_size=(16, 16),
        max_wait_ms=1.0, warmup=True,
    )
    try:
        assert svc.wait_warm(timeout=None) is False  # settled, not hung
        st = svc.stats()
        assert "2" in st.get("warm_failed", {})
        assert sorted(st["warm_buckets"]) == [1, 4]
        # service still serves (pads past the dead bucket)
        assert svc.detect(np.zeros((10, 10, 3), np.uint8)) == []
    finally:
        svc.close()
