"""Load-test the serving stack (round-4 VERDICT item 6).

Open-loop load generator against ``tools/serve.py``: for each offered
rate, request send times are fixed on a clock (not gated on responses —
closed-loop generators hide saturation by slowing down with the server),
a worker pool posts one image per tick, and the tool reports
client-observed latency percentiles, achieved throughput, error mix
(429 = shed load), and the server's own batch-occupancy counters from
``/v1/stats``.

Usage (server already running):
    python tools/load_test_serving.py --url http://127.0.0.1:8000 \
        --rates 50,100,200,400,800 --duration 10

Or spawn + tear down a server around the sweep:
    python tools/load_test_serving.py --spawn "-f load_eval/yolox_24p_eval.py \
        --batch 64" --rates ...

Output: one JSON line with the per-rate table (also printed as text to
stderr).
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import queue
import shlex
import subprocess
import sys
import threading
import time
import urllib.parse
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_parser():
    p = argparse.ArgumentParser("load_test_serving")
    p.add_argument("--url", default="http://127.0.0.1:8000")
    p.add_argument("--spawn", default=None,
                   help="serve.py arguments; the server is started on "
                        "--url's port and killed after the sweep")
    p.add_argument("--rates", default="50,100,200,400,800,1600",
                   help="offered req/s sweep")
    p.add_argument("--closed", default=None,
                   help="comma list of concurrency levels: run "
                        "CLOSED-loop saturation steps (N workers send "
                        "back-to-back) instead of the open-loop rate "
                        "sweep — the right capacity probe when the load "
                        "generator shares the host's core budget with "
                        "the server")
    p.add_argument("--duration", type=float, default=10.0,
                   help="seconds per rate step")
    p.add_argument("--workers", type=int, default=128)
    p.add_argument("--procs", type=int, default=1,
                   help="split the offered load over N generator "
                        "processes (one python process tops out around "
                        "500-1000 rps of 1 MB posts on the GIL)")
    p.add_argument("--timeout", type=float, default=30.0,
                   help="per-request client timeout")
    p.add_argument("--health-timeout", type=float, default=1800.0,
                   help="seconds to wait for the (spawned) server to "
                        "become healthy — a cold serving-program compile "
                        "takes many minutes on this host")
    p.add_argument("--_emit-samples", action="store_true",
                   help=argparse.SUPPRESS)
    p.add_argument("--hw", default="640,640",
                   help="H,W of the raw test frame")
    p.add_argument("--jpeg", action="store_true",
                   help="send JPEG bodies (exercises the server decode "
                        "path) instead of raw X-Raw-Shape frames")
    return p


def _wait_healthy(url: str, deadline_s: float = 600.0):
    t0 = time.time()
    while time.time() - t0 < deadline_s:
        try:
            with urllib.request.urlopen(url + "/healthz", timeout=2) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(1.0)
    raise RuntimeError(f"server at {url} never became healthy")


def _get_stats(url: str) -> dict:
    with urllib.request.urlopen(url + "/v1/stats", timeout=10) as r:
        return json.loads(r.read())


class _Worker(threading.Thread):
    """Posts frames at the send times it pulls from the shared schedule."""

    def __init__(self, host, port, path, body, headers, timeout,
                 schedule, results):
        super().__init__(daemon=True)
        self.host, self.port, self.path = host, port, path
        self.body, self.headers, self.timeout = body, headers, timeout
        self.schedule, self.results = schedule, results
        self.conn = None

    def _post_once(self):
        if self.conn is None:
            self.conn = http.client.HTTPConnection(
                self.host, self.port, timeout=self.timeout
            )
        self.conn.request("POST", self.path, body=self.body,
                          headers=self.headers)
        resp = self.conn.getresponse()
        resp.read()
        return resp.status

    LATE_CAP_S = 5.0  # wrk2-style: a tick this far past due is recorded
    # as client-dropped instead of sent — with finite workers a saturated
    # server would otherwise turn the open-loop schedule into a closed
    # loop that never drains

    def run(self):
        while True:
            try:
                t_send = self.schedule.get_nowait()
            except queue.Empty:
                return
            now = time.perf_counter()
            if t_send > now:
                time.sleep(t_send - now)
            elif now - t_send > self.LATE_CAP_S:
                self.results.append((t_send, 0.0, -2))  # dropped late
                continue
            t0 = time.perf_counter()
            try:
                status = self._post_once()
            except Exception:
                status = -1
                self.conn = None  # reconnect next time
            self.results.append(
                (t_send, time.perf_counter() - t0, status)
            )


def _generate(url: str, rate: float, duration: float, workers: int,
              body: bytes, headers: dict, timeout: float) -> list:
    """Run the open-loop schedule in THIS process; return raw samples
    ``(t_send, latency_s, status)``."""
    parsed = urllib.parse.urlparse(url)
    n = max(1, int(rate * duration))
    start = time.perf_counter() + 0.5
    schedule: "queue.Queue[float]" = queue.Queue()
    for i in range(n):
        schedule.put(start + i / rate)
    results: list = []
    pool = [
        _Worker(parsed.hostname, parsed.port or 80, "/v1/detect", body,
                headers, timeout, schedule, results)
        for _ in range(min(workers, n))
    ]
    for w in pool:
        w.start()
    for w in pool:
        w.join(timeout=duration + timeout + 30)
    return results


class _ClosedWorker(threading.Thread):
    """Sends back-to-back until the deadline (closed loop)."""

    def __init__(self, host, port, body, headers, timeout, deadline,
                 results):
        super().__init__(daemon=True)
        self.w = _Worker(host, port, "/v1/detect", body, headers, timeout,
                         queue.Queue(), results)
        self.deadline = deadline
        self.results = results

    def run(self):
        while time.perf_counter() < self.deadline:
            t0 = time.perf_counter()
            try:
                status = self.w._post_once()
            except Exception:
                status = -1
                self.w.conn = None
            self.results.append((t0, time.perf_counter() - t0, status))


def run_closed(url: str, concurrency: int, duration: float, body: bytes,
               headers: dict, timeout: float) -> dict:
    parsed = urllib.parse.urlparse(url)
    stats0 = _get_stats(url)
    results: list = []
    deadline = time.perf_counter() + duration
    pool = [
        _ClosedWorker(parsed.hostname, parsed.port or 80, body, headers,
                      timeout, deadline, results)
        for _ in range(concurrency)
    ]
    for w in pool:
        w.start()
    for w in pool:
        w.join(timeout=duration + timeout + 30)
    stats1 = _get_stats(url)
    lats = sorted(r[1] for r in results if r[2] == 200)

    def pct(q):
        return round(lats[min(len(lats) - 1, int(q * len(lats)))] * 1e3, 1) \
            if lats else None

    n_ok = sum(1 for r in results if r[2] == 200)
    batches = stats1["batches"] - stats0["batches"]
    served = stats1["requests"] - stats0["requests"]
    return {
        "concurrency": concurrency,
        "ok": n_ok,
        "shed_429": sum(1 for r in results if r[2] == 429),
        "errors": sum(1 for r in results if r[2] not in (200, 429)),
        "throughput_rps": round(n_ok / duration, 1),
        "p50_ms": pct(0.50),
        "p95_ms": pct(0.95),
        "p99_ms": pct(0.99),
        "batch_occupancy": round(served / batches, 1) if batches else None,
    }


def run_rate(url: str, rate: float, duration: float, workers: int,
             body: bytes, headers: dict, timeout: float, procs: int,
             child_argv) -> dict:
    stats0 = _get_stats(url)
    if procs <= 1:
        results = _generate(url, rate, duration, workers, body, headers,
                            timeout)
    else:
        children = [
            subprocess.Popen(
                child_argv + ["--rates", str(rate / procs),
                              "--workers", str(max(8, workers // procs)),
                              "--_emit-samples"],
                stdout=subprocess.PIPE, cwd=REPO,
            )
            for _ in range(procs)
        ]
        results = []
        for c in children:
            out, _ = c.communicate(
                timeout=duration + timeout + _Worker.LATE_CAP_S + 90
            )
            results.extend(tuple(s) for s in json.loads(out))
    stats1 = _get_stats(url)

    lats = sorted(r[1] for r in results if r[2] == 200)
    # open-loop: the send schedule spans exactly `duration` by
    # construction (and per-process clock bases differ under --procs)
    span = duration

    def pct(q):
        return round(lats[min(len(lats) - 1, int(q * len(lats)))] * 1e3, 1) \
            if lats else None

    n_ok = sum(1 for r in results if r[2] == 200)
    batches = stats1["batches"] - stats0["batches"]
    served = stats1["requests"] - stats0["requests"]
    return {
        "offered_rps": rate,
        "sent": len(results),
        "ok": n_ok,
        "shed_429": sum(1 for r in results if r[2] == 429),
        "client_dropped_late": sum(1 for r in results if r[2] == -2),
        "errors": sum(1 for r in results
                      if r[2] not in (200, 429, -2)),
        "achieved_rps": round(n_ok / max(span, 1e-9), 1),
        "p50_ms": pct(0.50),
        "p95_ms": pct(0.95),
        "p99_ms": pct(0.99),
        "batch_occupancy": round(served / batches, 1) if batches else None,
        "server_queue_depth_end": stats1["queue_depth"],
    }


def main():
    args = make_parser().parse_args()
    h, w = (int(v) for v in args.hw.split(","))
    rng = np.random.RandomState(0)
    frame = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    if args.jpeg:
        import cv2

        ok, enc = cv2.imencode(".jpg", frame)
        assert ok
        body, headers = enc.tobytes(), {"Content-Type": "image/jpeg"}
    else:
        body = frame.tobytes()
        headers = {"X-Raw-Shape": f"{h},{w},3",
                   "Content-Type": "application/octet-stream"}

    if getattr(args, "_emit_samples"):
        rate = float(args.rates)
        results = _generate(args.url, rate, args.duration, args.workers,
                            body, headers, args.timeout)
        print(json.dumps([[r[0], r[1], r[2]] for r in results]))
        return

    child_argv = [
        sys.executable, os.path.abspath(__file__),
        "--url", args.url, "--duration", str(args.duration),
        "--hw", args.hw, "--timeout", str(args.timeout),
    ] + (["--jpeg"] if args.jpeg else [])

    proc = None
    try:
        if args.spawn:
            port = urllib.parse.urlparse(args.url).port or 8000
            # --port must precede the user's args: serve.py's trailing
            # `opts` is an argparse REMAINDER, so anything appended after
            # positional overrides would be swallowed into it
            cmd = [sys.executable, os.path.join(REPO, "tools", "serve.py"),
                   "--port", str(port), *shlex.split(args.spawn)]
            print("spawning:", " ".join(cmd), file=sys.stderr)
            proc = subprocess.Popen(cmd, cwd=REPO)
        _wait_healthy(args.url, args.health_timeout)

        # discarded warm pass: touches the bucket programs (first use of
        # a cached-compile program still pays a load) so the measured
        # steps see steady-state dispatch
        run_closed(args.url, 8, 4.0, body, headers, args.timeout)

        table = []
        if args.closed:
            for n in (int(v) for v in args.closed.split(",")):
                row = run_closed(args.url, n, args.duration, body,
                                 headers, args.timeout)
                table.append(row)
                print(" ".join(f"{k}={v}" for k, v in row.items()),
                      file=sys.stderr)
                time.sleep(1.0)
        else:
            for rate in (float(r) for r in args.rates.split(",")):
                row = run_rate(args.url, rate, args.duration,
                               args.workers, body, headers, args.timeout,
                               args.procs, child_argv)
                table.append(row)
                print(" ".join(f"{k}={v}" for k, v in row.items()),
                      file=sys.stderr)
                time.sleep(1.0)  # drain between steps
        print(json.dumps(table))
    finally:
        if proc is not None:
            proc.terminate()
            try:
                proc.wait(timeout=20)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    main()
