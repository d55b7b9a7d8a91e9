"""Live browser dashboard for a training run.

Serves a self-contained HTML page (inline CSS/JS, zero external assets —
the box has no egress) that polls a JSON snapshot of the run's TensorBoard
scalar streams (read by the dependency-free ``tb_reader``) and renders:

* a stat-tile row (step, total loss, lr, last eval AP) and
* a grid of small-multiple SVG line charts, one scalar tag each, with a
  crosshair + tooltip hover layer and a per-chart table fallback.

Observability the reference lacks entirely: its only live view is a tqdm
bar (`/root/reference/yolox_24p/train_24p.py:73-111`); a TB stream needs
a TensorFlow install and a tensorboard server.  This attaches to any
past or in-flight run directory with zero trainer changes.

Chart conventions follow the repo's dataviz method: one series per chart
(slot-1 blue, both modes from the validated reference palette), 2px
round-capped lines, >=8px end marker with a 2px surface ring, hairline
solid gridlines, text in text tokens (never the series color), endpoint
direct label, crosshair tooltip with the value leading, dark mode as its
own selected steps (not an automatic flip), reduced-opacity hold during
refetch, and labels inserted via textContent (untrusted data).
"""

from __future__ import annotations

import collections
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .tb_reader import find_event_files, read_scalars

_HTML = """<!doctype html>
<html><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width,initial-scale=1">
<title>eop_tpu training dashboard</title>
<style>
.viz-root {
  color-scheme: light;
  --surface-1: #fcfcfb; --surface-2: #f0efec;
  --text-primary: #0b0b0b; --text-secondary: #52514e; --text-muted: #8a8884;
  --grid: #e4e3df; --series-1: #2a78d6;
}
@media (prefers-color-scheme: dark) {
  :root:where(:not([data-theme="light"])) .viz-root {
    color-scheme: dark;
    --surface-1: #1a1a19; --surface-2: #262625;
    --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #8a8884;
    --grid: #33332f; --series-1: #3987e5;
  }
}
:root[data-theme="dark"] .viz-root {
  color-scheme: dark;
  --surface-1: #1a1a19; --surface-2: #262625;
  --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #8a8884;
  --grid: #33332f; --series-1: #3987e5;
}
html, body { margin: 0; }
.viz-root {
  background: var(--surface-1); color: var(--text-primary);
  font: 13px/1.45 system-ui, sans-serif; min-height: 100vh; padding: 16px;
}
h1 { font-size: 15px; font-weight: 600; margin: 0 0 2px; }
.sub { color: var(--text-muted); margin-bottom: 12px; }
.filters { display: flex; gap: 8px; align-items: center; margin: 0 0 14px; }
.filters input {
  background: var(--surface-1); color: var(--text-primary);
  border: 1px solid var(--grid); border-radius: 6px; padding: 4px 8px;
  font: inherit; width: 220px;
}
.tiles { display: flex; flex-wrap: wrap; gap: 10px; margin-bottom: 16px; }
.tile {
  background: var(--surface-2); border-radius: 8px; padding: 10px 14px;
  min-width: 130px;
}
.tile .label { color: var(--text-secondary); }
.tile .value { font-size: 22px; font-weight: 600; font-variant-numeric: normal; }
.tile .delta { color: var(--text-muted); font-size: 12px; }
.grid { display: grid; grid-template-columns: repeat(auto-fill, minmax(320px, 1fr)); gap: 14px; }
.card { background: var(--surface-2); border-radius: 8px; padding: 10px 12px 6px; }
.card h2 { font-size: 13px; font-weight: 600; margin: 0; }
.card .last { color: var(--text-secondary); font-size: 12px; margin-bottom: 2px; }
.card svg { display: block; width: 100%; height: auto; }
.card .axis text { fill: var(--text-muted); font-size: 10px; }
.card .toggle {
  background: none; border: none; color: var(--text-muted); cursor: pointer;
  font: 11px system-ui, sans-serif; padding: 2px 0 4px;
}
.card table { width: 100%; border-collapse: collapse; font-size: 11px; }
.card td, .card th {
  text-align: right; padding: 1px 6px; color: var(--text-secondary);
  border-top: 1px solid var(--grid);
}
.card th { color: var(--text-muted); font-weight: 500; }
.stale .grid, .stale .tiles { opacity: 0.55; }
#tooltip {
  position: fixed; pointer-events: none; display: none; z-index: 10;
  background: var(--surface-1); border: 1px solid var(--grid);
  border-radius: 6px; padding: 6px 9px; box-shadow: 0 2px 8px rgba(0,0,0,.18);
}
#tooltip .v { font-weight: 600; font-size: 14px; }
#tooltip .s { color: var(--text-secondary); font-size: 11px; }
</style></head>
<body class="viz-root"><div id="app">
<h1>eop_tpu training dashboard</h1>
<div class="sub" id="meta">connecting…</div>
<div class="filters"><label for="tagq" style="color:var(--text-secondary)">Filter tags</label>
<input id="tagq" type="search" placeholder="e.g. train/ or loss"></div>
<div class="tiles" id="tiles"></div>
<div class="grid" id="grid"></div>
</div><div id="tooltip"></div>
<script>
"use strict";
const REFRESH_MS = __REFRESH_MS__;
const PAD = {l: 46, r: 14, t: 8, b: 18};
let DATA = {}, open = new Set(), query = "";

const fmt = v => {
  if (!isFinite(v)) return String(v);
  const a = Math.abs(v);
  if (a >= 1e6) return (v / 1e6).toFixed(2) + "M";
  if (a >= 1e4) return (v / 1e3).toFixed(1) + "K";
  if (a >= 100) return v.toFixed(1);
  if (a >= 1)   return v.toFixed(3);
  return v.toPrecision(3);
};
const niceTicks = (lo, hi, n) => {
  if (!(hi > lo)) { hi = lo + 1; }
  const span = hi - lo, step0 = Math.pow(10, Math.floor(Math.log10(span / n)));
  const err = span / n / step0;
  const step = step0 * (err >= 7.5 ? 10 : err >= 3.5 ? 5 : err >= 1.5 ? 2 : 1);
  const out = [];
  for (let v = Math.ceil(lo / step) * step; v <= hi + 1e-12; v += step) out.push(v);
  return out;
};
const el = (tag, cls) => {
  const e = document.createElement(tag);
  if (cls) e.className = cls;
  return e;
};
const svgEl = (tag) => document.createElementNS("http://www.w3.org/2000/svg", tag);

function tile(label, value, delta) {
  const t = el("div", "tile");
  const l = el("div", "label"); l.textContent = label;
  const v = el("div", "value"); v.textContent = value;
  t.append(l, v);
  if (delta) { const d = el("div", "delta"); d.textContent = delta; t.append(d); }
  return t;
}

function chartCard(tag, steps, vals) {
  const card = el("div", "card");
  const h = el("h2"); h.textContent = tag;
  const last = el("div", "last");
  last.textContent = "last " + fmt(vals[vals.length - 1]) +
                     " @ step " + steps[steps.length - 1];
  card.append(h, last);

  const W = 420, H = 150;
  const svg = svgEl("svg");
  svg.setAttribute("viewBox", `0 0 ${W} ${H}`);  // uniform scaling: text
  // stays undistorted at any card width (default preserveAspectRatio)
  const x0 = steps[0], x1 = steps[steps.length - 1];
  let lo = Math.min(...vals), hi = Math.max(...vals);
  if (hi - lo < 1e-12) { hi = lo + (Math.abs(lo) || 1) * 1e-3; }
  const X = s => PAD.l + (x1 > x0 ? (s - x0) / (x1 - x0) : 0.5) * (W - PAD.l - PAD.r);
  const Y = v => PAD.t + (1 - (v - lo) / (hi - lo)) * (H - PAD.t - PAD.b);

  const ax = svgEl("g"); ax.setAttribute("class", "axis");
  for (const tv of niceTicks(lo, hi, 4)) {
    const y = Y(tv);
    const ln = svgEl("line");
    ln.setAttribute("x1", PAD.l); ln.setAttribute("x2", W - PAD.r);
    ln.setAttribute("y1", y); ln.setAttribute("y2", y);
    ln.setAttribute("stroke", "var(--grid)"); ln.setAttribute("stroke-width", "1");
    const tx = svgEl("text");
    tx.setAttribute("x", PAD.l - 5); tx.setAttribute("y", y + 3);
    tx.setAttribute("text-anchor", "end"); tx.textContent = fmt(tv);
    ax.append(ln, tx);
  }
  svg.append(ax);

  const path = svgEl("path");
  path.setAttribute("d", vals.map(
    (v, i) => (i ? "L" : "M") + X(steps[i]).toFixed(1) + " " + Y(v).toFixed(1)
  ).join(""));
  path.setAttribute("fill", "none");
  path.setAttribute("stroke", "var(--series-1)");
  path.setAttribute("stroke-width", "2");
  path.setAttribute("stroke-linecap", "round");
  path.setAttribute("stroke-linejoin", "round");
  svg.append(path);

  const end = svgEl("circle");  // end marker: r4 + 2px surface ring
  end.setAttribute("cx", X(x1)); end.setAttribute("cy", Y(vals[vals.length - 1]));
  end.setAttribute("r", "4"); end.setAttribute("fill", "var(--series-1)");
  end.setAttribute("stroke", "var(--surface-2)"); end.setAttribute("stroke-width", "2");
  svg.append(end);

  // crosshair + hover dot (hit target: the whole plot, nearest-X snap)
  const cross = svgEl("line");
  cross.setAttribute("stroke", "var(--text-muted)"); cross.setAttribute("stroke-width", "1");
  cross.setAttribute("y1", PAD.t); cross.setAttribute("y2", H - PAD.b);
  cross.style.display = "none";
  const dot = svgEl("circle");
  dot.setAttribute("r", "4"); dot.setAttribute("fill", "var(--series-1)");
  dot.setAttribute("stroke", "var(--surface-2)"); dot.setAttribute("stroke-width", "2");
  dot.style.display = "none";
  svg.append(cross, dot);

  const tip = document.getElementById("tooltip");
  svg.addEventListener("pointermove", ev => {
    const r = svg.getBoundingClientRect();
    const px = (ev.clientX - r.left) / r.width * W;
    let best = 0, bd = Infinity;
    for (let i = 0; i < steps.length; i++) {
      const d = Math.abs(X(steps[i]) - px);
      if (d < bd) { bd = d; best = i; }
    }
    cross.setAttribute("x1", X(steps[best])); cross.setAttribute("x2", X(steps[best]));
    cross.style.display = "";
    dot.setAttribute("cx", X(steps[best])); dot.setAttribute("cy", Y(vals[best]));
    dot.style.display = "";
    tip.replaceChildren();
    const v = el("div", "v"); v.textContent = fmt(vals[best]);
    const s = el("div", "s"); s.textContent = tag + " · step " + steps[best];
    tip.append(v, s);
    tip.style.display = "block";
    tip.style.left = Math.min(ev.clientX + 14, innerWidth - 170) + "px";
    tip.style.top = (ev.clientY + 14) + "px";
  });
  svg.addEventListener("pointerleave", () => {
    cross.style.display = "none"; dot.style.display = "none";
    tip.style.display = "none";
  });
  card.append(svg);

  const btn = el("button", "toggle");
  btn.textContent = open.has(tag) ? "hide data" : "show data";
  btn.addEventListener("click", () => {
    open.has(tag) ? open.delete(tag) : open.add(tag);
    render();
  });
  card.append(btn);
  if (open.has(tag)) {
    const tb = el("table");
    const hr = el("tr");
    for (const htxt of ["step", "value"]) {
      const th = el("th"); th.textContent = htxt; hr.append(th);
    }
    tb.append(hr);
    for (let i = Math.max(0, steps.length - 12); i < steps.length; i++) {
      const tr = el("tr");
      const a = el("td"); a.textContent = steps[i];
      const b = el("td"); b.textContent = fmt(vals[i]);
      tr.append(a, b); tb.append(tr);
    }
    card.append(tb);
  }
  return card;
}

function render() {
  const tags = Object.keys(DATA.tags || {}).filter(
    t => !query || t.toLowerCase().includes(query)
  ).sort();
  const tiles = document.getElementById("tiles");
  tiles.replaceChildren();
  let maxStep = 0;
  for (const t of Object.values(DATA.tags || {}))
    maxStep = Math.max(maxStep, t.steps[t.steps.length - 1] || 0);
  tiles.append(tile("step", maxStep.toLocaleString()));
  for (const [label, key] of [["total loss", "total_loss"], ["lr", "lr"],
                              ["AP50", "AP50"], ["AP50:95", "AP50_95"]]) {
    const hit = Object.keys(DATA.tags || {}).find(t => t.endsWith(key));
    if (!hit) continue;
    const tr = DATA.tags[hit], n = tr.values.length;
    const d = n > 1 ? tr.values[n - 1] - tr.values[n - 2] : 0;
    tiles.append(tile(label, fmt(tr.values[n - 1]),
                      (d >= 0 ? "+" : "") + fmt(d) + " vs prev"));
  }
  const grid = document.getElementById("grid");
  grid.replaceChildren();
  for (const tag of tags)
    grid.append(chartCard(tag, DATA.tags[tag].steps, DATA.tags[tag].values));
  const meta = document.getElementById("meta");
  meta.textContent = (DATA.logdir || "") + " — " + tags.length +
                     " tags, refreshed " + new Date().toLocaleTimeString();
}

document.getElementById("tagq").addEventListener("input", ev => {
  query = ev.target.value.trim().toLowerCase(); render();
});

async function tick() {
  const app = document.getElementById("app");
  try {
    app.classList.add("stale");           // hold previous render, dimmed
    const r = await fetch("data.json");
    DATA = await r.json();
    render();
  } catch (e) { /* keep the previous render */ }
  app.classList.remove("stale");
  setTimeout(tick, REFRESH_MS);
}
tick();
</script></body></html>
"""


class ScalarStore:
    """Polls a run directory's TB event files into bounded tag histories."""

    def __init__(self, logdir: str, keep, window: int = 512):
        self.logdir = logdir
        self._keep = keep
        self._window = window
        self._offsets = {}
        self._history = {}
        self._lock = threading.Lock()

    def poll(self) -> None:
        for path in find_event_files(self.logdir):
            events, self._offsets[path] = read_scalars(
                path, self._offsets.get(path, 0)
            )
            with self._lock:
                for ev in events:
                    if not self._keep(ev.tag):
                        continue
                    if ev.tag not in self._history:
                        self._history[ev.tag] = (
                            collections.deque(maxlen=self._window),
                            collections.deque(maxlen=self._window),
                        )
                    steps, vals = self._history[ev.tag]
                    steps.append(ev.step)
                    vals.append(ev.value)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "logdir": self.logdir,
                "tags": {
                    tag: {"steps": list(s), "values": [float(v) for v in va]}
                    for tag, (s, va) in self._history.items()
                },
            }


def make_handler(store: ScalarStore, refresh_ms: int):
    page = _HTML.replace("__REFRESH_MS__", str(int(refresh_ms))).encode()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, ctype, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?", 1)[0]
            if path in ("/", "/index.html"):
                self._send(200, "text/html; charset=utf-8", page)
            elif path == "/data.json":
                body = json.dumps(store.snapshot()).encode()
                self._send(200, "application/json", body)
            else:
                self._send(404, "text/plain", b"not found")

    return Handler


def serve_dashboard(logdir: str, keep, port: int, interval: float,
                    window: int = 512, poll_forever: bool = True):
    """Start the HTTP dashboard; blocks.  ``keep(tag) -> bool`` filters tags."""
    store = ScalarStore(logdir, keep, window=window)
    store.poll()

    if poll_forever:
        def loop():
            while True:
                time.sleep(interval)
                try:
                    store.poll()
                except Exception:
                    pass

        threading.Thread(target=loop, daemon=True).start()

    srv = ThreadingHTTPServer(
        ("0.0.0.0", port), make_handler(store, int(interval * 1000))
    )
    print(f"dashboard: http://localhost:{port}/  (watching {logdir})")
    srv.serve_forever()
