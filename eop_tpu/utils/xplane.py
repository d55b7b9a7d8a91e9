"""Minimal XPlane (jax.profiler trace) reader — no TensorFlow dependency.

The reference's profiling story is thop FLOPs + host timers; ours is
`jax.profiler` device traces (see `profiler.py`).  The trace viewer needs
TensorBoard's profile plugin, which is absent from this image, so this
module decodes the `*.xplane.pb` protobuf by hand (generic wire-format
walk + the XPlane schema's stable field numbers) and aggregates per-op
device time — enough for "where do the milliseconds go" tables on hosts
with nothing installed.

Schema (tsl/profiler/protobuf/xplane.proto):
  XSpace:        planes = 1 (repeated XPlane)
  XPlane:        id=1, name=2, lines=3, event_metadata=4 (map),
                 stat_metadata=5 (map)
  XLine:         id=1, name=2, events=4   (verified on jax 0.9 traces)
  XEvent:        metadata_id=1, offset_ps=2, duration_ps=3, stats=4
  XEventMetadata id=1, name=2 (may be the full HLO text), display_name=3
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message payload."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wt == 1:  # fixed64
            val = int.from_bytes(buf[pos:pos + 8], "little")
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:  # fixed32
            val = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        else:  # groups unsupported/absent
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _parse_event(buf: bytes) -> Tuple[int, int]:
    """XEvent -> (metadata_id, duration_ps)."""
    mid = dur = 0
    for field, wt, val in iter_fields(buf):
        if field == 1 and wt == 0:
            mid = val
        elif field == 3 and wt == 0:
            dur = val
    return mid, dur


def _parse_line(buf: bytes) -> Tuple[str, List[Tuple[int, int]]]:
    name = ""
    events = []
    for field, wt, val in iter_fields(buf):
        if field == 2 and wt == 2:
            try:
                name = val.decode("utf-8")
            except UnicodeDecodeError:
                pass
        elif field == 4 and wt == 2:
            events.append(_parse_event(val))
    return name, events


def _parse_metadata_entry(buf: bytes) -> Tuple[int, str]:
    """map<int64, XEventMetadata> entry -> (id, short name).

    XEventMetadata.name can be the full HLO instruction text
    ('%fusion.3 = bf16[...] ...'); the identifier before ' = ' is kept."""
    key = 0
    name = ""
    display = ""
    for field, wt, val in iter_fields(buf):
        if field == 1 and wt == 0:
            key = val
        elif field == 2 and wt == 2:
            for f2, w2, v2 in iter_fields(val):
                if w2 != 2:
                    continue
                try:
                    text = v2.decode("utf-8")
                except UnicodeDecodeError:
                    continue
                if f2 == 2:
                    name = text
                elif f2 == 3:
                    display = text
    short = display or name
    short = short.split(" = ", 1)[0].lstrip("%")
    return key, short


def parse_planes(
    path: str, line_filter: str | None = None
) -> Dict[str, Dict[str, float]]:
    """xplane.pb -> {plane_name: {event_name: total_duration_ms}}.

    ``line_filter``: only aggregate lines whose name contains it (e.g.
    "XLA Ops" to exclude the per-module and async-copy lines, which would
    double-count the same wall time)."""
    with open(path, "rb") as f:
        space = f.read()
    planes: Dict[str, Dict[str, float]] = {}
    for field, wt, val in iter_fields(space):
        if field != 1 or wt != 2:
            continue
        name = ""
        meta: Dict[int, str] = {}
        lines: List[bytes] = []
        for f2, w2, v2 in iter_fields(val):
            if f2 == 2 and w2 == 2:
                try:
                    name = v2.decode("utf-8")
                except UnicodeDecodeError:
                    name = repr(v2)
            elif f2 == 3 and w2 == 2:
                lines.append(v2)
            elif f2 == 4 and w2 == 2:
                k, v = _parse_metadata_entry(v2)
                meta[k] = v
        agg: Dict[str, float] = defaultdict(float)
        for line in lines:
            lname, events = _parse_line(line)
            if line_filter is not None and line_filter not in lname:
                continue
            for mid, dur in events:
                agg[meta.get(mid, f"#{mid}")] += dur / 1e9  # ps -> ms
        planes[name] = dict(agg)
    return planes


def latest_xplane(logdir: str) -> str:
    paths = glob.glob(
        os.path.join(logdir, "plugins", "profile", "*", "*.xplane.pb")
    )
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    return max(paths, key=os.path.getmtime)


def device_op_table(
    logdir: str, top: int = 30, plane_filter: str = "TPU",
    line_filter: str = "XLA Ops", by_category: bool = False,
) -> List[Tuple[str, float]]:
    """Top ops by total device time (ms) across matching planes.

    ``by_category`` groups 'fusion.123' -> 'fusion' etc."""
    path = latest_xplane(logdir)
    planes = parse_planes(path, line_filter=line_filter)
    agg: Dict[str, float] = defaultdict(float)
    for pname, ops in planes.items():
        if plane_filter.lower() in pname.lower():
            for op, ms in ops.items():
                if by_category:
                    op = op.split(".", 1)[0]
                agg[op] += ms
    return sorted(agg.items(), key=lambda kv: -kv[1])[:top]


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("xplane op-time table")
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--plane", default="TPU")
    ap.add_argument("--line", default="XLA Ops")
    ap.add_argument("--by-category", action="store_true")
    ap.add_argument("--list-planes", action="store_true")
    args = ap.parse_args(argv)
    if args.list_planes:
        for name, ops in parse_planes(latest_xplane(args.logdir)).items():
            total = sum(ops.values())
            print(f"{name}: {len(ops)} event kinds, {total:.2f} ms total")
        return
    rows = device_op_table(args.logdir, args.top, args.plane,
                           args.line, args.by_category)
    total = sum(ms for _, ms in rows)
    for op, ms in rows:
        print(f"{ms:10.3f} ms  {op}")
    print(f"{total:10.3f} ms  TOTAL (top {len(rows)})")


if __name__ == "__main__":
    main()
