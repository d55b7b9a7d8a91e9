"""Dependency-free TensorBoard scalar reader.

The trainers stream their full metric surface (losses, LR, the 24
per-radius IoU losses + DWA weights, val AP) to tensorboardX event
files (`train/trainer*.py`).  This module reads those scalars back
without TensorFlow/tensorboard installed — a ~100-line TFRecord +
protobuf-wire parser covering exactly what ``add_scalar`` emits
(Event{wall_time, step, summary{value{tag, simple_value}}}).

Used by ``tools/watch_train.py`` (live terminal monitor) and usable for
post-hoc analysis; the reference has no way to read its own TB streams
back (it only writes them, `yolox_24p/train_24p.py:115-137`).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, List, NamedTuple, Tuple


class ScalarEvent(NamedTuple):
    wall_time: float
    step: int
    tag: str
    value: float


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, payload) over a proto buffer.

    Payloads: varint fields yield the 10-byte-max varint slice decoded
    by the caller via ``_varint(payload, 0)[0]``; fixed32/64 yield the
    raw bytes; length-delimited yield the contents.
    """
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, j = _varint(buf, i)
            yield field, wire, buf[i:j]
            i = j
        elif wire == 1:  # fixed64
            yield field, wire, buf[i:i + 8]
            i += 8
        elif wire == 2:  # length-delimited
            ln, i = _varint(buf, i)
            yield field, wire, buf[i:i + ln]
            i += ln
        elif wire == 5:  # fixed32
            yield field, wire, buf[i:i + 4]
            i += 4
        else:  # groups (3/4): not emitted by any TB writer
            raise ValueError(f"unsupported wire type {wire}")


def _parse_event(record: bytes) -> List[ScalarEvent]:
    wall_time, step, out = 0.0, 0, []
    summaries = []
    for field, wire, payload in _fields(record):
        if field == 1 and wire == 1:
            wall_time = struct.unpack("<d", payload)[0]
        elif field == 2 and wire == 0:
            step = _varint(payload, 0)[0]
        elif field == 5 and wire == 2:
            summaries.append(payload)
    for summary in summaries:
        for field, wire, payload in _fields(summary):
            if field != 1 or wire != 2:
                continue  # Summary.value entries only
            tag, value = None, None
            for f2, w2, p2 in _fields(payload):
                if f2 == 1 and w2 == 2:
                    tag = p2.decode("utf-8", "replace")
                elif f2 == 2 and w2 == 5:
                    value = struct.unpack("<f", p2)[0]
            if tag is not None and value is not None:
                out.append(ScalarEvent(wall_time, step, tag, value))
    return out


def read_scalars(path: str, offset: int = 0):
    """Parse scalars from a TB event file starting at byte ``offset``.

    Returns ``(events, new_offset)`` — pass ``new_offset`` back in to
    tail a file a live trainer is still appending to.  A partial record
    at the tail is left for the next call.
    """
    events: List[ScalarEvent] = []
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read()
    i, n = 0, len(data)
    while i + 12 <= n:
        (length,) = struct.unpack("<Q", data[i:i + 8])
        # framing: len(8) + len_crc(4) + payload + payload_crc(4)
        end = i + 12 + length + 4
        if end > n:
            break
        events.extend(_parse_event(data[i + 12:i + 12 + length]))
        i = end
    return events, offset + i


def find_event_files(logdir: str) -> List[str]:
    """All TB event files under ``logdir``, oldest first."""
    hits = []
    for root, _, files in os.walk(logdir):
        for name in files:
            if "tfevents" in name:
                path = os.path.join(root, name)
                hits.append((os.path.getmtime(path), path))
    return [p for _, p in sorted(hits)]
