"""Compiled-HLO cost attribution: estimated device cycles by source line.

The TPU compiler annotates every fusion with ``estimated_cycles`` and the
originating python frame.  Aggregating those gives a "where do the
milliseconds go" table straight from a ``jax.jit(...).lower(...)
.compile().as_text()`` dump — no trace capture needed, and unlike trace
categories it attributes each op to *your* source line.  This table drove
the round-2 train-step pass (SimOTA compaction, max-pool VJP; see
BASELINE.md).

Estimates are serialized worst-case (measured wall time is typically
~0.5× the total because XLA overlaps DMA with compute) — use them for
RANKING, not absolute times.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import List, Tuple

TPU_V5E_HZ = 940e6


def cost_by_source(
    hlo_text: str, top: int = 30
) -> List[Tuple[str, str, float]]:
    """[(file:line, op_name_prefix, est_ms)] sorted by descending cost."""
    agg: Counter = Counter()
    for m in re.finditer(r"^\s+(?:ROOT )?%\S+ = .*$", hlo_text, re.M):
        line = m.group(0)
        cyc = re.search(r'"estimated_cycles":"(\d+)"', line)
        if not cyc:
            continue
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        key = (
            f"{src.group(1).rsplit('/', 1)[-1]}:{src.group(2)}"
            if src else "?"
        )
        op = re.search(r'op_name="([^"]+)"', line)
        agg[(key, (op.group(1) if op else "")[:70])] += int(cyc.group(1))
    rows = [
        (key, opn, cyc / TPU_V5E_HZ * 1e3)
        for (key, opn), cyc in agg.most_common(top)
    ]
    return rows


def format_table(rows, total_ms: float | None = None) -> str:
    out = []
    if total_ms is None:
        total_ms = sum(r[2] for r in rows)
    out.append(f"estimated device time (top {len(rows)}, "
               f"sum {total_ms:.1f} ms-est @940 MHz — rank, don't trust "
               "absolutes):")
    for key, opn, ms in rows:
        out.append(f"{ms:8.2f} ms-est  {key:32s} {opn}")
    return "\n".join(out)
