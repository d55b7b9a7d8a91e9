"""Live terminal monitor for a running (or finished) training run.

Tails the trainer's TensorBoard event stream (no TensorFlow needed —
`eop_tpu/utils/tb_reader.py`) and renders a compact refreshing table:
last value, step, trend sparkline per scalar tag.

    python tools/watch_train.py <output_dir>/<exp_name>  [--interval 5]
    python tools/watch_train.py /tmp/eop_out/yolox_s --tags train/,val/
    python tools/watch_train.py <dir> --once        # one snapshot, no loop
    python tools/watch_train.py <dir> --serve 8888  # live browser dashboard
                                                    # (eop_tpu/utils/dashboard.py)

Observability the reference lacks: its only live view is the tqdm bar;
TB streams require a tensorboard server.  This reads the same files the
trainers already write (`train/trainer.py`, `train/trainer_24p.py`),
so it attaches to any past or in-flight run with zero trainer changes.
"""

from __future__ import annotations

import argparse
import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eop_tpu.utils.tb_reader import find_event_files, read_scalars

SPARK = "▁▂▃▄▅▆▇█"


def sparkline(values, width=32) -> str:
    if not values:
        return ""
    tail = values[-width:]
    lo, hi = min(tail), max(tail)
    if hi - lo < 1e-12:
        return SPARK[0] * len(tail)
    return "".join(
        SPARK[int((v - lo) / (hi - lo) * (len(SPARK) - 1))] for v in tail
    )


def render(history, clear=True) -> str:
    lines = []
    if clear:
        lines.append("\x1b[2J\x1b[H")
    now = time.strftime("%H:%M:%S")
    lines.append(f"eop_tpu watch_train — {now}")
    lines.append(f"{'tag':<28} {'step':>8} {'last':>12} trend")
    lines.append("-" * 84)
    for tag in sorted(history):
        steps, vals = history[tag]
        lines.append(
            f"{tag:<28.28} {steps[-1]:>8} {vals[-1]:>12.5g} "
            f"{sparkline(list(vals))}"
        )
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser("watch_train")
    ap.add_argument("logdir", help="run dir (searched recursively for "
                                   "TB event files)")
    ap.add_argument("--interval", type=float, default=5.0)
    ap.add_argument("--tags", type=str, default=None,
                    help="comma list of tag prefixes to show "
                         "(default: all except the 24 per-radius and "
                         "per-weight streams)")
    ap.add_argument("--once", action="store_true",
                    help="print one snapshot and exit")
    ap.add_argument("--window", type=int, default=256,
                    help="points kept per tag for the sparkline")
    ap.add_argument("--serve", type=int, metavar="PORT", default=None,
                    help="serve a live browser dashboard on this port "
                         "instead of the terminal table (self-contained "
                         "HTML: stat tiles, per-tag line charts with "
                         "crosshair tooltips, table fallback, dark mode)")
    args = ap.parse_args()

    prefixes = args.tags.split(",") if args.tags else None

    def keep(tag: str) -> bool:
        if prefixes is not None:
            return any(tag.startswith(p) for p in prefixes)
        # default view: drop the 24-wide per-radius/DWA fan-out streams
        return not tag.startswith(("iou_loss/", "dwa_weight/"))

    if args.serve is not None:
        from eop_tpu.utils.dashboard import serve_dashboard

        serve_dashboard(args.logdir, keep, args.serve, args.interval,
                        window=args.window)
        return

    offsets = {}
    history = {}
    while True:
        for path in find_event_files(args.logdir):
            events, offsets[path] = read_scalars(
                path, offsets.get(path, 0)
            )
            for ev in events:
                if not keep(ev.tag):
                    continue
                if ev.tag not in history:
                    history[ev.tag] = (
                        collections.deque(maxlen=args.window),
                        collections.deque(maxlen=args.window),
                    )
                steps, vals = history[ev.tag]
                steps.append(ev.step)
                vals.append(ev.value)
        if not history:
            print(f"(no scalar events under {args.logdir} yet)")
        else:
            print(render(history, clear=not args.once))
        if args.once:
            return
        time.sleep(args.interval)


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        pass
