"""TB scalar reader (utils/tb_reader.py): roundtrip against the same
tensorboardX writer the trainers use, incremental tailing, and the
watch_train CLI snapshot."""

import math
import os
import subprocess
import sys

import numpy as np

from eop_tpu.utils.tb_reader import find_event_files, read_scalars


def _write_run(logdir, n=20):
    from tensorboardX import SummaryWriter

    w = SummaryWriter(logdir)
    for step in range(n):
        w.add_scalar("train/total_loss", 10.0 * math.exp(-step / 7.0),
                     step)
        w.add_scalar("val/AP50", step / n, step)
    w.close()


def test_roundtrip_and_tail(tmp_path):
    logdir = str(tmp_path / "run")
    _write_run(logdir)
    files = find_event_files(logdir)
    assert len(files) == 1

    events, offset = read_scalars(files[0])
    by_tag = {}
    for ev in events:
        by_tag.setdefault(ev.tag, []).append((ev.step, ev.value))
    assert set(by_tag) == {"train/total_loss", "val/AP50"}
    assert [s for s, _ in by_tag["val/AP50"]] == list(range(20))
    np.testing.assert_allclose(
        [v for _, v in by_tag["train/total_loss"]],
        [10.0 * math.exp(-s / 7.0) for s in range(20)],
        rtol=1e-6,
    )

    # tail: nothing new at the returned offset...
    again, offset2 = read_scalars(files[0], offset)
    assert again == [] and offset2 == offset

    # ...then appended events surface incrementally
    from tensorboardX import SummaryWriter

    w = SummaryWriter(logdir, filename_suffix=".second")
    w.add_scalar("train/total_loss", 0.5, 99)
    w.close()
    new_file = [f for f in find_event_files(logdir) if f != files[0]]
    assert new_file
    fresh, _ = read_scalars(new_file[0])
    assert any(ev.step == 99 and ev.value == 0.5 for ev in fresh)


def test_watch_train_cli_once(tmp_path):
    logdir = str(tmp_path / "run")
    _write_run(logdir, n=5)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "watch_train.py"),
         logdir, "--once"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "train/total_loss" in r.stdout and "val/AP50" in r.stdout
    # sparkline rendered something non-flat for the decaying loss
    assert any(c in r.stdout for c in "▂▃▄▅▆▇█")
