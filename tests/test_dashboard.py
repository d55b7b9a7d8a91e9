"""Browser dashboard (`tools/watch_train.py --serve` →
`eop_tpu/utils/dashboard.py`): scalar store ingestion from real TB event
files and the HTTP surface (page, JSON snapshot, 404).

The page itself is static inline HTML/JS (no JS engine in CI); these
tests pin the data contract the page consumes.
"""

import json
import threading
import urllib.request

import pytest

tbx = pytest.importorskip("tensorboardX")

from eop_tpu.utils.dashboard import ScalarStore, make_handler


@pytest.fixture()
def run_dir(tmp_path):
    w = tbx.SummaryWriter(str(tmp_path / "tensorboard"))
    for step in range(5):
        w.add_scalar("train/total_loss", 50.0 - step, step)
        w.add_scalar("iou_loss/radius_00", 1.0, step)  # filtered out
    w.add_scalar("val/AP50", 0.5, 1)
    w.close()
    return tmp_path


def keep(tag):
    return not tag.startswith(("iou_loss/", "dwa_weight/"))


def test_scalar_store_reads_and_filters(run_dir):
    store = ScalarStore(str(run_dir), keep)
    store.poll()
    snap = store.snapshot()
    assert set(snap["tags"]) == {"train/total_loss", "val/AP50"}
    tl = snap["tags"]["train/total_loss"]
    assert tl["steps"] == [0, 1, 2, 3, 4]
    assert tl["values"][0] == pytest.approx(50.0)
    # incremental second poll: no duplicated events
    store.poll()
    assert store.snapshot()["tags"]["train/total_loss"]["steps"] == tl["steps"]


def test_http_surface(run_dir):
    from http.server import ThreadingHTTPServer

    store = ScalarStore(str(run_dir), keep)
    store.poll()
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(store, 5000)
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10
        ).read().decode()
        assert "eop_tpu training dashboard" in html
        assert "5000" in html  # refresh interval substituted in

        data = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/data.json", timeout=10
        ).read())
        assert data["tags"]["train/total_loss"]["values"][-1] == pytest.approx(46.0)

        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/../etc/passwd", timeout=10
            )
        assert ei.value.code == 404
    finally:
        srv.shutdown()
