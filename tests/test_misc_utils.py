"""Coverage for small runtime utilities: prefetcher, dist helpers, meters,
demo NMS, logger."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_device_prefetcher_order_and_exhaustion():
    from eop_tpu.data.dataloading import DevicePrefetcher

    batches = [
        {"x": np.full((2, 3), i, np.float32)} for i in range(4)
    ]
    pf = DevicePrefetcher(iter(batches))
    seen = [float(b["x"][0, 0]) for b in pf]
    assert seen == [0.0, 1.0, 2.0, 3.0]
    assert pf.next() is None


def test_dist_single_host_helpers():
    from eop_tpu.parallel import dist

    assert dist.get_world_size() == 1
    assert dist.is_main_process()
    assert dist.all_gather({"a": [1, 2]}) == [{"a": [1, 2]}]
    assert dist.gather("x", dst=0) == ["x"]
    dist.synchronize()  # no-op single host
    t = dist.time_synchronized()
    assert t > 0


def test_meter_buffer():
    from eop_tpu.utils.metric import MeterBuffer

    mb = MeterBuffer(window_size=3)
    for i in range(5):
        mb.update(loss=float(i), iter_time=0.1)
    assert mb["loss"].latest == 4.0
    assert mb["loss"].avg == pytest.approx((2 + 3 + 4) / 3)
    assert mb["loss"].global_avg == pytest.approx(2.0)
    assert set(mb.get_filtered_meter("time")) == {"iter_time"}


def test_demo_numpy_nms():
    from eop_tpu.utils.demo_utils import multiclass_nms

    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.zeros((3, 2), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8
    scores[2, 1] = 0.7
    dets = multiclass_nms(boxes, scores, nms_thr=0.5, score_thr=0.1,
                          class_agnostic=False)
    assert dets.shape[0] == 2  # duplicate suppressed, classes kept
    assert set(dets[:, 5].astype(int)) == {0, 1}


def test_logger_capture(tmp_path):
    from eop_tpu.utils.logger import logger, setup_logger

    setup_logger(str(tmp_path), 0, filename="t.txt", mode="o")
    logger.info("hello-world-123")
    for h in logger.handlers:
        h.flush()
    content = (tmp_path / "t.txt").read_text()
    assert "hello-world-123" in content


def test_stream_to_logger():
    import logging

    from eop_tpu.utils.logger import StreamToLogger

    records = []

    class H(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    lg = logging.getLogger("cap_test")
    lg.addHandler(H())
    lg.setLevel(logging.INFO)
    s = StreamToLogger(lg)
    print("captured-print", file=s)
    assert any("captured-print" in r for r in records)


def test_setup_env_configure(monkeypatch):
    """configure_omp defaults OMP_NUM_THREADS (without clobbering a user
    value); configure_module clamps cv2 threads and survives restricted
    rlimits (ref `yolox/utils/setup_env.py:28-77`)."""
    import os

    from eop_tpu.utils.setup_env import (
        configure_module,
        configure_omp,
        configure_tpu,
    )

    monkeypatch.delenv("OMP_NUM_THREADS", raising=False)
    configure_omp()
    assert os.environ["OMP_NUM_THREADS"] == "1"
    monkeypatch.setenv("OMP_NUM_THREADS", "7")
    configure_omp()
    assert os.environ["OMP_NUM_THREADS"] == "7"

    configure_module(ulimit_value=4096)  # must not raise
    try:
        import cv2

        assert cv2.getNumThreads() in (0, 1)
    except ImportError:
        pass
    assert configure_tpu() is None


def test_xplane_parser_on_synthetic_trace(tmp_path):
    """The hand-rolled xplane reader parses a real jax.profiler trace and
    attributes device/host op time."""
    import jax
    import jax.numpy as jnp

    from eop_tpu.utils.xplane import (
        device_op_table,
        latest_xplane,
        parse_planes,
    )

    f = jax.jit(lambda a: jnp.tanh(a @ a).sum())
    x = jnp.ones((256, 256))
    float(f(x))
    jax.profiler.start_trace(str(tmp_path))
    for _ in range(3):
        float(f(x))
    jax.profiler.stop_trace()

    planes = parse_planes(latest_xplane(str(tmp_path)))
    assert planes, "no planes parsed"
    # CPU platform in tests: the device plane is the host TFRT/CPU one;
    # just require that SOME plane attributed nonzero op time
    assert any(sum(ops.values()) > 0 for ops in planes.values())
    rows = device_op_table(str(tmp_path), top=5, plane_filter="",
                           line_filter="")
    assert rows and rows[0][1] > 0


def test_hlo_cost_by_source():
    """The HLO cost table attributes estimated cycles to source lines."""
    import jax
    import jax.numpy as jnp

    from eop_tpu.utils.hlo_cost import cost_by_source, format_table

    def f(a, b):
        return jnp.sum(jnp.tanh(a @ b))

    x = jnp.ones((256, 256), jnp.float32)
    txt = jax.jit(f).lower(x, x).compile().as_text()
    rows = cost_by_source(txt, top=10)
    # TPU backends annotate estimated_cycles; the CPU backend may not —
    # the parser must return cleanly either way
    assert isinstance(rows, list)
    table = format_table(rows)
    assert "estimated device time" in table
    if rows:
        key, opn, ms = rows[0]
        assert ms >= 0 and (":" in key or key == "?")
