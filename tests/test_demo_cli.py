"""tools/demo.py e2e: image, folder, video, and int8 inputs for both model
families on tiny models (capability surface the reference exposes only as
helpers, `yolox/utils/demo_utils.py:17-124` + `yolox_24p/show_24p.py`)."""

import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)

import demo as demo_cli  # noqa: E402  (tools/demo.py)

TINY = ["depth", "0.33", "width", "0.125", "num_classes", "3"]


def _scene(path, w=96, h=72):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3), np.uint8)
    cv2.rectangle(img, (10, 10), (40, 40), (0, 255, 0), -1)
    cv2.imwrite(str(path), img)


def _run(argv):
    old = sys.argv
    sys.argv = ["demo.py"] + argv
    try:
        return demo_cli.main()
    finally:
        sys.argv = old


def test_demo_bbox_folder(tmp_path):
    src = tmp_path / "imgs"
    src.mkdir()
    _scene(src / "a.jpg")
    _scene(src / "b.png", w=80, h=80)
    out = tmp_path / "out"
    _run(["-f", "exps/default/yolox_s.py", "-p", str(src),
          "--tsize", "64", "--conf", "0.05", "--save-dir", str(out)] + TINY)
    assert sorted(p.name for p in out.iterdir()) == ["a.jpg", "b.png"]
    assert cv2.imread(str(out / "a.jpg")).shape == (72, 96, 3)


def test_demo_bbox_int8_single_image(tmp_path):
    img = tmp_path / "one.jpg"
    _scene(img)
    out = tmp_path / "out"
    _run(["-f", "exps/default/yolox_s.py", "-p", str(img), "--int8",
          "--quant-min-channels", "8", "--tsize", "64",
          "--save-dir", str(out)] + TINY)
    assert (out / "one.jpg").exists()


def test_demo_24p_image(tmp_path):
    img = tmp_path / "one.jpg"
    _scene(img)
    out = tmp_path / "out"
    _run(["-f", "load_eval/yolox_24p_eval.py", "-p", str(img),
          "--tsize", "64", "--conf", "0.05", "--save-dir", str(out)] + TINY)
    assert (out / "one.jpg").exists()


def test_demo_video(tmp_path):
    clip = tmp_path / "clip.avi"
    writer = cv2.VideoWriter(
        str(clip), cv2.VideoWriter_fourcc(*"MJPG"), 5.0, (96, 72)
    )
    rng = np.random.RandomState(1)
    for _ in range(4):
        writer.write(rng.randint(0, 255, (72, 96, 3), np.uint8))
    writer.release()
    out = tmp_path / "out"
    _run(["-f", "exps/default/yolox_s.py", "-p", str(clip),
          "--tsize", "64", "--save-dir", str(out)] + TINY)
    vid = out / "clip.avi"
    assert vid.exists()
    cap = cv2.VideoCapture(str(vid))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4
    cap.release()
