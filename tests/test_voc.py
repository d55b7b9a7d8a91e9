"""VOC dataset + evaluator: oracle detections must give mAP50 = 1."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from eop_tpu.data.augment import ValTransform
from eop_tpu.data.dataloading import DataLoader
from eop_tpu.data.voc import VOCDetection
from eop_tpu.data.voc_classes import VOC_CLASSES
from eop_tpu.eval import Detections
from eop_tpu.eval.voc_evaluator import VOCEvaluator


def _write_voc(root, n_images=4, seed=0):
    rng = np.random.RandomState(seed)
    year_dir = os.path.join(root, "VOC2007")
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(os.path.join(year_dir, sub), exist_ok=True)
    names = []
    gt = {}
    for i in range(n_images):
        name = f"{i:06d}"
        names.append(name)
        h, w = 120, 160
        cv2.imwrite(
            os.path.join(year_dir, "JPEGImages", name + ".jpg"),
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8),
        )
        ann = ET.Element("annotation")
        size = ET.SubElement(ann, "size")
        ET.SubElement(size, "width").text = str(w)
        ET.SubElement(size, "height").text = str(h)
        ET.SubElement(size, "depth").text = "3"
        boxes = []
        for _ in range(2):
            bw, bh = int(rng.randint(20, 50)), int(rng.randint(20, 50))
            x = int(rng.randint(1, w - bw))
            y = int(rng.randint(1, h - bh))
            cls = rng.choice(["cat", "dog"])
            obj = ET.SubElement(ann, "object")
            ET.SubElement(obj, "name").text = cls
            ET.SubElement(obj, "pose").text = "Unspecified"
            ET.SubElement(obj, "truncated").text = "0"
            ET.SubElement(obj, "difficult").text = "0"
            bb = ET.SubElement(obj, "bndbox")
            ET.SubElement(bb, "xmin").text = str(x)
            ET.SubElement(bb, "ymin").text = str(y)
            ET.SubElement(bb, "xmax").text = str(x + bw)
            ET.SubElement(bb, "ymax").text = str(y + bh)
            boxes.append((x, y, x + bw, y + bh, cls))
        gt[name] = boxes
        ET.ElementTree(ann).write(
            os.path.join(year_dir, "Annotations", name + ".xml")
        )
    with open(
        os.path.join(year_dir, "ImageSets", "Main", "test.txt"), "w"
    ) as f:
        f.write("\n".join(names) + "\n")
    return gt


def test_voc_evaluator_oracle(tmp_path):
    root = str(tmp_path)
    _write_voc(root)
    img_size = (128, 128)
    ds = VOCDetection(
        data_dir=root, image_sets=[("2007", "test")], img_size=img_size,
        preproc=ValTransform(),
    )
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=0)
    evaluator = VOCEvaluator(loader, img_size, 0.01, 0.65,
                             num_classes=len(VOC_CLASSES))

    max_det = 10

    class Oracle:
        # idempotent: evaluators warm infer_fn by repeating the first
        # batch (real infer_fns are pure); cache per batch content
        def __init__(self):
            self.idx = 0
            self._cache = {}

        def __call__(self, imgs):
            key = hash(np.asarray(imgs).tobytes())
            if key not in self._cache:
                self._cache[key] = self._compute(imgs)
            return self._cache[key]

        def _compute(self, imgs):
            b = imgs.shape[0]
            rows = np.zeros((b, max_det, 7), np.float32)
            valid = np.zeros((b, max_det), bool)
            for i in range(b):
                anno = ds.annotations[self.idx][0]  # pre-scaled xyxy+cls
                n = min(len(anno), max_det)
                rows[i, :n, 0:4] = anno[:n, 0:4]
                rows[i, :n, 4] = 0.9
                rows[i, :n, 5] = 1.0
                rows[i, :n, 6] = anno[:n, 4]
                valid[i, :n] = True
                self.idx += 1
            return Detections(rows=jnp.asarray(rows),
                              valid=jnp.asarray(valid))

    map5095, map50, summary = evaluator.evaluate(Oracle())
    # the reference's _do_python_eval averages over all 20 classes, so a
    # 2-class synthetic set tops out at 2/20 (cat + dog at AP 1.0 each)
    assert map50 == pytest.approx(2 / 20, abs=1e-6)
    assert map5095 > 0.08


def test_voc_real_model_e2e(tmp_path):
    """Full VOC path with a real (random-weight) model: exp config ->
    VOCdevkit tree -> eval loader -> jitted infer_fn (fwd+decode+NMS) ->
    VOC results files -> voc_eval mAP (ref
    `yolox/evaluators/voc_evaluator.py:19-208` driven end-to-end)."""
    import importlib.util
    import jax
    import jax.numpy as jnp

    from eop_tpu.models import init_model

    devkit = tmp_path / "VOCdevkit"
    devkit.mkdir()
    _write_voc(str(devkit), n_images=3, seed=3)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_voc_exp",
        os.path.join(repo, "exps", "example", "yolox_voc",
                     "yolox_voc_s.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    exp = mod.Exp()
    exp.data_dir = str(tmp_path)
    exp.merge(["width", "0.25", "test_size", "(128,128)",
               "input_size", "(128,128)", "test_conf", "0.01"])

    model = exp.get_model()
    variables = init_model(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )
    evaluator = exp.get_evaluator(batch_size=2)
    map5095, map50, summary = exp.eval(model, variables, evaluator)
    assert np.isfinite(map50) and np.isfinite(map5095)
    assert 0.0 <= map50 <= 1.0
    assert "mAP" in summary or "Average forward time" in summary, summary


def test_voc_eval_randomized_parity_vs_reference(tmp_path):
    """The restructured voc_eval (image-grouped matching, suffix-max AP)
    must agree with the reference's transcription of the canonical
    py-faster-rcnn protocol on randomized dets: ties in confidence,
    difficult GT, duplicate detections, images with no GT of the class,
    both AP metrics."""
    import importlib.util

    from eop_tpu.eval.voc_eval import voc_eval

    spec = importlib.util.spec_from_file_location(
        "_ref_voc_eval", "/root/reference/yolox/evaluators/voc_eval.py"
    )
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    rng = np.random.RandomState(7)
    year = tmp_path / "VOC2007"
    for sub in ("Annotations", "ImageSets/Main"):
        (year / sub).mkdir(parents=True)
    names = [f"{i:06d}" for i in range(6)]
    for name in names:
        ann = ET.Element("annotation")
        for _ in range(int(rng.randint(0, 4))):
            x, y = rng.randint(0, 80, 2)
            bw, bh = rng.randint(10, 60, 2)
            obj = ET.SubElement(ann, "object")
            ET.SubElement(obj, "name").text = str(
                rng.choice(["cat", "dog"])
            )
            ET.SubElement(obj, "pose").text = "Unspecified"
            ET.SubElement(obj, "truncated").text = "0"
            ET.SubElement(obj, "difficult").text = str(
                int(rng.rand() < 0.3)
            )
            bb = ET.SubElement(obj, "bndbox")
            for tag, v in zip(("xmin", "ymin", "xmax", "ymax"),
                              (x, y, x + bw, y + bh)):
                ET.SubElement(bb, tag).text = str(int(v))
        ET.ElementTree(ann).write(str(year / "Annotations" / (name + ".xml")))
    (year / "ImageSets" / "Main" / "test.txt").write_text(
        "\n".join(names) + "\n"
    )

    det_file = tmp_path / "det_{}.txt"
    lines = []
    for _ in range(60):
        name = names[rng.randint(len(names))]
        x, y = rng.randint(0, 90, 2)
        bw, bh = rng.randint(8, 70, 2)
        conf = round(float(rng.rand()), 2)  # coarse -> frequent ties
        lines.append(f"{name} {conf} {x} {y} {x + bw} {y + bh}")
    (tmp_path / "det_cat.txt").write_text("\n".join(lines) + "\n")

    for use_07 in (False, True):
        got = voc_eval(
            str(det_file), str(year / "Annotations" / "{}.xml"),
            str(year / "ImageSets" / "Main" / "test.txt"), "cat",
            str(tmp_path / "cache_ours"), ovthresh=0.5,
            use_07_metric=use_07,
        )
        want = ref.voc_eval(
            str(det_file), str(year / "Annotations" / "{}.xml"),
            str(year / "ImageSets" / "Main" / "test.txt"), "cat",
            str(tmp_path / "cache_ref"), ovthresh=0.5,
            use_07_metric=use_07,
        )
        np.testing.assert_allclose(got[0], want[0], err_msg="recall")
        np.testing.assert_allclose(got[1], want[1], err_msg="precision")
        assert got[2] == pytest.approx(want[2], abs=1e-12), f"07={use_07}"

    # empty det file -> the reference's scalar triple
    (tmp_path / "det_dog.txt").write_text("")
    assert voc_eval(
        str(det_file), str(year / "Annotations" / "{}.xml"),
        str(year / "ImageSets" / "Main" / "test.txt"), "dog",
        str(tmp_path / "cache_ours2"),
    ) == (0.0, 0.0, 0.0)
