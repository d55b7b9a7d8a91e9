"""StableHLO serving export: the serialized artifact must reproduce the
live serving program bit-for-bit and load without any framework code
objects (utils/serving_export.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eop_tpu.exp import Exp
from eop_tpu.exp.yolox_24p_base import Exp24P
from eop_tpu.models import init_model
from eop_tpu.utils.serving_export import (
    export_serving,
    load_serving_artifact,
    save_serving_artifact,
)


def _tiny(exp):
    exp.depth, exp.width = 0.33, 0.125
    exp.num_classes = 3
    exp.input_size = exp.test_size = (64, 64)
    exp.test_conf = 0.05
    model = exp.get_model()
    variables = init_model(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    return exp, model, variables


@pytest.mark.parametrize("family", ["bbox", "24p"])
def test_export_roundtrip_matches_live(tmp_path, family):
    exp, model, variables = _tiny(Exp() if family == "bbox" else Exp24P())
    src_hw = (48, 80)  # non-square raw input exercises the letterbox
    exported = export_serving(
        exp, model, variables, batch_size=2, src_hw=src_hw,
        platforms=("cpu",),
    )
    path = str(tmp_path / f"serving_{family}.stablehlo")
    size = save_serving_artifact(exported, path)
    assert size > 1000

    raw = np.random.RandomState(0).randint(
        0, 255, (2, *src_hw, 3), np.uint8
    )
    live = exp.get_serving_fn(model, variables, src_hw)(raw)
    art = load_serving_artifact(path)
    out = art.call(raw)
    np.testing.assert_array_equal(
        np.asarray(out["valid"]), np.asarray(live.valid)
    )
    np.testing.assert_array_equal(
        np.asarray(out["rows"]), np.asarray(live.rows)
    )


def test_export_cli(tmp_path):
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "cli.stablehlo")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "export_serving.py"),
         "-n", "yolox-s", "--batch", "1", "--out", out, "--smoke",
         "width", "0.125", "num_classes", "2",
         "input_size", "(64,64)", "test_size", "(64,64)"],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "exported" in r.stdout and "smoke:" in r.stdout, r.stdout
    assert os.path.getsize(out) > 1000
