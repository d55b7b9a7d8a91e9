"""Spatial (height-dim) partitioning on a 2-D (data, space) mesh.

This is the scaling axis the reference cannot express at all — its DDP
replicates the model per GPU and needs batch >= world size
(`yolox/core/launch.py:39-147`); here one image's conv FLOPs and
activation memory spread over the space axis via GSPMD halo exchange,
serving high-resolution / small-batch regimes.

Correctness notes encoded by these tests (the hard-won ones):

* Sharded-vs-single gradients agree to ~1e-8 in float64 at every size —
  there is NO partitioner miscompile.  In float32 the same comparison
  shows O(1e-2) relative noise on individual elements: sharded BN
  reduces (N, H, W) in a different order, the ~1e-7 activation
  perturbation flips near-tie pool argmaxes (SPP's k=13 windows on tiny
  padded grids are tie-rich), and a flipped argmax reroutes that
  window's whole gradient.  Any future grad-parity harness MUST pass
  ``dtype=jnp.float64`` to the module constructor — the blocks cast
  activations to ``self.dtype`` internally, so casting params/inputs
  outside produces an f32-vs-f32 comparison that looks like a compiler
  bug (it cost a day once).
* Inference (train=False) has no *batch* reductions — BN uses running
  stats, conv reductions are per-output-pixel — but GSPMD decomposes
  each conv spatially (halo exchange), so the within-window reduction
  order at shard boundaries differs from the single-device program and
  fp32 outputs drift by ~1 ulp.  Sharded inference therefore matches
  single-device to tight fp32 tolerance, not bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

needs8 = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


# Runs in a fresh subprocess: x64 must be on before JAX initializes, and
# flipping jax_enable_x64 mid-process would poison the other tests'
# cached traces.
_F64_GRAD_CHILD = r"""
import sys
import numpy as np
import jax
# a site hook may override the JAX_PLATFORMS env var at import time; the
# config route wins while no backend is initialized (cf. __graft_entry__)
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import jax.tree_util as jtu
from jax.sharding import NamedSharding, PartitionSpec as P

from eop_tpu.models.darknet import CSPDarknet
from eop_tpu.parallel import image_spec, make_mesh, trace_mesh

def grads(size, mesh=None):
    mod = CSPDarknet(0.33, 0.25, out_features=("dark5",), dtype=jnp.float64)
    rs = np.random.RandomState(0)
    x = rs.rand(8, size, size, 3)
    variables = jax.device_get(
        mod.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, size, size, 3), jnp.float64), True))
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss(p, xx):
        outs, _ = mod.apply({"params": p, **rest}, xx, True,
                            mutable=["batch_stats"])
        return jnp.sum(outs["dark5"] ** 2)

    if mesh is None:
        return jax.device_get(jax.jit(jax.grad(loss))(params, x))
    repl = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, image_spec(mesh))
    with trace_mesh(mesh):
        return jax.device_get(
            jax.jit(jax.grad(loss), in_shardings=(repl, sh),
                    out_shardings=repl)(params, x))

for size in (int(a) for a in sys.argv[1:]):
    g1 = grads(size)
    gs = grads(size, make_mesh(8, spatial=2))
    worst = max(
        float(np.max(np.abs(b - a))) / (float(np.max(np.abs(a))) + 1e-30)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gs)))
    assert worst < 1e-6, f"size={size}: worst rel err {worst:.3e}"
    print(f"size={size}: OK worst rel {worst:.3e}", flush=True)
"""


@needs8
def test_spatial_grads_exact_f64(tmp_path):
    """Backbone grads on a (4, 2) data x space mesh == single device, in
    float64 (the only dtype where 'equal' is well-posed — see module
    docstring).  64 px is the nastiest config: dark5's grid is 2x2, the
    k=13 SPP windows are nearly all padding."""
    import os
    import subprocess
    import sys

    script = tmp_path / "f64_grads.py"
    script.write_text(_F64_GRAD_CHILD)
    env = dict(os.environ)
    env["JAX_ENABLE_X64"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(script), "64", "128"],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "size=64: OK" in proc.stdout and "size=128: OK" in proc.stdout


@needs8
def test_spatial_inference_matches_single_device():
    """train=False forward must match single-device to tight fp32
    tolerance (not bitwise: GSPMD's spatial conv decomposition reorders
    within-window reductions at shard boundaries — module docstring),
    with the same detections surviving and batch-sharded out."""
    from eop_tpu.exp.yolox_24p_base import Exp24P
    from eop_tpu.models import init_model
    from eop_tpu.parallel import make_mesh, shard_batch

    exp = Exp24P()
    exp.num_classes = 4
    exp.depth, exp.width = 0.33, 0.25
    exp.test_size = (128, 128)
    exp.test_conf = 1e-4
    model = exp.get_model()
    variables = init_model(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
    )

    rng = np.random.RandomState(3)
    imgs = (rng.rand(8, 128, 128, 3) * 255).astype(np.float32)

    ref = jax.device_get(exp.get_infer_fn(model, variables)(imgs))

    mesh = make_mesh(8, spatial=2)
    sharded = exp.get_sharded_infer_fn(model, variables, mesh)
    with mesh:
        out = sharded(shard_batch(mesh, imgs))
    got = jax.device_get(out)

    np.testing.assert_array_equal(ref.valid, got.valid)
    np.testing.assert_allclose(ref.rows, got.rows, rtol=1e-4, atol=1e-4)
    assert np.asarray(got.valid).sum() > 0


@needs8
def test_spatial_train_step_8dev():
    """One full 24p train step on a (4, 2) mesh: images height-sharded,
    labels batch-sharded, state replicated in and out, loss finite."""
    from eop_tpu.losses import Loss24PConfig
    from eop_tpu.models import YOLOX
    from eop_tpu.parallel import make_mesh, shard_batch, shard_train_step
    from eop_tpu.train import build_sgd, create_train_state, make_train_step_24p

    mesh = make_mesh(8, spatial=2)
    model = YOLOX(depth=0.33, width=0.25, num_classes=4, reg_dim=26)
    tx = build_sgd(0.01, weight_decay=5e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        use_ema=True, with_dwa=True,
    )
    step = shard_train_step(
        make_train_step_24p(model, tx, Loss24PConfig(num_classes=4)), mesh
    )

    rs = np.random.RandomState(0)
    imgs = rs.rand(4, 64, 64, 3).astype(np.float32)
    labels = np.zeros((4, 50, 51), np.float32)
    ang = np.arange(24) * 15.0 * np.pi / 180.0
    labels[:, 0, 0] = 1.0
    labels[:, 0, 1:3] = (32.0, 32.0)
    labels[:, 0, 3::2] = 32.0 + 10.0 * np.cos(ang)
    labels[:, 0, 4::2] = 32.0 + 10.0 * np.sin(ang)

    with mesh:
        batch = shard_batch(mesh, {"i": imgs, "l": labels})
        # images sharded over BOTH axes (batch x height), labels over data only
        assert len(batch["i"].sharding.device_set) == 8
        assert batch["i"].sharding.spec == P("data", "space")
        assert batch["l"].sharding.spec == P("data")
        state, metrics = step(
            state, batch["i"], batch["l"], jax.random.PRNGKey(1)
        )
    assert np.isfinite(float(metrics["total_loss"]))
    assert int(state.step) == 1
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_make_mesh_rejects_space_group_crossing_hosts():
    """The space axis must not cross processes (shard_batch stitches each
    process's local batch as the host-local portion); make_mesh checks
    the actual reshaped rows, so even an explicit interleaved ``devices=``
    ordering is caught.  The check runs before Mesh construction, so fake
    device objects with just a process_index suffice."""
    from types import SimpleNamespace

    from eop_tpu.parallel import make_mesh

    def dev(proc):
        return SimpleNamespace(process_index=proc)

    # process-interleaved ordering: every (row x space) pair spans hosts
    bad = [dev(0), dev(1), dev(0), dev(1)]
    with pytest.raises(ValueError, match="must not cross hosts"):
        make_mesh(devices=bad, spatial=2)

    # non-divisible device count still raises the split error
    with pytest.raises(ValueError, match="do not split"):
        make_mesh(devices=[dev(0)] * 3, spatial=2)


@needs8
def test_unshard_space_is_noop_without_space_axis():
    from eop_tpu.parallel import make_mesh, trace_mesh, unshard_space

    x = jnp.ones((2, 4, 4, 3))
    assert unshard_space(x) is x          # no mesh traced at all
    with trace_mesh(make_mesh(8)):        # 1-D mesh: no space axis
        assert unshard_space(x) is x
