"""Training-runtime component tests: LR schedules vs the reference's
scheduler functions, EMA ramp vs the reference formula, checkpoint
roundtrip, conv+BN fusion, multiscale preprocess, optimizer wd masking."""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eop_tpu.train.lr_schedule import LRScheduler
from eop_tpu.train.ema import ema_update
from eop_tpu.train.optimizer import build_sgd


def _ref_scheduler():
    spec = importlib.util.spec_from_file_location(
        "_ref_lr", "/root/reference/yolox/utils/lr_scheduler.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_lr"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name,kwargs", [
    ("cos", {}),
    ("warmcos", {"warmup_epochs": 5, "warmup_lr_start": 1e-6}),
    ("yoloxwarmcos", {"warmup_epochs": 5, "warmup_lr_start": 0,
                      "no_aug_epochs": 15, "min_lr_ratio": 0.05}),
    ("multistep", {"milestones": [30, 60], "gamma": 0.1}),
])
def test_lr_schedule_parity(name, kwargs):
    ref = _ref_scheduler()
    iters, epochs, lr = 50, 100, 0.01
    ours = LRScheduler(name, lr, iters, epochs, **kwargs)
    theirs = ref.LRScheduler(name, lr, iters, epochs, **kwargs)
    for it in [0, 1, 10, 249, 250, 251, 2500, 4249, 4250, 4999]:
        np.testing.assert_allclose(
            ours.update_lr(it), theirs.update_lr(it), rtol=1e-12,
            err_msg=f"{name} at iter {it}",
        )


def test_ema_ramp_matches_reference_formula():
    import math

    decay = 0.9998
    params = {"w": jnp.ones((4,)) * 2.0}
    new = {"w": jnp.zeros((4,))}
    for updates in (1, 10, 2000, 100000):
        d = decay * (1 - math.exp(-updates / 2000))  # ref ema.py:44
        out = ema_update(params, new, jnp.asarray(updates, jnp.float32),
                         decay)
        np.testing.assert_allclose(
            np.asarray(out["w"]), 2.0 * d, rtol=1e-4  # f32 exp vs f64
        )


def test_checkpoint_roundtrip(tmp_path):
    from eop_tpu.train.checkpoint import (
        load_checkpoint,
        load_ckpt_partial,
        save_checkpoint,
    )

    state = {
        "params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
        "step": np.asarray(7, np.int32),
    }
    save_checkpoint(state, True, str(tmp_path), "latest",
                    metadata={"start_epoch": 3})
    payload = load_checkpoint(str(tmp_path / "latest_ckpt"))
    np.testing.assert_array_equal(
        payload["state"]["params"]["a"], state["params"]["a"]
    )
    assert payload["metadata"]["start_epoch"] == 3
    # best copy exists
    best = load_checkpoint(str(tmp_path / "best_ckpt"))
    assert int(best["state"]["step"]) == 7

    # partial restore skips mismatched shapes (ref load_ckpt semantics)
    template = {
        "params": {"a": np.zeros((2, 3), np.float32),
                   "b": np.zeros((5,), np.float32)},
        "step": np.asarray(0, np.int32),
    }
    merged, report = load_ckpt_partial(template, payload["state"])
    np.testing.assert_array_equal(
        merged["params"]["a"], state["params"]["a"]
    )
    skipped_keys = [entry[0] for entry in report["skipped"]]
    assert any(k.endswith("b") or k.split("/")[-1] == "b"
               for k in skipped_keys), skipped_keys
    # and the well-shaped leaf must NOT be in the skip list
    assert not any(k.endswith("/a") for k in skipped_keys), skipped_keys


def test_checkpoint_overwrite_is_atomic(tmp_path):
    """Overwriting saves swap via a side directory: the new payload lands,
    no .saving/.old residue remains, and a stale .saving leftover from a
    killed save is cleaned up instead of breaking the next one."""
    from eop_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    def st(v):
        return {"step": np.asarray(v, np.int32)}

    save_checkpoint(st(1), True, str(tmp_path), "latest")
    # simulate a previous save killed mid-write
    (tmp_path / "latest_ckpt.saving").mkdir()
    (tmp_path / "latest_ckpt.saving" / "garbage").write_text("x")
    save_checkpoint(st(2), True, str(tmp_path), "latest")
    assert int(load_checkpoint(str(tmp_path / "latest_ckpt"))
               ["state"]["step"]) == 2
    assert int(load_checkpoint(str(tmp_path / "best_ckpt"))
               ["state"]["step"]) == 2
    residue = [p.name for p in tmp_path.iterdir()
               if p.name.endswith((".saving", ".old"))]
    assert not residue, residue
    # simulate a save killed inside the one-rename swap window: the live
    # dir was moved to .old but the replacement never renamed in
    (tmp_path / "latest_ckpt").rename(tmp_path / "latest_ckpt.old")
    assert int(load_checkpoint(str(tmp_path / "latest_ckpt"))
               ["state"]["step"]) == 2
    # the next save replaces the live dir and clears the stale .old
    save_checkpoint(st(3), False, str(tmp_path), "latest")
    assert int(load_checkpoint(str(tmp_path / "latest_ckpt"))
               ["state"]["step"]) == 3
    residue = [p.name for p in tmp_path.iterdir()
               if p.name.endswith((".saving", ".old"))]
    assert not residue, residue


def test_fuse_conv_bn_single_block_exact():
    from eop_tpu.ops.blocks import BaseConv
    from eop_tpu.utils.model_utils import fuse_conv_bn

    model = BaseConv(16, 3, 1)
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 16, 16, 8).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, False)
    variables = jax.tree.map(
        lambda v: v + 0.8 if v.ndim == 1 else v, variables
    )
    ref = model.apply(variables, x, False)
    fused_params, fused_stats = fuse_conv_bn(
        variables["params"], variables["batch_stats"]
    )
    out = model.apply(
        {"params": fused_params, "batch_stats": fused_stats}, x, False
    )
    # XLA-CPU convolutions in this image run at reduced precision
    # (~2e-3 relative, oneDNN path); the fold itself is exact (verified
    # against the closed-form kernel/bias values in debugging).
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=8e-3
    )


def test_fuse_conv_bn_deep_stack():
    """Through a deep CSP stack the fold reassociates f32 math; outputs
    stay equal to ~1e-2 absolute (XLA-CPU reduced-precision convs
    compound through ~15 layers)."""
    from eop_tpu.models.darknet import CSPDarknet
    from eop_tpu.utils.model_utils import fuse_conv_bn

    model = CSPDarknet(0.33, 0.25)
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, False)
    variables = jax.tree.map(
        lambda v: v + 0.8 if v.ndim == 1 else v, variables
    )
    ref = model.apply(variables, x, False)
    fused_params, fused_stats = fuse_conv_bn(
        variables["params"], variables["batch_stats"]
    )
    out = model.apply(
        {"params": fused_params, "batch_stats": fused_stats}, x, False
    )
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(out[k]), atol=3e-2,
            err_msg=k,
        )


def test_multiscale_preprocess():
    from eop_tpu.exp import Exp

    exp = Exp()
    exp.input_size = (64, 64)
    imgs = jnp.ones((2, 64, 64, 3))
    labels = jnp.zeros((2, 5, 5))
    labels = labels.at[:, 0].set(jnp.asarray([1.0, 32.0, 16.0, 10.0, 20.0]))
    out_imgs, out_labels = exp.preprocess(imgs, labels, (32, 32))
    assert out_imgs.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(
        np.asarray(out_labels[0, 0]), [1.0, 16.0, 8.0, 5.0, 10.0]
    )


def test_wd_mask_only_kernels():
    import optax

    params = {
        "conv": {"kernel": jnp.ones((3, 3, 4, 4)), "bias": jnp.ones((4,))},
        "bn": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
    }
    tx = build_sgd(1.0, momentum=0.0, weight_decay=0.1, nesterov=False)
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # only the kernel receives decay
    assert float(jnp.abs(updates["conv"]["kernel"]).sum()) > 0
    assert float(jnp.abs(updates["conv"]["bias"]).sum()) == 0
    assert float(jnp.abs(updates["bn"]["scale"]).sum()) == 0


def test_remat_gradients_match_baseline():
    """remat=True (gradient checkpointing of the trunk) must change memory,
    not math: loss and grads equal the non-remat model."""
    import jax
    import jax.numpy as jnp

    from eop_tpu.models import YOLOX, init_model, training_outputs

    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    )

    def loss_of(model, variables):
        def f(p):
            (head_outs, _), _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            decoded, _, _, _ = training_outputs(head_outs, reg_dim=4)
            return jnp.sum(decoded.astype(jnp.float32) ** 2) * 1e-6

        return jax.value_and_grad(f)(variables["params"])

    base = YOLOX(depth=0.33, width=0.25, num_classes=4, remat=False)
    rem = YOLOX(depth=0.33, width=0.25, num_classes=4, remat=True)
    variables = init_model(base, jax.random.PRNGKey(0), x[:1])
    # identical param trees: remat wraps the module, params unchanged
    v2 = init_model(rem, jax.random.PRNGKey(0), x[:1])
    chex_eq = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=0),
        variables["params"], v2["params"],
    )
    del chex_eq

    l0, g0 = loss_of(base, variables)
    l1, g1 = loss_of(rem, variables)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7),
        g0, g1,
    )


def test_trainstate_checkpoint_roundtrip_restores_weights(tmp_path):
    """REGRESSION: a TrainState flattens with GetAttrKey while the orbax
    payload is a plain dict; the keystr mismatch used to make resume
    silently restore ZERO leaves (post-resume eval AP dropped to 0)."""
    import jax
    import jax.numpy as jnp

    from eop_tpu.models import YOLOX
    from eop_tpu.train import build_sgd, create_train_state
    from eop_tpu.train.checkpoint import (
        load_checkpoint,
        load_ckpt_partial,
        save_checkpoint,
    )

    model = YOLOX(depth=0.33, width=0.125, num_classes=3, reg_dim=26)
    tx = build_sgd(0.01, momentum=0.9, weight_decay=5e-4, nesterov=True)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), sample,
        use_ema=True, with_dwa=True,
    )
    # make the saved weights distinguishable from a fresh init
    state = state.replace(
        params=jax.tree.map(lambda x: x + 1.5, state.params)
    )
    save_checkpoint(state, False, str(tmp_path), "latest",
                    metadata={"start_epoch": 7})

    fresh = create_train_state(
        model, tx, jax.random.PRNGKey(1), sample,
        use_ema=True, with_dwa=True,
    )
    payload = load_checkpoint(str(tmp_path / "latest_ckpt"))
    assert payload["metadata"]["start_epoch"] == 7
    merged, report = load_ckpt_partial(
        jax.tree.map(np.asarray, fresh), payload["state"]
    )
    n_leaves = len(jax.tree.leaves(fresh))
    assert len(report["loaded"]) == n_leaves, (
        f"only {len(report['loaded'])}/{n_leaves} leaves restored; "
        f"skipped: {report['skipped'][:5]}"
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(merged.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
        rtol=1e-6,
    )


def test_prewarm_buckets_compile_and_run():
    """Background AOT prewarm (train/prewarm.py): the lowered signature
    must match the trainer's dispatch path exactly, so a prewarmed bucket
    executes without a fresh trace when later called with real arrays."""
    import os
    import tempfile

    from eop_tpu.exp import Exp
    from eop_tpu.losses import YoloxLossConfig
    from eop_tpu.models import YOLOX
    from eop_tpu.parallel.mesh import make_mesh, shard_train_step
    from eop_tpu.train.prewarm import (
        multiscale_buckets,
        prewarm_step_buckets,
        start_prewarm_thread,
    )
    from eop_tpu.train.steps import create_train_state, make_train_step_bbox

    exp = Exp()
    exp.input_size = (64, 64)
    exp.multiscale_range = 1
    assert multiscale_buckets(exp) == [(32, 32), (64, 64), (96, 96)]
    exp.random_size = (1, 2)
    assert multiscale_buckets(exp) == [(32, 32), (64, 64)]

    model = YOLOX(depth=0.33, width=0.125, num_classes=2)
    tx = build_sgd(0.01, momentum=0.9, weight_decay=5e-4)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        use_ema=True,
    )
    step = shard_train_step(
        make_train_step_bbox(model, tx, YoloxLossConfig(num_classes=2),
                             ema_decay=0.9998),
        make_mesh(n_devices=2),
    )
    n = prewarm_step_buckets(
        step, state, [(32, 32), (64, 64)], batch_size=2,
        label_shape=(2, 5, 5), skip=[(64, 64)],
    )
    assert n == 1  # the base bucket was skipped

    # thread variant with abstract state (what the trainer passes: the
    # real state's buffers get donated away by the running step)
    state_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), state
    )
    # route the persistent cache to a fresh dir so we can PROVE the AOT
    # compile lands there (the whole mechanism prewarm relies on)
    import jax as _jax

    from jax._src import compilation_cache as _cc

    cache_dir = tempfile.mkdtemp(prefix="eop_prewarm_cache_")
    _jax.config.update("jax_compilation_cache_dir", cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _cc.reset_cache()  # dir changes are ignored once the cache is live
    try:
        t = start_prewarm_thread(step, state_abs, [(96, 96)], 2, (2, 5, 5))
        t.join(timeout=300)
        assert not t.is_alive()
        assert t.done_sizes == {(96, 96)}
        assert os.listdir(cache_dir), (
            "prewarm compiled nothing into the persistent cache -- "
            "later dispatch would cold-compile despite the prewarm"
        )
    finally:
        _jax.config.update("jax_compilation_cache_dir",
                           "/tmp/eop_tpu_jax_cache")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
        _cc.reset_cache()

    # a prewarmed bucket must now actually run with concrete arrays
    imgs = jnp.zeros((2, 96, 96, 3), jnp.float32)
    labels = jnp.zeros((2, 5, 5), jnp.float32)
    state, metrics = step(state, imgs, labels, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["total_loss"]))


def test_prewarm_bucket_claims():
    """BucketClaims: whoever claims a size first compiles it; the loser
    skips (prewarm side) or waits on the completion event (train side) —
    no duplicate concurrent compile of the same bucket."""
    import threading
    import time as _time

    from eop_tpu.train.prewarm import BucketClaims, prewarm_step_buckets

    sizes = [(32, 32), (64, 64)]
    claims = BucketClaims(sizes)

    # main thread claims 32 first -> prewarm must skip it
    assert claims.claim((32, 32)) is True
    claims.release((32, 32))

    compiled = []

    class FakeLowered:
        def __init__(self, size):
            self.size = size

        def compile(self):
            _time.sleep(0.05)
            compiled.append(self.size)

    class FakeStep:
        def lower(self, state, img, lbl, rng):
            return FakeLowered(img.shape[1:3])

    n = prewarm_step_buckets(
        FakeStep(), {"p": jnp.zeros((1,))}, sizes, batch_size=2,
        label_shape=(2, 5, 5), claims=claims,
    )
    assert n == 1 and compiled == [(64, 64)]
    # both events set -> any waiter proceeds immediately
    t0 = _time.time()
    claims.wait((32, 32))
    claims.wait((64, 64))
    assert _time.time() - t0 < 0.5

    # reverse direction: prewarm claims first, main waits for the event
    claims2 = BucketClaims(sizes)
    order = []

    def slow_prewarm():
        assert claims2.claim((32, 32))
        _time.sleep(0.2)
        order.append("prewarm-done")
        claims2.release((32, 32))

    th = threading.Thread(target=slow_prewarm)
    th.start()
    _time.sleep(0.05)
    assert claims2.claim((32, 32)) is False  # main loses the race
    claims2.wait((32, 32))
    order.append("main-proceeds")
    th.join()
    assert order == ["prewarm-done", "main-proceeds"]


def test_l1_switch_restarts_bucket_prewarm():
    """Flipping use_l1 builds a brand-new jitted step whose multiscale
    buckets are uncompiled; before_epoch must re-arm the prewarm (and stop
    the old thread) or every bucket stalls the no-aug epochs on a
    synchronous XLA compile."""
    import threading
    from types import SimpleNamespace

    from eop_tpu.train.trainer import Trainer

    class FakeLoader:
        def close_mosaic(self):
            pass

        def __iter__(self):
            return iter([])

    t = Trainer.__new__(Trainer)
    t.exp = SimpleNamespace(no_aug_epochs=5, eval_interval=10)
    t.epoch, t.max_epoch, t.no_aug = 94, 100, False  # epoch+1 == switch
    t.use_l1 = False
    t.input_size = (640, 640)
    t.train_loader = FakeLoader()
    t._mosaic_switched = False
    t._epoch_iter = None
    t._prewarm_started = True
    stop = threading.Event()
    t._prewarm_thread = SimpleNamespace(stop_event=stop)
    t._seen_buckets = {(640, 640), (608, 608), (672, 672)}
    t.save_ckpt = lambda *a, **k: None

    t.before_epoch()

    assert t.use_l1 is True
    assert t._prewarm_started is False, "prewarm must re-arm for the L1 step"
    assert t._seen_buckets == {(640, 640)}
    assert stop.is_set(), "the stale prewarm thread must be stopped"

    # idempotent: a later epoch must not redo the switch
    t._prewarm_started = True
    t.epoch = 96
    t.before_epoch()
    assert t._prewarm_started is True


def test_random_resize_preserves_aspect_and_prewarm_matches():
    """Non-square input_size: multiscale draws keep the exp's W/H ratio
    (the reference's size_factor, `yolox_base.py:169-177`) and the
    prewarm bucket list enumerates exactly the drawable shapes."""
    from eop_tpu.exp.yolox_base import Exp
    from eop_tpu.train.prewarm import multiscale_buckets

    exp = Exp()
    exp.input_size = (480, 640)
    exp.multiscale_range = 2
    exp.seed = 7
    drawn = {exp.random_resize(step=s) for s in range(200)}
    factor = 640 / 480
    for h, w in drawn:
        assert h % 32 == 0 and w == 32 * int((h // 32) * factor), (h, w)
    assert len({h for h, _ in drawn}) == 5  # all 5 buckets hit in 200 draws
    assert drawn <= set(multiscale_buckets(exp))
