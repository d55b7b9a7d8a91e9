"""Step-locked training-TRAJECTORY parity: the reference's actual 24p
training algorithm vs our jitted train step, same init, same data.

Per-step loss parity (`test_loss_parity_24p.py`) and trained-weight
goldens (`test_trained_parity_24p.py`) leave one hiding place for a
divergence: the *dynamics* — the interaction of the stateful DWA weights
(`/root/reference/yolox_24p/models/losses.py:311-345`), SGD-nesterov
momentum (`yolox_24p/exp/yolox_base.py:120-124`), and BN batch/running
statistics across optimizer steps.  This file runs the reference's
per-step algorithm (`yolox_24p/train_24p.py:73-113`: zero_grad ->
model(images, train=True) -> Loss_Function.forward -> backward ->
SGD.step; no LR schedule, no EMA, and no use_l1 toggle — the trainer
never flips it despite parsing L1_epoch) with the reference's OWN torch
modules, side-by-side with our `make_train_step_24p` on identical
exported weights and an identical deterministic batch stream.

What is assertable is set by the measured physics of the problem (full
table in BASELINE.md "Trajectory parity"): the dynamics are CHAOTIC —
SimOTA's dynamic-k assignments flip discretely under fp32 noise, so a
1e-7 relative perturbation of our own initial weights drives our own
trainer to the same O(10%) per-step loss deviations by step ~40 that the
cross-pipeline comparison shows.  Lockstep over hundreds of steps is
therefore not a property either implementation has even against itself.
The evidence is split accordingly:

1. gradient parity at init — exact (non-chaotic, per-leaf);
2. 3-step full lockstep — losses, DWA weights, BN running stats, and
   every parameter leaf tight (catches any wiring/momentum/LR bug);
3. long-horizon statistical equivalence — the cross-pipeline deviation
   must stay inside the self-perturbation chaos envelope (computed by a
   control run of OUR trainer from 1e-7-perturbed init), and both loss
   trajectories must descend to the same level.

Run as a script for the BASELINE.md deviation table:
    python tests/test_trajectory_parity_24p.py [N_STEPS]
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ref_loader
from eop_tpu.data.coco24p import COCO24PDataset, TrainTransform24P
from eop_tpu.utils.torch_export import variables_to_state_dict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEPTH, WIDTH, NUM_CLASSES, IMG = 0.33, 0.25, 3, 96
BATCH, LR, MOMENTUM = 2, 0.01, 0.9
N_STEPS = int(os.environ.get("EOP_TRAJ_STEPS", "120"))


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("traj24p")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synth_datasets.py"),
         "24p", "--out", str(root), "--size", str(IMG), "--n", "8"],
        check=True, cwd=REPO,
    )
    return root


def _batch_stream(root, n_steps):
    """Deterministic step-locked stream: the 8 synthetic images cycled in
    fixed pairs (no shuffling/augment randomness — the comparison needs
    byte-identical inputs on both sides)."""
    ds = COCO24PDataset(
        data_dir=str(root / "imgs"), label_dir=str(root / "labels"),
        img_size=(IMG, IMG), preproc=TrainTransform24P(max_labels=50),
    )
    items = [ds[i] for i in range(len(ds))]
    images = np.stack([it[0] for it in items]).astype(np.float32)
    labels = np.stack([it[1] for it in items]).astype(np.float32)
    n = len(items)
    batches = []
    for s in range(n_steps):
        idx = [(s * BATCH + j) % n for j in range(BATCH)]
        batches.append((images[idx], labels[idx]))
    return ds, batches


def _make_models():
    """Our model + the reference's torch model on identical weights."""
    from eop_tpu.models import YOLOX, init_model

    model = YOLOX(depth=DEPTH, width=WIDTH, num_classes=NUM_CLASSES,
                  reg_dim=26)
    variables = jax.tree.map(
        np.asarray,
        init_model(model, jax.random.PRNGKey(7),
                   jnp.zeros((1, IMG, IMG, 3), jnp.float32), on_host=True),
    )
    sd = variables_to_state_dict(variables)
    torch_model = ref_loader.ref_24p_model(DEPTH, WIDTH, NUM_CLASSES)
    # the reference trainer's get_model applies init_yolo (BN eps 1e-3,
    # momentum 0.03, `yolox_24p/exp/yolox_base.py:56-68`) — required for
    # matching BN forward AND running-stat dynamics
    ref_loader.apply_init_yolo(torch_model)
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    return model, variables, torch_model


def _run_ours(model, variables, batches):
    from eop_tpu.losses import DWAState
    from eop_tpu.losses.loss_24p import Loss24PConfig
    from eop_tpu.train.optimizer import build_sgd
    from eop_tpu.train.steps import TrainState, make_train_step_24p

    tx = build_sgd(LR, momentum=MOMENTUM, weight_decay=0.0, nesterov=True)
    params = jax.tree.map(jnp.asarray, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
        opt_state=tx.init(params),
        dwa=DWAState.init(),
    )
    step = jax.jit(make_train_step_24p(
        model, tx,
        Loss24PConfig(num_classes=NUM_CLASSES, reference_parity=True),
        ema_decay=None,
    ))
    rec = []
    for i, (imgs, labels) in enumerate(batches):
        state, metrics = step(
            state, jnp.asarray(imgs), jnp.asarray(labels),
            jax.random.PRNGKey(i),
        )
        m = jax.device_get(metrics)
        rec.append({
            "total": float(m["total_loss"]),
            "obj": float(m["conf_loss"]),
            "cls": float(m["cls_loss"]),
            "iou24": np.asarray(m["iou_losses_24"], np.float64),
            "reg_w": np.asarray(m["dwa_reg_w"], np.float64),
            "obj_w": float(m["dwa_obj_w"]),
            "cls_w": float(m["dwa_cls_w"]),
        })
    final = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    return rec, final


def _run_reference(torch_model, batches):
    losses_mod = ref_loader.ref_24p_losses()
    torch_model.train()
    opt = torch.optim.SGD(
        torch_model.parameters(), lr=LR, momentum=MOMENTUM, nesterov=True
    )
    lf = losses_mod.Loss_Function(NUM_CLASSES)
    rec = []
    for imgs, labels in batches:
        x = torch.from_numpy(np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)))
        y = torch.from_numpy(labels.copy())
        opt.zero_grad()
        with ref_loader.cpu_torch_factories():
            outputs = torch_model(x, train=True)
            loss_all = lf.forward(outputs, y)
        loss_all[0].backward()
        opt.step()
        draw = loss_all[6]
        rec.append({
            "total": float(loss_all[0].detach()),
            "obj": float(loss_all[2].detach()),
            "cls": float(loss_all[3].detach()),
            "iou24": loss_all[1].detach().numpy().astype(np.float64),
            "reg_w": draw[3].detach().numpy().astype(np.float64),
            "obj_w": float(draw[4].detach()),
            "cls_w": float(draw[5].detach()),
        })
    return rec


def _rel(a, b):
    return abs(a - b) / max(abs(b), 1e-6)


def _step_devs(ours, refs):
    """Per-step relative total-loss deviation between two runs."""
    return np.array([_rel(o["total"], r["total"])
                     for o, r in zip(ours, refs)])


# ---------------------------------------------------------------------------
# 1. gradient parity at init (exact, non-chaotic)
# ---------------------------------------------------------------------------

def test_gradient_parity_at_init(synth):
    """Per-leaf gradient agreement of d(total_loss)/d(params) between the
    reference's backward and ours, at identical weights — the strongest
    non-chaotic statement that the two training computations are the same
    function."""
    from eop_tpu.losses import DWAState
    from eop_tpu.losses.loss_24p import Loss24PConfig, loss_24p
    from eop_tpu.models.yolox import training_outputs

    model, variables, torch_model = _make_models()
    _, batches = _batch_stream(synth, 1)
    imgs, labels = batches[0]

    # ours
    cfg = Loss24PConfig(num_classes=NUM_CLASSES, reference_parity=True)
    bs = jax.tree.map(jnp.asarray, variables["batch_stats"])

    def loss_fn(p):
        (head_outs, _), _ = model.apply(
            {"params": p, "batch_stats": bs},
            jnp.asarray(imgs), True, mutable=["batch_stats"],
        )
        decoded, origin_reg, grids, strides = training_outputs(
            head_outs, reg_dim=26
        )
        total, _, _ = loss_24p(
            decoded, origin_reg, jnp.asarray(labels), grids, strides,
            DWAState.init(), cfg,
        )
        return total

    grads = jax.device_get(jax.grad(loss_fn)(
        jax.tree.map(jnp.asarray, variables["params"])
    ))

    # reference
    torch_model.train()
    losses_mod = ref_loader.ref_24p_losses()
    lf = losses_mod.Loss_Function(NUM_CLASSES)
    x = torch.from_numpy(np.ascontiguousarray(imgs.transpose(0, 3, 1, 2)))
    with ref_loader.cpu_torch_factories():
        outputs = torch_model(x, train=True)
        loss_all = lf.forward(outputs, torch.from_numpy(labels.copy()))
    loss_all[0].backward()
    ref_grads = {k: p.grad.detach().numpy()
                 for k, p in torch_model.named_parameters()}

    # map our grad tree through the state_dict exporter (same transposes
    # as the weights themselves) and compare every parameter leaf
    sd_grads = variables_to_state_dict(
        {"params": grads, "batch_stats": variables["batch_stats"]}
    )
    compared = 0
    for k, ref_g in ref_grads.items():
        ours_g = np.asarray(sd_grads[k])
        scale = max(np.abs(ref_g).max(), 1e-8)
        dev = np.abs(ours_g - ref_g).max() / scale
        assert dev < 1e-3, f"{k}: grad deviation {dev:.2e}"
        compared += 1
    assert compared > 100, compared
    # non-vacuous: gradients actually flow to the deep backbone
    stem_g = [v for k, v in ref_grads.items() if "backbone" in k]
    assert max(np.abs(g).max() for g in stem_g) > 0


# ---------------------------------------------------------------------------
# 2. short-horizon full lockstep (3 steps, everything tight)
# ---------------------------------------------------------------------------

def _perturbed(variables, eps=1e-7):
    return jax.tree.map(
        lambda a: (a * (1 + eps)).astype(a.dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        variables,
    )


@pytest.fixture(scope="module")
def lockstep(synth):
    model, variables, torch_model = _make_models()
    _, batches = _batch_stream(synth, 3)
    ours, final_ours = _run_ours(model, variables, batches)
    refs = _run_reference(torch_model, batches)
    ctrl, final_ctrl = _run_ours(model, _perturbed(variables), batches)
    return torch_model, ours, refs, ctrl, final_ours, final_ctrl


def test_lockstep_losses_and_dwa(lockstep):
    """3 optimizer steps in lockstep: total/obj/cls losses, the weighted
    per-radius IoU 24-vector, and the DWA weight trajectories.  Any error
    in optimizer semantics (nesterov/momentum/LR), DWA state carry, or BN
    train-mode behavior shows up at steps 0-1 at near-fp32 precision —
    e.g. nesterov-vs-vanilla momentum changes the first update by ~1.9x,
    orders of magnitude above these bars.  By step 2 SimOTA near-tie
    flips already dominate (measured: cross 1.9e-3 vs self-perturbation
    control 5.2e-3 — table in BASELINE.md), so step 2 gets the chaos bar.
    Measured cross deviations: step 0 3.2e-7, step 1 1.8e-5 (tolerances
    ~30x above)."""
    _, ours, refs, _, _, _ = lockstep
    loss_tol = {0: 1e-5, 1: 1e-3, 2: 5e-2}
    dwa_tol = {0: 1e-6, 1: 1e-4, 2: 1e-2}
    for s, (o, r) in enumerate(zip(ours, refs)):
        t = loss_tol[s]
        assert _rel(o["total"], r["total"]) < t, (s, o["total"], r["total"])
        assert _rel(o["obj"], r["obj"]) < t, (s, o["obj"], r["obj"])
        assert _rel(o["cls"], r["cls"]) < max(t, 1e-4), (s, o["cls"], r["cls"])
        np.testing.assert_allclose(o["iou24"], r["iou24"], atol=max(t, 1e-4),
                                   err_msg=f"step {s} weighted iou24")
        np.testing.assert_allclose(o["reg_w"], r["reg_w"], atol=dwa_tol[s],
                                   err_msg=f"step {s} DWA reg_w")
        assert abs(o["obj_w"] - r["obj_w"]) < dwa_tol[s], s
        assert abs(o["cls_w"] - r["cls_w"]) < dwa_tol[s], s
    # the DWA weights must have moved off their t=0 uniform value — the
    # state carry is what this test exists to check
    assert abs(ours[2]["obj_w"] - ours[0]["obj_w"]) > 1e-5


def _leaf_devs(sd_a, sd_b):
    """Per-leaf normalized max deviations, split params / BN stats.
    ``num_batches_tracked`` is excluded: torch counts batches, we count
    optimizer steps in ``TrainState.step`` (documented exporter gap)."""
    params, bn = [], []
    for k in sd_a:
        if k not in sd_b or "num_batches_tracked" in k:
            continue
        a = np.asarray(sd_a[k])
        b = sd_b[k]
        b = b.detach().numpy() if hasattr(b, "detach") else np.asarray(b)
        d = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        (bn if "running_" in k else params).append(d)
    return np.array(params), np.array(bn)


def test_lockstep_params_and_bn_stats(lockstep):
    """After 3 locked steps, compare every parameter and BN running-stat
    leaf — against the CHAOS ENVELOPE, not a fixed tolerance: SimOTA
    near-tie flips put O(10%) deviations into individual dark5 kernels by
    step 3 even between two runs of OUR OWN trainer from 1e-7-perturbed
    init (measured control max 2.6e-1 vs cross 1.4e-1; medians 6.7e-3 vs
    4.9e-3 — cross sits BELOW the self-noise).  A systematic
    optimizer/BN-momentum bug would lift the cross median far above the
    control's.  BN running stats are compared too: a momentum-convention
    bug (torch 0.03 vs flax 0.97) never shows in train-mode losses."""
    _, _, _, _, final_ours, final_ctrl = lockstep
    torch_model = lockstep[0]
    sd_ours = variables_to_state_dict(final_ours)
    cross_p, cross_bn = _leaf_devs(sd_ours, torch_model.state_dict())
    env_p, env_bn = _leaf_devs(
        sd_ours, variables_to_state_dict(final_ctrl)
    )
    assert len(cross_p) > 100 and len(cross_bn) > 50
    for cross, env, what in ((cross_p, env_p, "params"),
                             (cross_bn, env_bn, "bn stats")):
        assert cross.max() < 10 * max(env.max(), 1e-4), (
            what, cross.max(), env.max())
        assert np.median(cross) < 10 * max(np.median(env), 1e-5), (
            what, np.median(cross), np.median(env))
        # absolute backstop: chaos medians are ~5e-3 here; a wrong-LR /
        # wrong-momentum run is O(1)
        assert np.median(cross) < 0.1, (what, np.median(cross))


# ---------------------------------------------------------------------------
# 3. long horizon: chaos-envelope + trend equivalence
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def long_runs(synth):
    model, variables, torch_model = _make_models()
    _, batches = _batch_stream(synth, N_STEPS)
    ours, final_ours = _run_ours(model, variables, batches)
    refs = _run_reference(torch_model, batches)
    # chaos control: OUR trainer again from (1 + 1e-7)-scaled init — the
    # self-divergence of one implementation under fp32-level perturbation
    pert = jax.tree.map(
        lambda a: (a * (1 + 1e-7)).astype(a.dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        variables,
    )
    ctrl, _ = _run_ours(model, pert, batches)
    return ours, refs, ctrl, final_ours


def test_long_trajectory_within_chaos_envelope(long_runs):
    """The cross-pipeline per-step loss deviation must be statistically
    indistinguishable from the self-perturbation control: same order of
    magnitude in aggregate, no systematic excess.  (Measured @120 steps:
    cross median 2.8e-2 vs control median 3.1e-2 — see BASELINE.md.)"""
    ours, refs, ctrl, _ = long_runs
    cross = _step_devs(ours, refs)
    env = _step_devs(ctrl, ours)
    # skip the first steps where both are still near fp32-exact
    c, e = cross[5:], np.maximum(env[5:], 1e-5)
    assert np.median(c) < 10 * np.median(e), (np.median(c), np.median(e))
    assert c.max() < 50 * max(e.max(), 1e-3), (c.max(), e.max())
    # DWA weights live in the same chaos: compare envelopes, not values
    dwa_cross = max(abs(o["obj_w"] - r["obj_w"])
                    for o, r in zip(ours, refs))
    dwa_env = max(abs(o["obj_w"] - r["obj_w"])
                  for o, r in zip(ctrl, ours))
    assert dwa_cross < 10 * max(dwa_env, 1e-3), (dwa_cross, dwa_env)


def test_long_trajectory_trend_equivalence(long_runs):
    """Both trainers must descend to the same loss level.  Mid-run the
    loss drops fast, so a chaos-induced time shift of a few steps between
    the two trajectories inflates pointwise relative gaps (measured peak
    27% around the cliff); the robust statements are the endpoint levels
    and a generous mid-run bound."""
    ours, refs, _, _ = long_runs
    to = np.array([o["total"] for o in ours])
    tr = np.array([r["total"] for r in refs])
    w = 10
    mo = np.convolve(to, np.ones(w) / w, "valid")
    mr = np.convolve(tr, np.ones(w) / w, "valid")
    # identical start (pre-chaos), same final level, no gross mid-run split
    assert abs(mo[0] - mr[0]) / mr[0] < 0.1, (mo[0], mr[0])
    assert abs(mo[-1] - mr[-1]) / mr[-1] < 0.15, (mo[-1], mr[-1])
    dev = np.abs(mo - mr) / mr
    assert dev.max() < 0.5, f"windowed-mean divergence {dev.max():.3f}"
    # and both actually trained
    assert mr[-1] < 0.7 * mr[0], (mr[0], mr[-1])
    assert mo[-1] < 0.7 * mo[0], (mo[0], mo[-1])


if __name__ == "__main__":
    # deviation-table mode for BASELINE.md: python tests/<file> [N_STEPS]
    if len(sys.argv) > 1:
        N_STEPS = int(sys.argv[1])
    # fp32-exact comparison needs CPU XLA (TPU fp32 convs round through
    # bf16 MXU passes); jax is already imported, so go through config
    jax.config.update("jax_platforms", "cpu")
    import tempfile
    from pathlib import Path

    root = Path(tempfile.mkdtemp(prefix="traj24p"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_synth_datasets.py"),
         "24p", "--out", str(root), "--size", str(IMG), "--n", "8"],
        check=True, cwd=REPO,
    )
    model, variables, tm = _make_models()
    _, batches = _batch_stream(root, N_STEPS)
    import time

    t0 = time.time()
    ours, final_ours = _run_ours(model, variables, batches)
    t1 = time.time()
    refs = _run_reference(tm, batches)
    t2 = time.time()
    pert = jax.tree.map(
        lambda a: (a * (1 + 1e-7)).astype(a.dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        variables,
    )
    ctrl, _ = _run_ours(model, pert, batches)
    print(f"ours {t1 - t0:.1f}s, reference {t2 - t1:.1f}s")
    cross, env = _step_devs(ours, refs), _step_devs(ctrl, ours)
    print("step  cross_rel   ctrl_rel    dwa_obj_cross  dwa_obj_ctrl")
    for s in sorted(set(
        [0, 1, 2, 5, 10, 20, 40, 60, 80, 100, N_STEPS - 1]
    )):
        if s >= N_STEPS:
            continue
        print(f"{s:4d}  {cross[s]:.3e}  {env[s]:.3e}"
              f"   {abs(ours[s]['obj_w'] - refs[s]['obj_w']):.3e}"
              f"      {abs(ctrl[s]['obj_w'] - ours[s]['obj_w']):.3e}")
    print(f"median cross {np.median(cross[5:]):.3e} "
          f"ctrl {np.median(env[5:]):.3e}")
    print("ref total:", refs[0]["total"], "->", refs[-1]["total"])
    print("our total:", ours[0]["total"], "->", ours[-1]["total"])
