"""Device-mesh data parallelism — the TPU-native replacement for the
reference's process-per-GPU launcher + DDP stack.

What this replaces (SURVEY.md §2.6):
* `launch()` / `_distributed_worker` (`yolox/core/launch.py:39-147`) —
  gone: one process per host, `jax.distributed.initialize()` for
  multi-host, XLA owns the devices;
* DDP gradient all-reduce (`yolox/core/trainer.py:162-163`) — subsumed by
  jit over a batch-sharded mesh: XLA inserts the gradient psum on ICI;
* per-rank batch split (`yolox/exp/yolox_base.py:143-144`) — a
  ``NamedSharding(P("data"))`` on the batch;
* `all_reduce_norm` BN sync (`yolox/utils/allreduce_norm.py:97-103`) —
  either pass ``bn_axis_name="data"`` to the model (true sync-BN via
  pmean, stronger than the reference) or call ``sync_batch_stats``
  periodically like the reference does before eval.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"
MODEL_AXIS = "model"

# Mesh visible to model code while a shard_* wrapper is being traced.
# Intentionally our own contextvar rather than jax's legacy `with mesh:`
# resource env (private thread_resources) or `jax.sharding.get_mesh()`
# (does not see the legacy context in jax 0.9).
_TRACE_MESH: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "eop_tpu_trace_mesh", default=None
)


@contextlib.contextmanager
def trace_mesh(mesh: Optional[Mesh]):
    """Make ``mesh`` visible to ``unshard_space`` during tracing."""
    tok = _TRACE_MESH.set(mesh)
    try:
        yield
    finally:
        _TRACE_MESH.reset(tok)


def _traced_under(fn, mesh: Mesh):
    @functools.wraps(fn)
    def inner(*args, **kwargs):
        with trace_mesh(mesh):
            return fn(*args, **kwargs)

    return inner


def _pin_both_ways(x, sharding: NamedSharding):
    """with_sharding_constraint on the primal AND its cotangent.

    A bare ``with_sharding_constraint`` constrains the forward tensor and
    (via its transpose) the backward reshard's *output*; the cotangent
    arriving at the cut is still free for GSPMD to propagate into from
    downstream.  For a sharding *fence* — "everything past this point is
    batch-only, in both passes" — the cotangent must be pinned at the
    same cut, so the fenced region has no space-sharded sources in either
    direction.
    """

    @jax.custom_vjp
    def pin(v):
        return jax.lax.with_sharding_constraint(v, sharding)

    def pin_fwd(v):
        return pin(v), None

    def pin_bwd(_, g):
        return (jax.lax.with_sharding_constraint(g, sharding),)

    pin.defvjp(pin_fwd, pin_bwd)
    return pin(x)


def unshard_space(x, axis_name: str = DATA_AXIS):
    """Gather the space axis off an NHWC activation (no-op unless traced
    under a mesh with a space axis — see ``trace_mesh``), pinning both the
    value and its cotangent to batch-only sharding.

    Model code calls this where spatial partitioning stops paying
    (CSPDarknet before dark5, SPPBottleneck before its pools):

    * Performance: dark5 runs at 1/32 of the input resolution (20x20 at
      640 px) — a few percent of the FLOPs on the grid where halo
      overhead is proportionally largest (the SPP k=13 pools need 6-row
      halos, comparable to the shard extent itself).  Spatial sharding
      earns its keep on the stem..dark4 grids; gathering the tail costs
      one tiny all-gather.
    * Gradient reproducibility: sharded-vs-single grads are verified
      exact in float64 at every size tried (tests/test_spatial.py) — no
      partitioner bug — but in float32 the SPP pools sit on heavily
      padded windows full of near-ties, where reduction-order noise from
      sharded BN flips pool argmaxes and reroutes O(1) gradient per
      flipped window.  Keeping the tie-rich tail batch-only removes the
      dominant source of run-to-run grad divergence for free.
    """
    mesh = _TRACE_MESH.get()
    if mesh is None or SPACE_AXIS not in mesh.axis_names:
        return x
    spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
    return _pin_both_ways(x, NamedSharding(mesh, spec))


def constrain_accum(x, axis_name: str = DATA_AXIS):
    """Pin a ``[accum, micro, ...]`` micro-batch stack to per-micro batch
    sharding (no-op unless traced under a mesh — see ``trace_mesh``).

    Gradient accumulation reshapes the sharded global batch ``[B, ...] ->
    [accum, B/accum, ...]``; without a constraint GSPMD is free to leave
    the split dim half-sharded and materialize gathers inside the scan.
    Images (5-D after the split) keep their height sharding on a space
    mesh."""
    mesh = _TRACE_MESH.get()
    if mesh is None:
        return x
    dims = [None, axis_name]
    if SPACE_AXIS in mesh.axis_names and np.ndim(x) == 5:
        dims.append(SPACE_AXIS)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*dims))
    )


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = DATA_AXIS,
    spatial: int = 1,
    tensor: int = 1,
) -> Mesh:
    """Device mesh over the first ``n_devices`` devices.

    ``spatial=1`` (default): 1-D data-parallel mesh.  ``spatial>1``: a 2-D
    ``(data, space)`` mesh — image activations are additionally sharded
    along their height dim over the ``space`` axis and GSPMD inserts the
    conv halo exchanges, so one image's FLOPs and activation memory spread
    over ``spatial`` chips.  This is the scaling axis the reference cannot
    express at all (its DDP replicates the model and needs batch >= world
    size, `yolox/core/launch.py:39-147`); here it serves high-resolution
    or small-batch regimes where pure DP runs out of batch.  Halo traffic
    is O(W·C) per boundary vs O(H·W·C²/spatial) conv FLOPs per chip, so it
    rides ICI essentially free at real image sizes.

    ``tensor>1`` adds a trailing ``model`` axis: parameter channel dims
    (conv C_out, the matching BN/bias channel) shard over it (see
    ``param_specs``), i.e. Megatron-style tensor parallelism with GSPMD
    inserting the channel all-gathers/reduces.  For dense convnets the
    space axis is usually the better model-parallel dim (activations
    dominate); the model axis exists for weight-heavy regimes and as a
    memory lever composable with ``fsdp`` sharding (``param_specs``).

    Axes of size 1 are dropped, so downstream name checks
    (``SPACE_AXIS in mesh.axis_names``) stay meaningful.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    inner = spatial * tensor
    if inner > 1:
        if devices.size % inner:
            raise ValueError(
                f"{devices.size} devices do not split into "
                f"spatial={spatial} x tensor={tensor}"
            )
        grid = devices.reshape(-1, spatial, tensor)
        # shard_batch stitches each process's local batch as the
        # host-local portion of the global array, which is only the truth
        # if every (data-row × space × model) group lives on ONE process —
        # i.e. the inner axes never cross a host.  Check the actual rows
        # (not a local-count divisibility proxy) so explicit ``devices=``
        # orderings are caught too; trivially true single-process.
        for row in grid.reshape(-1, inner):
            procs = {d.process_index for d in row}
            if len(procs) > 1:
                raise ValueError(
                    f"spatial={spatial} x tensor={tensor}: inner group "
                    f"{list(row)} spans processes {sorted(procs)}; the "
                    "space/model axes must not cross hosts "
                    "(shard_batch contract)"
                )
        names = (axis_name, SPACE_AXIS, MODEL_AXIS)
        keep = [i for i, n in enumerate(grid.shape) if n > 1 or i == 0]
        return Mesh(
            grid.reshape([grid.shape[i] for i in keep]),
            tuple(names[i] for i in keep),
        )
    return Mesh(devices, (axis_name,))


def image_spec(mesh: Mesh, axis_name: str = DATA_AXIS) -> P:
    """PartitionSpec for NHWC image batches on this mesh: batch over the
    data axis, plus height over the space axis when the mesh has one."""
    if SPACE_AXIS in mesh.axis_names:
        return P(axis_name, SPACE_AXIS)
    return P(axis_name)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def _leaf_spec(shape, mesh: Mesh, fsdp: bool, min_size: int = 256) -> P:
    """Sharding spec for one parameter/optimizer leaf.

    * model axis (tensor parallelism): the trailing dim — conv kernels are
      HWIO so that's C_out; BN scale/bias/running stats and conv biases are
      [C] so they follow their conv's channel sharding automatically.
    * data axis (``fsdp=True``, ZeRO-style): the largest remaining dim that
      divides — XLA all-gathers the shard for use and reduce-scatters the
      gradient into the sharded optimizer update.

    Leaves smaller than ``min_size`` elements stay replicated: sharding
    scalars/tiny vectors (DWA state, schedule counters) buys nothing and
    costs a collective each.
    """
    ndim = len(shape)
    if ndim == 0 or int(np.prod(shape)) < min_size:
        return P()
    spec = [None] * ndim
    if MODEL_AXIS in mesh.axis_names:
        tp = mesh.shape[MODEL_AXIS]
        if shape[-1] % tp == 0:
            spec[-1] = MODEL_AXIS
    if fsdp and DATA_AXIS in mesh.axis_names:
        dp = mesh.shape[DATA_AXIS]
        if dp > 1:
            cands = [
                i for i in range(ndim)
                if spec[i] is None and shape[i] % dp == 0
            ]
            if cands:
                spec[max(cands, key=lambda i: shape[i])] = DATA_AXIS
    while spec and spec[-1] is None:
        spec.pop()
    return P(*spec)


def param_specs(tree, mesh: Mesh, fsdp: bool = False, min_size: int = 256):
    """NamedSharding pytree for params / optimizer / EMA / full TrainState.

    With a ``model`` axis in the mesh, channel dims shard over it (tensor
    parallelism); with ``fsdp=True``, remaining dims shard over ``data``
    (ZeRO-style parameter+optimizer partitioning — the reference keeps a
    full replica per GPU, `yolox/core/trainer.py:162-163`; here per-chip
    state memory drops by ~the data-axis size and XLA turns the gradient
    all-reduce into reduce-scatter + sharded update + all-gather-on-use).

    Works on concrete arrays and ``ShapeDtypeStruct``s alike.
    """
    return jax.tree.map(
        lambda x: NamedSharding(
            mesh, _leaf_spec(tuple(getattr(x, "shape", ())), mesh,
                             fsdp, min_size)
        ),
        tree,
    )


def place_state(state, mesh: Mesh, fsdp: bool = False):
    """Device-put a TrainState onto its ``param_specs`` shardings (one-time,
    before the first sharded step — keeps donation clean and avoids a
    reshard on step 1).

    Logs the sharded byte fraction, and warns when sharding was requested
    but no leaf actually partitioned (e.g. ``fsdp`` on a data-axis size
    that divides no channel dim, like dp=6 against 64/128/256-channel
    kernels) — otherwise a user counting on the memory drop silently gets
    full replication."""
    specs = param_specs(state, mesh, fsdp=fsdp)
    total = sharded = 0
    for leaf, sh in zip(jax.tree.leaves(state), jax.tree.leaves(specs)):
        nbytes = int(np.prod(getattr(leaf, "shape", ()) or (1,))) * (
            np.dtype(getattr(leaf, "dtype", np.float32)).itemsize
        )
        total += nbytes
        if any(ax is not None for ax in sh.spec):
            nshards = int(np.prod([
                mesh.shape[ax] for ax in jax.tree.leaves(tuple(sh.spec))
            ]))
            sharded += nbytes * (1 - 1 / nshards)
    from ..utils.logger import logger

    if total and sharded == 0 and (fsdp or MODEL_AXIS in mesh.axis_names):
        logger.warning(
            "place_state: fsdp/tensor sharding requested but NO leaf "
            "partitioned — no axis size divides any parameter dim "
            f"(mesh {dict(mesh.shape)}); state stays fully replicated"
        )
    elif total:
        logger.info(
            f"place_state: {sharded / total:.1%} of state bytes sharded "
            f"off-chip (mesh {dict(mesh.shape)}, fsdp={fsdp})"
        )
    return jax.device_put(state, specs)


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place host arrays onto the mesh, sharded along their leading axis.

    Single process: a plain sharded ``device_put``.  Multi-host: each
    process holds only its *local* batch (the per-rank loader split, ref
    `yolox/exp/yolox_base.py:143-144`), so the local arrays are stitched
    into one global array along the data axis — ``device_put`` with a
    global sharding would instead misread each local batch as the full
    global array.

    On a 2-D ``(data, space)`` mesh, 4-D (NHWC image) leaves are placed
    with their height dim sharded over the space axis as well; lower-rank
    leaves (labels etc.) shard only on the batch dim.
    """
    img = image_spec(mesh, axis_name)

    def spec_for(x):
        return img if np.ndim(x) == 4 else P(axis_name)

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        # each process holds its local batch at FULL spatial extent, which
        # is exactly the host-local portion as long as the space axis (if
        # any) spans devices within one process — true for meshes built by
        # make_mesh over jax.devices() (process-major order).
        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec_for(x)
            ),
            batch,
        )
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec_for(x))),
        batch,
    )


def shard_inference(infer_fn, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Jit a batched inference fn over the mesh: batch sharded in, every
    output leaf batch-sharded out (params are closed over and replicated
    by GSPMD).  This is the multi-chip serving path — the reference has
    no inference parallelism at all (its demo/eval loops are single-GPU,
    `yolox/core/launch.py` only covers training); on TPU the same jitted
    program scales across the mesh with zero code changes to the model.

    On a ``(data, space)`` mesh the input batch arrives height-sharded as
    well (see ``make_mesh(spatial=...)``): the backbone/FPN convs run
    spatially partitioned (GSPMD halo exchange), and the per-image outputs
    (rows/valid — no spatial dims) leave batch-sharded.
    """
    data = NamedSharding(mesh, P(axis_name))
    imgs = NamedSharding(mesh, image_spec(mesh, axis_name))
    return jax.jit(
        _traced_under(infer_fn, mesh), in_shardings=(imgs,), out_shardings=data
    )


def shard_inference_tp(infer_body, variables, mesh: Mesh,
                       axis_name: str = DATA_AXIS):
    """Tensor-parallel inference: ``infer_body(variables, imgs)`` jitted
    with the model's channel dims sharded over the mesh's ``model`` axis
    (``param_specs``) — per-chip weight memory drops by the tensor-axis
    size and GSPMD inserts the channel collectives.  Unlike
    ``shard_inference`` (which closes over replicated variables), the
    variables are an explicit argument here so their shardings are part of
    the program signature; the returned callable has them pre-placed and
    bound.
    """
    var_sh = param_specs(variables, mesh)
    placed = jax.device_put(variables, var_sh)
    data = NamedSharding(mesh, P(axis_name))
    imgs = NamedSharding(mesh, image_spec(mesh, axis_name))
    fn = jax.jit(
        _traced_under(infer_body, mesh),
        in_shardings=(var_sh, imgs),
        out_shardings=data,
    )
    return functools.partial(fn, placed)


def shard_train_step(step_fn, mesh: Mesh, axis_name: str = DATA_AXIS,
                     state=None, fsdp: bool = False):
    """Jit a (state, images, labels, rng) -> (state, metrics) step over the
    mesh: state replicated (+donated), batch sharded on the data axis.

    Gradients come out averaged across shards automatically (XLA lowers the
    replicated-output requirement to a psum over ICI).

    On a ``(data, space)`` mesh the image batch is additionally
    height-sharded: the conv-dominated forward/backward (where ~all the
    FLOPs and activation memory live) runs spatially partitioned, while
    labels and the per-anchor loss stay batch-sharded — GSPMD gathers the
    (small) head outputs across the space axis at the loss boundary.

    With ``fsdp=True`` and/or a ``model`` axis in the mesh, pass the
    concrete (or ``jax.eval_shape``-d) TrainState as ``state``: its leaves
    are sharded per ``param_specs`` instead of replicated — parameters,
    optimizer and EMA state partition across chips, and the same shardings
    come back out so the step stays donation-stable.  Place the initial
    state once with ``place_state``.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    imgs = NamedSharding(mesh, image_spec(mesh, axis_name))
    st = repl
    if fsdp or MODEL_AXIS in mesh.axis_names:
        if state is None:
            # silently replicating here would drop exactly what the
            # caller asked for (ZeRO/TP memory partitioning)
            raise ValueError(
                "shard_train_step: fsdp/tensor sharding requested but no "
                "`state` template was passed — param_specs needs the leaf "
                "shapes (pass the TrainState or its jax.eval_shape)"
            )
        st = param_specs(state, mesh, fsdp=fsdp)
    return jax.jit(
        _traced_under(step_fn, mesh),
        in_shardings=(st, imgs, data, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,),
    )


# Note on BN sync: under jit + GSPMD sharding, the batch-norm mean/var
# reduce over the *global* (sharded) batch axis — XLA inserts the
# all-reduce — so BN statistics are always cross-replica synced, strictly
# stronger than the reference's periodic pre-eval `all_reduce_norm`
# (`yolox/utils/allreduce_norm.py:97-103`).  ``bn_axis_name`` on the models
# exists for shard_map/pmap flows, where per-device batches are local;
# there, call ``sync_batch_stats`` periodically like the reference does.


def sync_batch_stats(batch_stats: Any, axis_name: str = DATA_AXIS):
    """Cross-replica mean of a batch-stats pytree — the reference's
    `all_reduce_norm` (`yolox/utils/allreduce_norm.py:32-103`: flatten all
    BN/IN running stats, all_reduce-average, reload) as one tree transform.

    Must be called *inside* a pmap/shard_map over ``axis_name`` — the
    flows where per-device batches are local and running stats drift
    apart.  Like the reference, running variances are arithmetic-averaged
    across replicas (not pooled), which is exact for means and the
    standard approximation for variances.
    """
    return jax.lax.pmean(batch_stats, axis_name)
