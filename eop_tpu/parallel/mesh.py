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

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_name: str = DATA_AXIS,
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place host arrays onto the mesh, sharded along their leading axis.

    Single process: a plain sharded ``device_put``.  Multi-host: each
    process holds only its *local* batch (the per-rank loader split, ref
    `yolox/exp/yolox_base.py:143-144`), so the local arrays are stitched
    into one global array along the data axis — ``device_put`` with a
    global sharding would instead misread each local batch as the full
    global array.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        spec = P(axis_name)
        return jax.tree.map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec
            ),
            batch,
        )
    sharding = batch_sharded(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_inference(infer_fn, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Jit a batched inference fn over the mesh: batch sharded in, every
    output leaf batch-sharded out (params are closed over and replicated
    by GSPMD).  This is the multi-chip serving path — the reference has
    no inference parallelism at all (its demo/eval loops are single-GPU,
    `yolox/core/launch.py` only covers training); on TPU the same jitted
    program scales across the mesh with zero code changes to the model.
    """
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(infer_fn, in_shardings=(data,), out_shardings=data)


def shard_train_step(step_fn, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Jit a (state, images, labels, rng) -> (state, metrics) step over the
    mesh: state replicated (+donated), batch sharded on the data axis.

    Gradients come out averaged across shards automatically (XLA lowers the
    replicated-output requirement to a psum over ICI).
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, data, repl),
        out_shardings=(repl, repl),
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
