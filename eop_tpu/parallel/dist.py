"""Distributed/runtime helpers.

Parity target: `/root/reference/yolox/utils/dist.py` (287 lines of
torch.distributed plumbing: rank/world accessors, barrier, pickled-object
gather over a cached gloo side-group, synchronized timers).  On TPU the
process model is one process per *host* and XLA owns the collectives, so
this module is thin:

* rank/world accessors map to ``jax.process_index()`` / counts;
* ``synchronize`` is a cross-host barrier via ``multihost_utils``;
* object gather/all_gather keep the reference's *semantics* (arbitrary
  picklable payloads) by pickling into padded uint8 arrays and
  all-gathering those — the TPU-native version of the gloo side-channel;
* ``shared_random_seed`` draws one seed and broadcasts it;
* ``time_synchronized`` flushes device work before reading the clock
  (the CUDA-synchronize equivalent; under the axon tunnel only a host
  fetch truly syncs, handled in `wait_device`).
"""

from __future__ import annotations

import pickle
import time
from typing import Any, List

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "get_num_devices",
    "get_world_size",
    "get_rank",
    "get_local_rank",
    "get_local_size",
    "is_main_process",
    "synchronize",
    "all_gather",
    "gather",
    "shared_random_seed",
    "time_synchronized",
    "wait_device",
]


def get_num_devices() -> int:
    """Accelerators visible to this process (ref `get_num_devices:41-48`)."""
    return jax.local_device_count()


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def get_local_rank() -> int:
    # one process per host: the host-local "rank" is always 0
    return 0


def get_local_size() -> int:
    return jax.local_device_count()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize():
    """Cross-host barrier (ref `synchronize:68-79`)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("eop_tpu_synchronize")


def _pickle_to_padded(buf: bytes, pad_to: int) -> np.ndarray:
    arr = np.zeros(pad_to + 8, np.uint8)
    arr[:8] = np.frombuffer(
        np.int64(len(buf)).tobytes(), np.uint8
    )
    arr[8: 8 + len(buf)] = np.frombuffer(buf, np.uint8)
    return arr


def _unpickle_from_padded(arr: np.ndarray) -> Any:
    n = int(np.frombuffer(arr[:8].tobytes(), np.int64)[0])
    return pickle.loads(arr[8: 8 + n].tobytes())


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable data from every host
    (ref `all_gather:188-223`)."""
    world = get_world_size()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    buf = pickle.dumps(data)  # serialized once; reused for the payload
    sizes = multihost_utils.process_allgather(
        np.asarray([len(buf)], np.int64)
    ).reshape(-1)
    pad_to = int(sizes.max())
    stacked = multihost_utils.process_allgather(
        _pickle_to_padded(buf, pad_to)
    )
    return [_unpickle_from_padded(np.asarray(row)) for row in stacked]


def gather(data: Any, dst: int = 0) -> List[Any]:
    """Gather picklable data on one host (ref `gather:226-267`).  On TPU
    all_gather costs the same; non-dst hosts get an empty list like the
    reference."""
    results = all_gather(data)
    return results if get_rank() == dst else []


def shared_random_seed() -> int:
    """Same random seed on every host (ref `shared_random_seed:270-280`)."""
    seed = np.random.randint(2**31)
    return int(all_gather(seed)[0])


def wait_device(x=None):
    """Drain device work.  ``block_until_ready`` plus a scalar fetch — the
    only reliable sync under tunneled device transports."""
    if x is None:
        x = jnp.zeros(())
    jax.block_until_ready(x)
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.device_get(leaves[0]))


def time_synchronized() -> float:
    """Device-accurate wall clock (ref `time_synchronized:283-287`)."""
    wait_device()
    return time.time()
