"""Multiprocess data loader + host->device prefetcher (torch-free).

Parity targets:
* the lightnet-style `DataLoader` with the injected `YoloBatchSampler` and
  `close_mosaic()` (`/root/reference/yolox/data/dataloading.py:32-89`);
* `worker_init_reset_seed` (`dataloading.py:109-113`);
* `list_collate` (`dataloading.py:92-106`);
* the CUDA-stream `DataPrefetcher` (`yolox/data/data_prefetcher.py:8-51`) —
  here a double-buffered ``jax.device_put`` pipeline (TPU transfers are
  async; keeping one batch in flight overlaps H2D with the device step).

The reference rides torch's C++ DataLoader; this implementation is a
self-contained fork-based worker pool with an in-order reorder buffer,
exception propagation, and per-worker reseeding.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import random
import threading
import traceback
import uuid
from typing import Callable, Optional

import numpy as np

from .samplers import RandomSampler, SequentialSampler, YoloBatchSampler


def default_collate(items):
    """Stack numpy-able leaves; keep lists for ragged entries."""
    elem = items[0]
    if isinstance(elem, np.ndarray):
        return np.stack(items, axis=0)
    if isinstance(elem, (int, float, np.integer, np.floating)):
        return np.asarray(items)
    if isinstance(elem, (tuple, list)):
        transposed = list(zip(*items))
        return [default_collate(list(t)) for t in transposed]
    return list(items)


def list_collate(batch):
    """Collate keeping list/tuple items as lists (ref `list_collate:92`)."""
    items = list(zip(*batch))
    out = []
    for it in items:
        if isinstance(it[0], (list, tuple)):
            out.append(list(it))
        else:
            out.append(default_collate(list(it)))
    return out


def worker_init_reset_seed(worker_id: int):
    """Fresh random seed per worker (ref `worker_init_reset_seed:109-113`)."""
    seed = uuid.uuid4().int % 2**32
    random.seed(seed)
    np.random.seed(seed)


def _worker_loop(dataset, task_q, result_q, collate_fn, worker_init_fn,
                 worker_id):
    if worker_init_fn is not None:
        worker_init_fn(worker_id)
    if hasattr(dataset, "reseed"):
        dataset.reseed(uuid.uuid4().int % 2**32)
    while True:
        task = task_q.get()
        if task is None:
            break
        batch_id, indices = task
        try:
            items = [dataset[i] for i in indices]
            result_q.put((batch_id, collate_fn(items), None))
        except Exception:  # propagate to the main process
            result_q.put((batch_id, None, traceback.format_exc()))


class DataLoader:
    """Fork-based multiprocess loader yielding collated numpy batches."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        sampler=None,
        batch_sampler=None,
        num_workers: int = 0,
        collate_fn: Optional[Callable] = None,
        drop_last: bool = False,
        worker_init_fn: Optional[Callable] = None,
        prefetch_batches: int = 2,
        pin_memory: bool = False,  # accepted for API parity; no-op
        seed: Optional[int] = None,
        mp_context: str = "spawn",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.collate_fn = collate_fn or default_collate
        self.worker_init_fn = worker_init_fn
        self.prefetch_batches = max(prefetch_batches, 1)

        if batch_sampler is None:
            if sampler is None:
                sampler = (
                    RandomSampler(len(dataset), seed)
                    if shuffle
                    else SequentialSampler(len(dataset))
                )
            batch_sampler = YoloBatchSampler(
                sampler, batch_size, drop_last,
                input_dimension=getattr(dataset, "input_dim", None),
            )
        self.batch_sampler = batch_sampler
        # "spawn" by default: forking a process that already initialized
        # the TPU/XLA client deadlocks; spawned workers import only the
        # (jax-free) data modules.
        self.mp_context = mp_context
        self._workers = []
        self._task_q = None
        self._result_q = None

    def close_mosaic(self):
        """Turn mosaic off for all subsequent batches (ref `:88`)."""
        self.batch_sampler.mosaic = False

    def __len__(self):
        return len(self.batch_sampler)

    # ------------------------------------------------------------------

    def _start_workers(self):
        ctx = mp.get_context(self.mp_context)
        self._task_q = ctx.Queue()
        self._result_q = ctx.Queue()
        self._workers = []
        for wid in range(self.num_workers):
            p = ctx.Process(
                target=_worker_loop,
                args=(self.dataset, self._task_q, self._result_q,
                      self.collate_fn, self.worker_init_fn, wid),
                daemon=True,
            )
            p.start()
            self._workers.append(p)

    def shutdown(self):
        for _ in self._workers:
            try:
                self._task_q.put_nowait(None)
            except Exception:
                pass
        for p in self._workers:
            p.join(timeout=1.0)
            if p.is_alive():
                p.terminate()
        self._workers = []

    def __iter__(self):
        if self.num_workers == 0:
            for indices in self.batch_sampler:
                yield self.collate_fn([self.dataset[i] for i in indices])
            return

        self._start_workers()
        # Results are drained from the mp.Queue by a sacrificial daemon
        # thread into an in-process queue, and the consumer loop polls
        # ONLY the in-process queue.  Reason (found live by the round-5
        # chaos drive): mp.Queue.get(timeout) honors its timeout only up
        # to poll(); a worker SIGKILLed midway through writing a multi-MB
        # batch leaves a PARTIAL message in the pipe, poll() reports
        # readable, and the subsequent recv_bytes() blocks forever (the
        # parent's own write end keeps the pipe from EOF).  A blocked
        # drainer thread is abandoned (daemon); the liveness check below
        # still fires and the trainer gets its clean worker-death error
        # instead of a hang.
        local_q: "queue.Queue" = queue.Queue()
        drain_stop = threading.Event()

        def _drain():
            while not drain_stop.is_set():
                try:
                    item = self._result_q.get(timeout=0.5)
                except queue.Empty:
                    continue
                except (EOFError, OSError):
                    return
                local_q.put(item)

        drainer = threading.Thread(target=_drain, daemon=True,
                                   name="eop-loader-drain")
        drainer.start()
        try:
            batch_iter = iter(self.batch_sampler)
            in_flight = {}
            reorder = {}
            next_submit = 0
            next_yield = 0
            max_in_flight = self.num_workers * self.prefetch_batches

            def submit_one():
                nonlocal next_submit
                try:
                    indices = next(batch_iter)
                except StopIteration:
                    return False
                self._task_q.put((next_submit, indices))
                in_flight[next_submit] = True
                next_submit += 1
                return True

            while len(in_flight) < max_in_flight:
                if not submit_one():
                    break

            while in_flight or reorder:
                while next_yield in reorder:
                    batch = reorder.pop(next_yield)
                    next_yield += 1
                    submit_one()
                    yield batch
                if not in_flight:
                    break
                # poll with a timeout so a worker dying mid-batch (OOM
                # kill, cv2 segfault) raises instead of blocking forever
                # on a result that will never come (torch's DataLoader
                # does the same liveness check).  A dead worker alone is
                # not proof the pending batch is lost — another live
                # worker may own it — so only raise once results also
                # stop flowing (grace window), or when no worker is left.
                empty_polls = 0
                while True:
                    try:
                        batch_id, batch, err = local_q.get(timeout=5.0)
                        break
                    except queue.Empty:
                        empty_polls += 1
                        dead = [
                            p.pid for p in self._workers
                            if not p.is_alive()
                        ]
                        if dead and (
                            len(dead) == len(self._workers)
                            or empty_polls >= 3
                        ):
                            raise RuntimeError(
                                f"DataLoader worker(s) {dead} died "
                                "unexpectedly (killed / crashed) with "
                                f"{len(in_flight)} batch(es) in flight "
                                "and no results arriving"
                            ) from None
                if err is not None:
                    raise RuntimeError(f"DataLoader worker failed:\n{err}")
                del in_flight[batch_id]
                reorder[batch_id] = batch
        finally:
            drain_stop.set()
            self.shutdown()


class DevicePrefetcher:
    """Double-buffered host->device prefetch (ref `DataPrefetcher`).

    Wraps a loader iterator; each ``next()`` returns device arrays for the
    current batch while the following batch's transfer is already in
    flight (jax transfers are asynchronous).
    """

    def __init__(self, loader, sharding=None, to_device=None):
        import jax

        self._jax = jax
        self.loader = iter(loader)
        self.sharding = sharding
        self._to_device = to_device or self._default_to_device
        self._next = None
        self._preload()

    def _default_to_device(self, batch):
        put = (
            (lambda x: self._jax.device_put(x, self.sharding))
            if self.sharding is not None
            else self._jax.device_put
        )
        return self._jax.tree.map(
            lambda x: put(np.ascontiguousarray(x))
            if isinstance(x, np.ndarray) else x,
            batch,
        )

    def _preload(self):
        try:
            host_batch = next(self.loader)
        except StopIteration:
            self._next = None
            return
        self._next = self._to_device(host_batch)

    def next(self):
        batch = self._next
        if batch is None:
            return None
        self._preload()
        return batch

    def __iter__(self):
        while True:
            batch = self.next()
            if batch is None:
                return
            yield batch
