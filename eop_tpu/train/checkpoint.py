"""Checkpoint save/load (orbax).

Parity target: `/root/reference/yolox/utils/checkpoint.py` —
``save_checkpoint`` writing ``<name>_ckpt`` plus a ``best_ckpt`` copy, and
``load_ckpt``'s shape-checked partial restore.  The stored payload mirrors
the reference's ``{start_epoch, model, optimizer}`` as a TrainState pytree
plus metadata; EMA weights travel inside the state like the reference's
EMA-is-what-gets-saved behavior (`yolox/core/trainer.py:315-329`).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _to_host(tree):
    # jax.device_get batches the transfers; mapping np.asarray per leaf
    # costs one tunnel round trip (~35 ms) per tensor — ~10 s for a full
    # train state.
    return jax.device_get(tree)


def state_to_host(tree):
    """Fetch a (possibly cross-host-sharded) state to host values.

    With FSDP under multi-host, params/opt/EMA leaves span processes and
    ``jax.device_get`` cannot fetch them — each leaf must be all-gathered
    first.  That makes this function a COLLECTIVE whenever any leaf is
    not fully addressable: every process must call it at the same point
    (the trainers call it *before* their rank-0-only write gate).  When
    everything is addressable (single host, or replicated multi-host
    state) it returns the tree untouched — zero cost, and the eventual
    ``_to_host`` inside ``save_checkpoint`` does one batched fetch.
    """
    needs_gather = any(
        isinstance(x, jax.Array) and not x.is_fully_addressable
        for x in jax.tree.leaves(tree)
    )
    if not needs_gather:
        return tree
    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return multihost_utils.process_allgather(x, tiled=True)
        return x

    return jax.device_get(jax.tree.map(fetch, tree))


def _single_process_checkpointer():
    """A checkpointer whose barriers span only THIS process.

    Orbax's default ``Checkpointer.save`` runs a global
    ``sync_global_processes`` that every jax process must join — but the
    trainers save rank-0-only (one writer per checkpoint dir, local
    filesystems).  With the default options a multi-host run deadlocks at
    the first save and dies on Gloo's 30 s rendezvous timeout (caught by
    `tests/test_multihost_cli.py`).  The payload is already host numpy
    (``_to_host``), so single-process semantics are correct.
    """
    import jax

    if jax.process_count() <= 1:
        return ocp.PyTreeCheckpointer()
    me = jax.process_index()
    return ocp.Checkpointer(
        ocp.PyTreeCheckpointHandler(),
        multiprocessing_options=ocp.options.MultiprocessingOptions(
            primary_host=me, active_processes={me},
            barrier_sync_key_prefix=f"proc{me}",
        ),
    )


def save_checkpoint(state: Any, is_best: bool, save_dir: str,
                    model_name: str, metadata: Optional[Dict] = None):
    """Save ``<save_dir>/<model_name>_ckpt`` (+ ``best_ckpt`` copy)
    (ref `save_checkpoint:36-43`)."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(save_dir, f"{model_name}_ckpt"))
    payload = {"state": _to_host(state)}
    if metadata:
        payload["metadata"] = dict(metadata)
    ckptr = _single_process_checkpointer()
    # crash-safe: write beside the live checkpoint, then swap — a kill
    # mid-save must never leave the run with NO restorable checkpoint
    # (the reference's torch.save has the same rm-then-write window,
    # `yolox/utils/checkpoint.py:36-43`; here resume is load-bearing for
    # long runs so the window is closed).  os.replace is atomic within a
    # filesystem; the brief old-gone/new-renaming gap of the non-best
    # swap is one rename syscall, not a multi-second serialize.
    tmp = path + ".saving"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ckptr.save(tmp, payload)
    old = path + ".old"
    if os.path.exists(path):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.replace(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old)
    else:
        os.replace(tmp, path)
        if os.path.exists(old):  # residue of a save killed mid-swap
            shutil.rmtree(old)
    if is_best:
        best = os.path.abspath(os.path.join(save_dir, "best_ckpt"))
        tmp_best = best + ".saving"
        if os.path.exists(tmp_best):
            shutil.rmtree(tmp_best)
        shutil.copytree(path, tmp_best)
        old_best = best + ".old"
        if os.path.exists(best):
            if os.path.exists(old_best):
                shutil.rmtree(old_best)
            os.replace(best, old_best)
            os.replace(tmp_best, best)
            shutil.rmtree(old_best)
        else:
            os.replace(tmp_best, best)
            if os.path.exists(old_best):
                shutil.rmtree(old_best)


def load_checkpoint(path: str):
    """Load a checkpoint directory -> payload dict.

    Local read, process-local barrier: every rank that has the file can
    restore independently (a rank without it must not block the others).

    If ``path`` is missing but ``path + ".old"`` exists, the previous save
    was killed inside its one-rename swap window (old moved aside, new not
    yet renamed in) — restore the ``.old`` copy rather than failing, so a
    crash at that instant still leaves a resumable run."""
    ckptr = _single_process_checkpointer()
    path = os.path.abspath(path)
    if not os.path.exists(path) and os.path.exists(path + ".old"):
        print(f"checkpoint {path} missing; restoring {path}.old "
              "(save was interrupted mid-swap)")
        path = path + ".old"
    return ckptr.restore(path)


def _norm_path(path) -> str:
    """Container-agnostic path key: a TrainState flattens with GetAttrKey
    (``.params['conv']``) while the orbax-restored checkpoint is a plain
    dict (``['params']['conv']``) — ``jax.tree_util.keystr`` would never
    match the two, silently restoring nothing.  Normalize every entry to
    its bare name."""
    parts = []
    for p in path:
        if hasattr(p, "name"):        # GetAttrKey (struct dataclasses)
            parts.append(str(p.name))
        elif hasattr(p, "key"):       # DictKey
            parts.append(str(p.key))
        elif hasattr(p, "idx"):       # SequenceKey
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def load_ckpt_partial(template: Any, ckpt_tree: Any):
    """Shape-checked partial overlay (ref `load_ckpt:11-33`): keys missing
    or shape-mismatched keep the template's value; returns (tree, report).
    """
    flat_c = {
        _norm_path(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(ckpt_tree)[0]
    }
    loaded, skipped = [], []

    def merge(path, leaf):
        key = _norm_path(path)
        if key in flat_c:
            cand = flat_c[key]
            if getattr(cand, "shape", None) == getattr(leaf, "shape", None):
                loaded.append(key)
                return cand
            skipped.append((key, getattr(cand, "shape", None),
                            getattr(leaf, "shape", None)))
        else:
            skipped.append((key, None, getattr(leaf, "shape", None)))
        return leaf

    merged = jax.tree_util.tree_map_with_path(merge, template)
    return merged, {"loaded": loaded, "skipped": skipped}


def load_eval_variables(path: str, variables: Any, verbose: bool = True):
    """Load inference weights from either a reference torch ``.pth`` or an
    orbax checkpoint directory into a flax ``variables`` template.

    Shared by the eval/show/demo CLIs (was triplicated there).  Orbax
    checkpoints prefer the EMA weights *paired with the EMA batch stats*
    (the reference's eval-with-EMA semantics, `yolox/utils/ema.py:42-53`);
    ``.pth`` files go through the torch importer.
    """
    import jax
    import numpy as np

    if path.endswith(".pth"):
        from ..utils.torch_import import (
            convert_state_dict,
            load_torch_checkpoint,
            merge_into_variables,
        )

        sd = load_torch_checkpoint(path)
        variables, report = merge_into_variables(
            variables, convert_state_dict(sd), strict_shapes=False
        )
        if verbose:
            print(f"loaded {len(report['loaded'])} tensors from {path}")
        return variables

    payload = load_checkpoint(path)
    state = payload["state"]
    use_ema = bool(state.get("ema_params"))
    params = state["ema_params"] if use_ema else state["params"]
    batch_stats = (
        state.get("ema_batch_stats")
        if use_ema and state.get("ema_batch_stats")
        else state.get("batch_stats", {})
    )
    merged, report = load_ckpt_partial(
        jax.tree.map(np.asarray, variables),
        {"params": params, "batch_stats": batch_stats},
    )
    if verbose:
        tag = "EMA" if use_ema else "raw"
        print(
            f"loaded {len(report['loaded'])} leaves ({tag}) from {path}"
            + (f"; skipped {len(report['skipped'])}"
               if report["skipped"] else "")
        )
    return jax.tree.map(np.asarray, merged)
