"""Single-format checkpointing: one msgpack file for 1..N chips.

Fixes the reference's two checkpoint quirks (SURVEY.md §5):
  * DDP-saved state_dicts carry a `module.` prefix that the validators can't load
    (argus/train.py:199,358 vs argus/validate.py:100-101) — here the on-disk format
    is identical regardless of mesh shape (arrays are gathered before writing).
  * The reference saves model weights only; resume restores nothing. Here the full
    train state (params, batch_stats, opt state, step, epoch, lr) round-trips, so
    training is resumable (checkpoint/resume, SURVEY.md §5).

Format: flax msgpack (`flax.serialization`), written atomically (tmp + rename) by
process 0 only.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree: Any) -> Any:
    """Fully replicate/gather every array and pull it to host numpy."""

    def gather(x):
        if isinstance(x, jax.Array):
            return np.asarray(jax.device_get(x))
        return x

    return jax.tree_util.tree_map(gather, tree)


def save_checkpoint(path: str, tree: Any) -> str:
    """Serialize a pytree to `path` (atomic). Only process 0 writes; all processes
    return the path."""
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        # to_state_dict lowers flax PyTreeNodes/namedtuples to plain nested dicts so
        # the file is structure-agnostic (loadable with or without a target).
        data = serialization.msgpack_serialize(serialization.to_state_dict(_to_host(tree)))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    return path


def find_latest_checkpoint(save_dir: str) -> Optional[str]:
    """Most recently written .ckpt under `save_dir`, or None.

    Simple failure-recovery affordance the reference lacks (SURVEY.md §5 "Failure
    detection / elastic recovery: None"): on preemption/crash, point
    `TrainConfig.resume_from` here and training continues from the full saved state.
    """
    import glob

    candidates = glob.glob(os.path.join(save_dir, "*.ckpt"))
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load a checkpoint. With `target`, restores into its structure (validating
    shapes); without, returns the raw nested-dict pytree."""
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_state_dict(target, serialization.msgpack_restore(data))
    return serialization.msgpack_restore(data)
