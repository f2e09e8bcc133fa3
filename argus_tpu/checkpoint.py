"""Single-format checkpointing: one msgpack file for 1..N chips.

Fixes the reference's two checkpoint quirks (SURVEY.md §5):
  * DDP-saved state_dicts carry a `module.` prefix that the validators can't load
    (argus/train.py:199,358 vs argus/validate.py:100-101) — here the on-disk format
    is identical regardless of mesh shape (arrays are gathered before writing).
  * The reference saves model weights only; resume restores nothing. Here the full
    train state (params, batch_stats, opt state, step, epoch, lr) round-trips, so
    training is resumable (checkpoint/resume, SURVEY.md §5).

Format: flax msgpack (`flax.serialization`), written atomically (tmp + rename) by
process 0 only. Since round 3 the file carries MODEL METADATA next to the state
(format 2: `{"format": 2, "meta": {...}, "state": {...}}`): the model family and
its config ride inside the checkpoint, so serve/validate/validate_real can
reconstruct the exact trained model without out-of-band knowledge (the reference
stores a bare state_dict and every consumer must guess the config,
argus/validate.py:100-103 — a flaw VERDICT r2 asked to fix, not replicate).
Legacy bare-state files still load.
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


def _plain(obj: Any) -> Any:
    """Lower meta values to msgpack-serializable types (flax packs with
    strict_types, which rejects tuples — config dataclasses carry them)."""
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    return obj


def save_checkpoint(path: str, tree: Any, meta: Optional[dict] = None) -> str:
    """Serialize a pytree to `path` (atomic). Only process 0 writes; all processes
    return the path.

    `meta` is an optional plain dict (strings/numbers/lists) stored alongside the
    state — training stores the model family + config here so consumers can
    reconstruct the model (`load_checkpoint_with_meta`)."""
    if jax.process_index() == 0:
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        # to_state_dict lowers flax PyTreeNodes/namedtuples to plain nested dicts so
        # the file is structure-agnostic (loadable with or without a target).
        payload = {
            "format": 2,
            "meta": _plain(meta or {}),
            "state": serialization.to_state_dict(_to_host(tree)),
        }
        data = serialization.msgpack_serialize(payload)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    return path


class AsyncCheckpointer:
    """Overlap checkpoint I/O with training.

    `save_checkpoint` is synchronous: it device_gets the whole train state
    (~11 s for 200 MB through a remote-TPU tunnel; still milliseconds-to-
    seconds on a co-located host), serializes, and writes — all while the
    train loop stalls. This class moves the fetch+serialize+write into a
    worker thread so the loop keeps dispatching steps.

    Donation safety: the train step donates its input state buffers
    (train.py `donate_argnums=(0,)`), so a background fetch of the LIVE state
    would race buffer invalidation. `save` first snapshots every device array
    with an on-device copy (cheap — on-chip HBM copy, no host round-trip) and
    the worker fetches the snapshot. One save in flight at a time: a new
    `save` waits for the previous one (never reorders or drops checkpoints).
    Worker exceptions re-raise on the next `save`/`wait`. Call `wait()` after
    the final save (and before exiting on preemption) to guarantee the file
    is on disk."""

    def __init__(self) -> None:
        self._thread: Optional["threading.Thread"] = None
        self._err: Optional[BaseException] = None

    def save(self, path: str, tree: Any, meta: Optional[dict] = None) -> str:
        import threading

        self.wait()
        import jax.numpy as jnp

        snap = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, tree
        )

        def work():
            try:
                save_checkpoint(path, snap, meta=meta)
            except BaseException as e:  # surfaced on the next save()/wait()
                self._err = e

        self._thread = threading.Thread(target=work, name="argus-ckpt", daemon=True)
        self._thread.start()
        return path

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


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
    """Load a checkpoint's STATE. With `target`, restores into its structure
    (validating shapes); without, returns the raw nested-dict pytree. Reads both
    format-2 (meta + state) and legacy bare-state files; use
    `load_checkpoint_with_meta` to also get the stored metadata."""
    state, _ = load_checkpoint_with_meta(path, target=target)
    return state


def load_checkpoint_with_meta(path: str, target: Optional[Any] = None) -> tuple:
    """Load (state, meta) from a checkpoint. `meta` is the dict stored at save
    time ({} for legacy bare-state files)."""
    with open(path, "rb") as f:
        data = f.read()
    raw = serialization.msgpack_restore(data)
    if isinstance(raw, dict) and raw.get("format") == 2:
        state, meta = raw["state"], raw.get("meta") or {}
    else:  # legacy bare state dict
        state, meta = raw, {}
    if target is not None:
        state = serialization.from_state_dict(target, state)
    return state, meta
