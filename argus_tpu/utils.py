"""Host-side utilities: timing, inference helper, directory-tree printer, spaghetti.

Capability parity with the non-geometry parts of the reference's `argus/utils.py`:
  * `time_jax_fn`     <- `time_torch_fn` (argus/utils.py:153-171), CUDA events become
                         `block_until_ready` wall-clock timing (the XLA equivalent).
  * `get_pose`        <- argus/utils.py:179-189: one compiled images->SE(3) program.
  * `get_tree_string` <- argus/utils.py:197-249 (error-message directory trees).
  * `draw_spaghetti`  <- argus/utils.py:252-275. The HOST PIL version is kept for
                         datagen-side parity/debugging; the hot path uses the
                         on-device batched version in `argus_tpu.ops.augment`.
"""

from __future__ import annotations

import fnmatch
import os
import time
from typing import Callable, Tuple

import jax
import numpy as np


def time_jax_fn(fn: Callable[[], jax.Array], warmup: int = 0) -> Tuple[jax.Array, float]:
    """Wall-clock a JAX thunk, synchronizing on the result.

    Returns (result, seconds). XLA is async: `block_until_ready` is the moral
    equivalent of the reference's CUDA-event + synchronize timing.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn())
    start = time.perf_counter()
    result = jax.block_until_ready(fn())
    return result, time.perf_counter() - start


def get_pose(images: jax.Array, apply_fn: Callable[[jax.Array], jax.Array]) -> jax.Array:
    """Images -> SE(3) poses (xyzw quats): `se3_exp(model(images))`.

    `apply_fn` maps (B, H, W, 3*n_cams) images to (B, 6) se(3) vectors; wrap it in
    jax.jit (with bound params) for the single-program real-time inference path.
    """
    from argus_tpu.geom import se3_exp

    return se3_exp(apply_fn(images))


# ───────────────────────────── directory tree printing ─────────────────────────────


def _tree_lines(path: str, extension: str, indent: str = "") -> list[str]:
    lines: list[str] = []
    try:
        items = sorted(os.listdir(path))
    except OSError:
        return lines
    items = [
        it
        for it in items
        if os.path.isdir(os.path.join(path, it)) or fnmatch.fnmatch(it, f"*.{extension}")
    ]
    for i, item in enumerate(items):
        last = i == len(items) - 1
        lines.append(indent + ("└── " if last else "├── ") + item)
        full = os.path.join(path, item)
        if os.path.isdir(full):
            lines.extend(_tree_lines(full, extension, indent + ("    " if last else "│   ")))
    return lines


def get_tree_string(path: str, extension: str) -> str:
    """ANSI-blue directory tree of files matching `*.extension` under `path`.

    Used in config-validation error messages (reference: argus/utils.py:237-249).
    """
    BLUE, RESET = "\033[94m", "\033[0m"
    return BLUE + path + "\n" + "\n".join(_tree_lines(path, extension)) + "\n" + RESET


# ───────────────────────────── host-side spaghetti (PIL) ─────────────────────────────


def draw_spaghetti(img, n_arcs: int = 10, width_range=(1.0, 5.0), rng: np.random.Generator | None = None):
    """Draw random black arcs on a PIL image (occlusion augmentation mimicking wires).

    Host-side reference behavior (argus/utils.py:252-275); the training input
    pipeline uses the batched on-device variant in `argus_tpu.ops.augment` instead.
    Takes an optional numpy Generator for explicit determinism.
    """
    from PIL import ImageDraw

    rng = rng or np.random.default_rng()
    d = ImageDraw.Draw(img)
    for _ in range(n_arcs):
        x0, y0 = int(rng.integers(0, img.width)), int(rng.integers(0, img.height))
        x1, y1 = int(rng.integers(x0, img.width)), int(rng.integers(y0, img.height))
        start_angle, end_angle = int(rng.integers(0, 360)), int(rng.integers(0, 360))
        width = float(rng.uniform(*width_range))
        d.arc((x0, y0, x1, y1), start_angle, end_angle, fill=(0, 0, 0), width=int(width))
    return img
