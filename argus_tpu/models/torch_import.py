"""torchvision -> flax ResNet weight translation.

The reference initializes its backbone from torchvision's ImageNet-pretrained
ResNet-50 (`argus/models.py:43`). This environment has no network egress, so
pretrained weights cannot be downloaded here — but users with a torchvision
checkpoint (`resnet50-*.pth`, or any `state_dict` produced by
`torchvision.models.resnet*`) can translate it into `argus_tpu` flax params with
`load_torch_resnet`.

Key mapping (torchvision -> argus_tpu.models.resnet):
    conv1.weight                  -> params/conv_init/kernel        (OIHW -> HWIO)
    bn1.*                         -> params|batch_stats/norm_init/*
    layer{L}.{B}.conv{k}.weight   -> stage{L-1}_block{B}/Conv_{k-1}/kernel
    layer{L}.{B}.bn{k}.*          -> stage{L-1}_block{B}/BatchNorm_{k-1}/*
    layer{L}.{B}.downsample.0/1.* -> stage{L-1}_block{B}/{conv_proj,norm_proj}/*
    fc.*                          -> NOT imported (the reference also replaces the
                                     classifier with a fresh projection,
                                     argus/models.py:56)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW conv weight -> flax HWIO kernel."""
    return np.transpose(w, (2, 3, 1, 0))


def translate_torch_resnet_state_dict(
    state_dict: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Translate a torchvision ResNet `state_dict` into (params, batch_stats) nested
    dicts matching `argus_tpu.models.resnet.ResNet`'s variable tree (minus `fc`)."""

    def to_np(v) -> np.ndarray:
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v, np.float32)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, value in state_dict.items():
        v = to_np(value)
        parts = key.split(".")
        if key.startswith("fc."):
            continue  # classifier replaced downstream
        if parts[0] == "conv1":
            put(params, ("conv_init", "kernel"), _conv_kernel(v))
        elif parts[0] == "bn1":
            dest, name = {
                "weight": (params, "scale"),
                "bias": (params, "bias"),
                "running_mean": (stats, "mean"),
                "running_var": (stats, "var"),
            }.get(parts[1], (None, None))
            if dest is not None:
                put(dest, ("norm_init", name), v)
        elif parts[0].startswith("layer"):
            stage = int(parts[0][5:]) - 1
            block = int(parts[1])
            mod = parts[2]
            blk = f"stage{stage}_block{block}"
            if mod.startswith("conv"):
                put(params, (blk, f"Conv_{int(mod[4:]) - 1}", "kernel"), _conv_kernel(v))
            elif mod.startswith("bn"):
                idx = int(mod[2:]) - 1
                dest, name = {
                    "weight": (params, "scale"),
                    "bias": (params, "bias"),
                    "running_mean": (stats, "mean"),
                    "running_var": (stats, "var"),
                }.get(parts[3], (None, None))
                if dest is not None:
                    put(dest, (blk, f"BatchNorm_{idx}", name), v)
            elif mod == "downsample":
                if parts[3] == "0":  # conv
                    put(params, (blk, "conv_proj", "kernel"), _conv_kernel(v))
                else:  # bn
                    dest, name = {
                        "weight": (params, "scale"),
                        "bias": (params, "bias"),
                        "running_mean": (stats, "mean"),
                        "running_var": (stats, "var"),
                    }.get(parts[4], (None, None))
                    if dest is not None:
                        put(dest, (blk, "norm_proj", name), v)
    return params, stats


def _merge(dst: Dict[str, Any], src: Dict[str, Any], path: str = "") -> int:
    """Recursively copy matching leaves of src into dst; returns leaves copied.
    Raises on shape mismatches so silent architecture drift is impossible."""
    n = 0
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"imported weight {path}/{k} has no destination in the flax tree")
        if isinstance(v, dict):
            n += _merge(dst[k], v, f"{path}/{k}")
        else:
            if tuple(dst[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {path}/{k}: flax {tuple(dst[k].shape)} vs torch {tuple(v.shape)}"
                )
            dst[k] = v.astype(np.asarray(dst[k]).dtype)
            n += 1
    return n


def load_torch_resnet(
    path_or_state_dict,
    variables: Dict[str, Any],
    backbone_scope: str = "backbone",
) -> Dict[str, Any]:
    """Load torchvision ResNet weights into an `NCameraCNN` (or bare `ResNet`)
    variables dict. Returns a NEW variables dict with the backbone weights replaced.

    Args:
        path_or_state_dict: a `.pth` path or an already-loaded torch state_dict.
        variables: flax variables from `model.init` ({"params", "batch_stats"}).
        backbone_scope: submodule name of the backbone inside the model ("backbone"
            for NCameraCNN; pass None/"" for a bare ResNet).
    """
    import jax

    if isinstance(path_or_state_dict, (str, bytes)):
        import torch

        state_dict = torch.load(path_or_state_dict, map_location="cpu", weights_only=True)
    else:
        state_dict = path_or_state_dict

    t_params, t_stats = translate_torch_resnet_state_dict(state_dict)

    new_vars = jax.tree_util.tree_map(np.asarray, variables)
    params_root = new_vars["params"][backbone_scope] if backbone_scope else new_vars["params"]

    # space-to-depth stem: rewrite the 7x7 conv1 kernel losslessly (models/resnet.py)
    if "conv_init_s2d" in params_root and "conv_init" in t_params:
        from argus_tpu.models.resnet import conv1_kernel_to_s2d

        t_params["conv_init_s2d"] = {
            "kernel": conv1_kernel_to_s2d(t_params.pop("conv_init")["kernel"])
        }
    stats_root = (
        new_vars["batch_stats"][backbone_scope] if backbone_scope else new_vars["batch_stats"]
    )
    n_p = _merge(params_root, t_params)
    n_s = _merge(stats_root, t_stats)
    if n_p == 0:
        raise ValueError("no parameters were imported — wrong state_dict?")
    return new_vars
