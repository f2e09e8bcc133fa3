"""Model zoo: flax ResNet backbones + both pose-estimator families.

Replaces the reference's torchvision-ResNet-50-based `argus/models.py`. Two
families share the ResNet backbone zoo:
  * `NCameraCNN` — direct se(3) regression (the reference's model),
  * `CubeKeypointNet` — corner heatmaps + differentiable triangulation/PnP.

`model_from_meta` reconstructs either family from the metadata a training
checkpoint carries (checkpoint.py format 2), so serve/validate/validate_real
never need out-of-band config knowledge.
"""

from argus_tpu.models.pose_cnn import NCameraCNN, NCameraCNNConfig
from argus_tpu.models.resnet import ResNet, resnet18, resnet34, resnet50, resnet101


def _coerce_config(cls, raw: dict):
    """Build a config dataclass from a msgpack-round-tripped dict (lists came
    back where tuples were stored; unknown keys — e.g. from a newer writer —
    are dropped rather than crashing the loader)."""
    import dataclasses

    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in raw:
            continue
        v = raw[f.name]
        if isinstance(v, bytes):
            v = v.decode("utf-8")
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def model_from_meta(meta: dict):
    """Reconstruct the trained model from checkpoint metadata.

    Returns (model, config, model_type). Defaults to the reference family
    (NCameraCNN with default config) when `meta` is empty (legacy checkpoints).
    """
    meta = meta or {}
    model_type = meta.get("model_type", "pose_cnn")
    raw_cfg = meta.get("model_config", {}) or {}
    if model_type == "keypoint":
        from argus_tpu.models.keypoint_net import CubeKeypointNet, CubeKeypointNetConfig

        cfg = _coerce_config(CubeKeypointNetConfig, raw_cfg)
        return CubeKeypointNet(cfg), cfg, "keypoint"
    cfg = _coerce_config(NCameraCNNConfig, raw_cfg)
    return NCameraCNN(cfg), cfg, "pose_cnn"


def resolve_model(meta: dict, model_config=None):
    """(model, config, model_type) from checkpoint metadata, with an explicit
    config override. The override's TYPE selects the family (a
    CubeKeypointNetConfig builds the keypoint model), so legacy checkpoints of
    either family remain loadable."""
    from argus_tpu.models.keypoint_net import CubeKeypointNet, CubeKeypointNetConfig

    if model_config is not None:
        if isinstance(model_config, CubeKeypointNetConfig):
            return CubeKeypointNet(model_config), model_config, "keypoint"
        return NCameraCNN(model_config), model_config, "pose_cnn"
    return model_from_meta(meta)


__all__ = [
    "NCameraCNN",
    "NCameraCNNConfig",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "model_from_meta",
    "resolve_model",
]
