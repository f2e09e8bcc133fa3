"""Torchvision-weight-fidelity verification CLI (SURVEY §7 risk #4; VERDICT r3 #8).

The reference initializes its backbone from torchvision's ImageNet-pretrained
ResNet-50 (`/root/reference/argus/models.py:43`); argus_tpu imports those
weights with `models.torch_import.load_torch_resnet`. This script PROVES the
import end-to-end for a user's actual `.pth`:

  1. A reference forward of torchvision's ResNet is reconstructed directly
     from the state_dict with `torch.nn.functional` ops — the exact eval-mode
     semantics of `torchvision.models.resnet` (stem conv7x7/s2/p3 -> bn ->
     relu -> maxpool3/s2/p1 -> layers with v1.5 stride placement -> global
     average pool). No torchvision install needed: the state_dict IS the model.
  2. The same input runs through argus_tpu's flax ResNet carrying the
     translated weights.
  3. Pooled features must agree to `--tol` (fp32; defaults to 2e-4).

Golden mode makes the check re-runnable TORCH-FREE afterwards:
  --golden-out FILE   records the verified input/features/translated weights;
  --golden-check FILE re-runs only the flax side against the recording
                      (catches model/translation regressions without torch).

Usage:
    python scripts/verify_torch_import.py --pth ~/resnet50-11ad3fa6.pth \
        --golden-out goldens/resnet50.npz
    python scripts/verify_torch_import.py --golden-check goldens/resnet50.npz
    python scripts/verify_torch_import.py --selftest   # synthetic state_dict
"""

import json
import os
import sys
from dataclasses import dataclass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


@dataclass
class VerifyConfig:
    """Torch->flax ResNet import verification.

    Fields:
        pth: path to a torchvision ResNet state_dict (.pth).
        selftest: use a synthetic torchvision-layout state_dict instead of a
            file (random weights — verifies the translation machinery, not
            ImageNet weights).
        selftest_backbone: resnet18|resnet34|resnet50|resnet101 for --selftest.
        height/width/batch/seed: fixed verification input.
        tol: max |flax - torch| allowed on pooled features (fp32).
        golden_out: record verified goldens (npz) for torch-free re-checks.
        golden_check: verify the flax side against a golden recording
            (torch not required).
    """

    pth: str = ""
    selftest: bool = False
    selftest_backbone: str = "resnet50"
    height: int = 64
    width: int = 64
    batch: int = 2
    seed: int = 0
    tol: float = 2e-4
    golden_out: str = ""
    golden_check: str = ""


_STAGES = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
}


def synthetic_state_dict(backbone: str, seed: int = 0):
    """Random-weight state_dict in torchvision's exact key layout (used by
    --selftest and the test suite; mirrors torchvision.models.resnet naming)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    stages = _STAGES[backbone]
    bottleneck = backbone in ("resnet50", "resnet101")
    sd = {}

    def conv(key, cout, cin, k):
        # small magnitudes: keep activations in a well-conditioned range
        sd[key] = torch.randn(cout, cin, k, k, generator=g) * (cin * k * k) ** -0.5

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.randn(c, generator=g).abs() * 0.2 + 0.9
        sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.1
        sd[f"{prefix}.running_mean"] = torch.randn(c, generator=g) * 0.1
        sd[f"{prefix}.running_var"] = torch.randn(c, generator=g).abs() * 0.2 + 0.9
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(1)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    cin = 64
    for L, (n_blocks, w) in enumerate(zip(stages, widths), start=1):
        for B in range(n_blocks):
            pre = f"layer{L}.{B}"
            cout = 4 * w if bottleneck else w
            c_in_block = cin if B == 0 else cout
            if bottleneck:
                conv(f"{pre}.conv1.weight", w, c_in_block, 1)
                bn(f"{pre}.bn1", w)
                conv(f"{pre}.conv2.weight", w, w, 3)
                bn(f"{pre}.bn2", w)
                conv(f"{pre}.conv3.weight", cout, w, 1)
                bn(f"{pre}.bn3", cout)
            else:
                conv(f"{pre}.conv1.weight", w, c_in_block, 3)
                bn(f"{pre}.bn1", w)
                conv(f"{pre}.conv2.weight", w, w, 3)
                bn(f"{pre}.bn2", w)
            if B == 0 and c_in_block != cout:
                conv(f"{pre}.downsample.0.weight", cout, c_in_block, 1)
                bn(f"{pre}.downsample.1", cout)
        cin = 4 * w if bottleneck else w
    nf = 4 * 512 if bottleneck else 512
    sd["fc.weight"] = torch.randn(1000, nf, generator=g)
    sd["fc.bias"] = torch.randn(1000, generator=g)
    return sd


def infer_backbone(sd) -> str:
    """Recover the torchvision variant from the state_dict's key structure."""
    bottleneck = "layer1.0.conv3.weight" in sd
    stages = []
    for L in (1, 2, 3, 4):
        B = 0
        while f"layer{L}.{B}.conv1.weight" in sd:
            B += 1
        stages.append(B)
    stages = tuple(stages)
    if stages == (2, 2, 2, 2) and not bottleneck:
        return "resnet18"
    if stages == (3, 4, 6, 3):
        return "resnet50" if bottleneck else "resnet34"
    if stages == (3, 4, 23, 3) and bottleneck:
        return "resnet101"
    raise ValueError(f"unrecognized ResNet layout: stages={stages} bottleneck={bottleneck}")


def torch_reference_features(sd, x_nchw):
    """Eval-mode forward of torchvision.models.resnet reconstructed from the
    state_dict alone (v1.5 stride placement: stride on the 3x3 conv in
    Bottleneck). Returns pooled pre-fc features (N, C) as numpy."""
    import torch
    import torch.nn.functional as F

    def bn(t, p):
        return F.batch_norm(
            t, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
            sd[f"{p}.weight"], sd[f"{p}.bias"], False, 0.0, 1e-5,
        )

    with torch.no_grad():
        x = torch.as_tensor(x_nchw, dtype=torch.float32)
        x = F.relu(bn(F.conv2d(x, sd["conv1.weight"], stride=2, padding=3), "bn1"))
        x = F.max_pool2d(x, 3, 2, 1)
        for L in (1, 2, 3, 4):
            B = 0
            while f"layer{L}.{B}.conv1.weight" in sd:
                pre = f"layer{L}.{B}"
                bottleneck = f"{pre}.conv3.weight" in sd
                stride = 2 if (L > 1 and B == 0) else 1
                identity = x
                if bottleneck:
                    out = F.relu(bn(F.conv2d(x, sd[f"{pre}.conv1.weight"]), f"{pre}.bn1"))
                    out = F.relu(
                        bn(F.conv2d(out, sd[f"{pre}.conv2.weight"], stride=stride, padding=1),
                           f"{pre}.bn2")
                    )
                    out = bn(F.conv2d(out, sd[f"{pre}.conv3.weight"]), f"{pre}.bn3")
                else:
                    out = F.relu(
                        bn(F.conv2d(x, sd[f"{pre}.conv1.weight"], stride=stride, padding=1),
                           f"{pre}.bn1")
                    )
                    out = bn(F.conv2d(out, sd[f"{pre}.conv2.weight"], padding=1), f"{pre}.bn2")
                if f"{pre}.downsample.0.weight" in sd:
                    identity = bn(
                        F.conv2d(x, sd[f"{pre}.downsample.0.weight"], stride=stride),
                        f"{pre}.downsample.1",
                    )
                x = F.relu(out + identity)
                B += 1
        return F.adaptive_avg_pool2d(x, 1).flatten(1).numpy()


def flax_features(variables, backbone: str, x_nchw):
    """Pooled features from argus_tpu's flax ResNet for translated variables."""
    import jax.numpy as jnp

    from argus_tpu.models import resnet as R

    model = getattr(R, backbone)(output_dim=None)
    x = jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)))
    return np.asarray(model.apply(variables, x, train=False))


def translated_variables(sd, backbone: str, hw):
    """Init the bare flax ResNet and merge the translated torch weights in."""
    import jax
    import jax.numpy as jnp

    from argus_tpu.models import resnet as R
    from argus_tpu.models.torch_import import load_torch_resnet

    model = getattr(R, backbone)(output_dim=None)
    x0 = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    return load_torch_resnet(sd, variables, backbone_scope="")


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def main(cfg: VerifyConfig) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")  # fp32 exactness; no TPU needed

    rng = np.random.default_rng(cfg.seed)
    hw = (cfg.height, cfg.width)

    if cfg.golden_check:
        with np.load(cfg.golden_check, allow_pickle=False) as z:
            backbone = str(z["backbone"])
            x = z["input"]
            want = z["features"]
            variables = _unflatten(
                {k[4:]: z[k] for k in z.files if k.startswith("var:")}
            )
        got = flax_features(variables, backbone, x)
        max_diff = float(np.abs(got - want).max())
        result = {
            "mode": "golden-check", "backbone": backbone,
            "max_abs_diff": max_diff, "tol": cfg.tol, "ok": max_diff <= cfg.tol,
        }
    else:
        if cfg.selftest:
            sd = synthetic_state_dict(cfg.selftest_backbone, cfg.seed)
        else:
            if not cfg.pth:
                raise SystemExit("need --pth FILE, --selftest, or --golden-check FILE")
            import torch

            sd = torch.load(cfg.pth, map_location="cpu", weights_only=True)
        backbone = infer_backbone(sd)
        x = rng.standard_normal((cfg.batch, 3, *hw)).astype(np.float32)
        want = torch_reference_features(sd, x)
        variables = translated_variables(sd, backbone, hw)
        got = flax_features(variables, backbone, x)
        scale = float(np.abs(want).max()) or 1.0
        max_diff = float(np.abs(got - want).max())
        result = {
            "mode": "selftest" if cfg.selftest else "pth",
            "backbone": backbone,
            "features": list(got.shape),
            "max_abs_diff": max_diff,
            "ref_feature_scale": scale,
            "tol": cfg.tol,
            "ok": max_diff <= cfg.tol,
        }
        if cfg.golden_out and result["ok"]:
            os.makedirs(os.path.dirname(cfg.golden_out) or ".", exist_ok=True)
            np.savez_compressed(
                cfg.golden_out,
                backbone=backbone, input=x, features=got,
                **{f"var:{k}": v for k, v in _flatten(variables).items()},
            )
            result["golden_out"] = cfg.golden_out

    print(json.dumps(result))
    if not result["ok"]:
        raise SystemExit(1)
    return result


if __name__ == "__main__":
    from argus_tpu.configs import cli

    main(cli(VerifyConfig))
