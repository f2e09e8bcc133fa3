"""torchvision -> flax weight-translation tests.

Builds a real torchvision-layout state_dict with torch (CPU) for a tiny ResNet-18
and checks numerical equivalence of the translated forward pass's first stage."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from argus_tpu.models import NCameraCNN, NCameraCNNConfig  # noqa: E402
from argus_tpu.models.torch_import import load_torch_resnet, translate_torch_resnet_state_dict  # noqa: E402


def _fake_torch_resnet18_state_dict():
    """Minimal torchvision-resnet18-shaped state_dict (random weights)."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def conv(key, cout, cin, k):
        sd[key] = torch.randn(cout, cin, k, k, generator=g)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = torch.randn(c, generator=g).abs() + 0.5
        sd[f"{prefix}.bias"] = torch.randn(c, generator=g)
        sd[f"{prefix}.running_mean"] = torch.randn(c, generator=g)
        sd[f"{prefix}.running_var"] = torch.randn(c, generator=g).abs() + 0.5
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(1)

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    channels = [64, 128, 256, 512]
    for L, c in enumerate(channels, start=1):
        cin = channels[L - 2] if L > 1 else 64
        for B in range(2):
            c_in_block = cin if B == 0 else c
            conv(f"layer{L}.{B}.conv1.weight", c, c_in_block, 3)
            bn(f"layer{L}.{B}.bn1", c)
            conv(f"layer{L}.{B}.conv2.weight", c, c, 3)
            bn(f"layer{L}.{B}.bn2", c)
            if B == 0 and L > 1:
                conv(f"layer{L}.{B}.downsample.0.weight", c, c_in_block, 1)
                bn(f"layer{L}.{B}.downsample.1", c)
    sd["fc.weight"] = torch.randn(1000, 512, generator=g)
    sd["fc.bias"] = torch.randn(1000, generator=g)
    return sd


def test_translate_key_structure():
    sd = _fake_torch_resnet18_state_dict()
    params, stats = translate_torch_resnet_state_dict(sd)
    assert params["conv_init"]["kernel"].shape == (7, 7, 3, 64)
    assert params["stage0_block0"]["Conv_0"]["kernel"].shape == (3, 3, 64, 64)
    assert params["stage1_block0"]["conv_proj"]["kernel"].shape == (1, 1, 64, 128)
    assert stats["norm_init"]["mean"].shape == (64,)
    assert stats["stage3_block1"]["BatchNorm_1"]["var"].shape == (512,)
    assert "fc" not in params  # classifier intentionally not imported


def test_load_into_ncamera_cnn_and_numerics():
    sd = _fake_torch_resnet18_state_dict()
    cfg = NCameraCNNConfig(n_cams=2, backbone="resnet18", resnet_output_dim=16)
    model = NCameraCNN(cfg)
    x = jnp.zeros((1, 64, 64, 6))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    new_vars = load_torch_resnet(sd, variables)

    # imported leaves landed (conv_init kernel matches the torch tensor)
    got = np.asarray(new_vars["params"]["backbone"]["conv_init"]["kernel"])
    want = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    assert np.allclose(got, want)

    # numerical check of the stem: torch conv1+bn1(eval) vs flax conv_init+norm_init
    img = torch.randn(1, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    conv = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    conv.weight.data = sd["conv1.weight"]
    bn = torch.nn.BatchNorm2d(64)
    bn.weight.data = sd["bn1.weight"]
    bn.bias.data = sd["bn1.bias"]
    bn.running_mean.data = sd["bn1.running_mean"]
    bn.running_var.data = sd["bn1.running_var"]
    bn.eval()
    with torch.no_grad():
        torch_out = torch.relu(bn(conv(img))).numpy()  # (1, 64, 32, 32)

    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)), use_bias=False, name="conv_init")(x)
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="norm_init")(x)
            return nn.relu(x)

    stem_vars = {
        "params": {
            "conv_init": new_vars["params"]["backbone"]["conv_init"],
            "norm_init": new_vars["params"]["backbone"]["norm_init"],
        },
        "batch_stats": {"norm_init": new_vars["batch_stats"]["backbone"]["norm_init"]},
    }
    jx = jnp.asarray(img.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    flax_out = np.asarray(Stem().apply(stem_vars, jx)).transpose(0, 3, 1, 2)
    assert np.allclose(flax_out, torch_out, atol=2e-4)


def test_shape_mismatch_raises():
    sd = _fake_torch_resnet18_state_dict()
    cfg = NCameraCNNConfig(n_cams=2, backbone="resnet50", resnet_output_dim=16)  # wrong arch
    model = NCameraCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 6)), train=False)
    with pytest.raises((ValueError, KeyError)):
        load_torch_resnet(sd, variables)


def _load_verify_script():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "verify_torch_import.py")
    spec = importlib.util.spec_from_file_location("verify_torch_import", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_verify_cli_full_network_and_golden(tmp_path):
    """scripts/verify_torch_import.py (VERDICT r3 #8): the state-dict-driven
    torch-functional reference forward must agree with the flax model carrying
    the translated weights across the FULL network (not just the stem), and the
    recorded golden must replay torch-free."""
    v = _load_verify_script()

    # full-network agreement on the synthetic torchvision-layout state_dict
    golden = str(tmp_path / "g.npz")
    res = v.main(v.VerifyConfig(
        selftest=True, selftest_backbone="resnet18",
        height=32, width=32, golden_out=golden,
    ))
    assert res["ok"] and res["max_abs_diff"] < 2e-4
    assert res["backbone"] == "resnet18"

    # torch-free golden replay
    res2 = v.main(v.VerifyConfig(golden_check=golden))
    assert res2["ok"] and res2["mode"] == "golden-check"

    # a perturbed translation must FAIL the golden check (the check has teeth)
    import numpy as np

    with np.load(golden) as z:
        data = {k: z[k] for k in z.files}
    key = next(k for k in data if k.startswith("var:") and data[k].ndim == 4)
    data[key] = data[key] + 0.05
    bad = str(tmp_path / "bad.npz")
    np.savez_compressed(bad, **data)
    with pytest.raises(SystemExit):
        v.main(v.VerifyConfig(golden_check=bad))


def test_verify_cli_infer_backbone():
    v = _load_verify_script()
    assert v.infer_backbone(v.synthetic_state_dict("resnet50")) == "resnet50"
    assert v.infer_backbone(_fake_torch_resnet18_state_dict()) == "resnet18"
