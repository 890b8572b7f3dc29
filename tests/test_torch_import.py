"""Torchvision-format weight conversion tests (no torchvision needed: a
state_dict with the exact torchvision resnet18 key names/shapes is
synthesized here)."""

import numpy as np
import pytest
from flax import nnx

from ppn_tpu.nn.resnet import resnet18
from ppn_tpu.utils.torch_import import load_torch_resnet


def _fake_torchvision_resnet18_sd(rng):
    """Key names and shapes exactly as torchvision resnet18 state_dict."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(0, 0.1, (o, i, k, k)).astype(
            np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(1, 0.1, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(
            rng.normal(1, 0.1, c)).astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.asarray(0)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage, cout in enumerate([64, 128, 256, 512]):
        for i in range(2):
            pre = f"layer{stage + 1}.{i}"
            conv(f"{pre}.conv1", cout, cin, 3)
            bn(f"{pre}.bn1", cout)
            conv(f"{pre}.conv2", cout, cout, 3)
            bn(f"{pre}.bn2", cout)
            if i == 0 and stage > 0:
                conv(f"{pre}.downsample.0", cout, cin, 1)
                bn(f"{pre}.downsample.1", cout)
            cin = cout
    sd["fc.weight"] = rng.normal(0, 0.1, (1000, 512)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


def test_conversion_consumes_everything_and_transposes():
    rng = np.random.default_rng(0)
    sd = _fake_torchvision_resnet18_sd(rng)
    bb = resnet18(rngs=nnx.Rngs(0))
    used = load_torch_resnet(bb, sd)
    assert used == 5 + 8 * 10 + 3 * 5
    # OIHW → HWIO spot checks
    np.testing.assert_allclose(
        np.asarray(bb.stem.conv.kernel[...]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(bb.blocks[2].proj.conv.kernel[...]),
        np.transpose(sd["layer2.0.downsample.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(bb.blocks[7].conv2.bn.var[...]),
        sd["layer4.1.bn2.running_var"])


def test_conversion_changes_forward():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    sd = _fake_torchvision_resnet18_sd(rng)
    bb = resnet18(rngs=nnx.Rngs(0))
    bb.eval()
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    before = np.asarray(bb(x))
    load_torch_resnet(bb, sd)
    after = np.asarray(bb(x))
    assert not np.allclose(before, after)


def test_pretrained_cli_path_end_to_end(tmp_path):
    """--pretrained PATH on the train CLI: a run starts from the imported
    backbone weights (VERDICT r1 item 4 — the converter must be wired in,
    not orphaned)."""
    import torch

    from ppn_tpu.apps import train as train_app
    from ppn_tpu.configs import get_config
    from ppn_tpu.train import steps as st

    rng = np.random.default_rng(2)
    sd = _fake_torchvision_resnet18_sd(rng)
    pth = tmp_path / "resnet18.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pth)

    cfg = get_config("tiny_test")
    _, state, _ = st.create_train_state(cfg, pretrained=str(pth))
    got = np.asarray(
        state.params["backbone"]["stem"]["conv"]["kernel"][...])
    np.testing.assert_allclose(
        got, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))

    # and the full CLI accepts it
    train_app.main([
        "--config", "tiny_test", "--overfit", "2", "--steps", "2",
        "--ckpt-dir", str(tmp_path / "ckpt"), "--no-resume",
        "--pretrained", str(pth),
    ])


def test_strict_mismatch_raises():
    rng = np.random.default_rng(0)
    sd = _fake_torchvision_resnet18_sd(rng)
    sd["layer9.0.extra.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    bb = resnet18(rngs=nnx.Rngs(0))
    with pytest.raises(ValueError, match="consumed"):
        load_torch_resnet(bb, sd)


def _fake_torchvision_resnet50_sd(rng):
    """Key names/shapes exactly as torchvision resnet50 state_dict."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(0, 0.1, (o, i, k, k)).astype(
            np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(1, 0.1, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[f"{name}.running_var"] = np.abs(
            rng.normal(1, 0.1, c)).astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.asarray(0)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for stage, (n, cout) in enumerate(zip([3, 4, 6, 3],
                                          [64, 128, 256, 512])):
        for i in range(n):
            pre = f"layer{stage + 1}.{i}"
            conv(f"{pre}.conv1", cout, cin, 1)
            bn(f"{pre}.bn1", cout)
            conv(f"{pre}.conv2", cout, cout, 3)
            bn(f"{pre}.bn2", cout)
            conv(f"{pre}.conv3", cout * 4, cout, 1)
            bn(f"{pre}.bn3", cout * 4)
            if i == 0:
                conv(f"{pre}.downsample.0", cout * 4, cin, 1)
                bn(f"{pre}.downsample.1", cout * 4)
            cin = cout * 4
    sd["fc.weight"] = rng.normal(0, 0.1, (1000, 2048)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


def test_resnet50_bottleneck_conversion():
    from ppn_tpu.nn.resnet import resnet50

    rng = np.random.default_rng(2)
    sd = _fake_torchvision_resnet50_sd(rng)
    bb = resnet50(rngs=nnx.Rngs(0))
    used = load_torch_resnet(bb, sd)
    assert used == 5 + 16 * 15 + 4 * 5
    np.testing.assert_allclose(
        np.asarray(bb.blocks[0].conv3.bn.var[...]),
        sd["layer1.0.bn3.running_var"])
    np.testing.assert_allclose(
        np.asarray(bb.blocks[13].proj.conv.kernel[...]),
        np.transpose(sd["layer4.0.downsample.0.weight"], (2, 3, 1, 0)))


def test_bottleneck_sd_into_basic_backbone_raises():
    rng = np.random.default_rng(3)
    sd = _fake_torchvision_resnet50_sd(rng)
    bb = resnet18(rngs=nnx.Rngs(0))
    with pytest.raises(ValueError):
        load_torch_resnet(bb, sd)
