"""Model shape/parameter tests (SURVEY.md §2.1 Backbone/Head rows)."""

import jax.numpy as jnp
import numpy as np
from flax import nnx

from ppn_tpu.configs import get_config
from ppn_tpu.nn import PoseProposalNet


def test_tiny_forward_shapes():
    cfg = get_config("tiny_test").model
    model = PoseProposalNet(cfg, rngs=nnx.Rngs(0))
    x = jnp.zeros((2, *cfg.insize, 3), jnp.float32)
    fm = model(x)
    assert fm.shape == (2, *cfg.outsize, cfg.num_channels)
    assert fm.dtype == jnp.float32


def test_resnet18_param_count():
    """ResNet-18 trunk ≈ 11.18M params (torchvision value minus fc)."""
    cfg = get_config("tiny_test").model
    model = PoseProposalNet(cfg, rngs=nnx.Rngs(0))
    import jax

    trunk = sum(
        p.size for p in jax.tree.leaves(nnx.state(model.backbone, nnx.Param)))
    # conv+bn params of torchvision resnet18 feature extractor: 11,176,512
    assert abs(trunk - 11_176_512) / 11_176_512 < 0.01, trunk


def test_eval_mode_deterministic():
    cfg = get_config("tiny_test").model
    model = PoseProposalNet(cfg, rngs=nnx.Rngs(0))
    model.eval()
    x = jnp.ones((1, *cfg.insize, 3), jnp.float32) * 0.5
    a = model(x)
    b = model(x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batchnorm_updates_in_train_mode():
    cfg = get_config("tiny_test").model
    model = PoseProposalNet(cfg, rngs=nnx.Rngs(0))
    model.train()
    before = np.asarray(model.backbone.stem.bn.mean[...]).copy()
    model(jnp.ones((2, *cfg.insize, 3), jnp.float32))
    after = np.asarray(model.backbone.stem.bn.mean[...])
    assert not np.array_equal(before, after)


def test_resnet50_bottleneck_trunk():
    """Bottleneck variant: 2048 output features, torchvision param count."""
    import jax

    from ppn_tpu.nn import resnet50

    bb = resnet50(rngs=nnx.Rngs(0))
    assert bb.out_features == 2048
    trunk = sum(p.size for p in jax.tree.leaves(nnx.state(bb, nnx.Param)))
    # conv+bn params of torchvision resnet50 minus fc: 23,508,032
    assert abs(trunk - 23_508_032) / 23_508_032 < 0.01, trunk
    bb.eval()
    y = bb(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert y.shape == (1, 2, 2, 2048)


def test_r50_config_forward():
    cfg = get_config("mpii_r50_384").model
    import dataclasses

    cfg = dataclasses.replace(cfg, insize=(64, 64), outsize=(2, 2),
                              local_grid_size=(3, 3))
    model = PoseProposalNet(cfg, rngs=nnx.Rngs(0))
    fm = model(jnp.zeros((1, *cfg.insize, 3), jnp.float32))
    assert fm.shape == (1, *cfg.outsize, cfg.num_channels)
    assert np.isfinite(np.asarray(fm)).all()
