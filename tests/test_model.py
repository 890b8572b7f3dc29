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
