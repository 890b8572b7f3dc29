"""Transposed-head serving path (nn/model.py packed_feature).

The serving fast path computes the head's final 1×1 conv as a transposed
GEMM emitting the packed postprocess kernel's channels-major views
directly. These tests pin its contract:

* the GEMM outputs are (numerically, ideally bitwise) the standard
  forward's feature map cast to bf16 — same contraction, same bias add;
* the full packed pipeline (packed_feature → views_from_packed_head →
  packed_call) makes decisions identical to the XLA oracle on the same
  head values, across group-padded batch sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppn_tpu.configs import get_config
from ppn_tpu.ops import postprocess as post
from ppn_tpu.ops.pallas_post_packed import (group_size, group_stride,
                                            packed_call,
                                            views_from_packed_head)
from ppn_tpu.train import steps as st


def _model(cname):
    cfg = get_config(cname)
    model = st.create_model(cfg)
    model.eval()
    return cfg.model, model


def _reassemble(cfg, box_t, e_t, B, q):
    """(box_t, e_t) channels-major → (B, H', W', C) feature map."""
    H, W = cfg.outsize
    N = H * W
    G, Gp = group_size(cfg, q), group_stride(cfg, q)
    fm = jnp.concatenate([box_t, e_t], axis=0)       # (C, nb·Gp, Npad)
    C, BGp, Npad = fm.shape
    fm = fm.reshape(C, BGp // Gp, Gp, Npad)[:, :, :G]  # drop group pads
    fm = fm.reshape(C, -1, Npad)
    fm = jnp.transpose(fm[:, :B, :N], (1, 2, 0))     # (B, N, C)
    return fm.reshape(B, H, W, -1)


@pytest.mark.parametrize("cname", ["tiny_test", "mpii_r18_384"])
def test_packed_feature_matches_forward(cname):
    cfg, model = _model(cname)
    rng = np.random.default_rng(0)
    B = 3
    images = rng.random((B, *cfg.insize, 3), np.float32)
    want = jnp.asarray(model(images), jnp.bfloat16)  # f32(bf16) → bf16 exact
    box_t, e_t = model.packed_feature(jnp.asarray(images), q=128)
    G, Gp = group_size(cfg, 128), group_stride(cfg, 128)
    nb = -(-B // G)
    assert box_t.shape[1] == nb * Gp and e_t.shape[1] == nb * Gp
    assert box_t.dtype == jnp.bfloat16 and e_t.dtype == jnp.bfloat16
    got = _reassemble(cfg, box_t, e_t, B, 128)
    a = np.asarray(got.astype(jnp.float32))
    b = np.asarray(want.astype(jnp.float32))
    # CPU: conv lowers to the same dot — near-bitwise. (On TPU hardware
    # the conv lowering accumulates in a different pass order: ~88%
    # exact, residue = 1 bf16 ulp at accumulator scale; the decision-
    # level contract is pinned there by tools/tpu_parity_artifact.py
    # packed_head_serving.)
    np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-2)
    exact = float(np.mean(a == b))
    assert exact > 0.95, f"conv-vs-dot bf16 mismatch fraction {1 - exact}"


@pytest.mark.parametrize("q,B", [(128, 9), (256, 17), (128, 2), (512, 35)])
def test_packed_pipeline_decisions_match_oracle(q, B):
    """packed_feature → views_from_packed_head → packed_call decisions ==
    XLA oracle postprocess on the same (reassembled) head values; covers
    group-crossing and padded-tail batches at both quantity widths."""
    cfg, model = _model("tiny_test")
    rng = np.random.default_rng(q + B)
    images = jnp.asarray(rng.random((B, *cfg.insize, 3), np.float32))
    box_t, e_t = model.packed_feature(images, q=q)
    views = views_from_packed_head(cfg, box_t, e_t, q=q)
    got = jax.device_get(
        packed_call(cfg, B, views, interpret=True, exact_bf16=True, q=q))
    fm = _reassemble(cfg, box_t, e_t, B, q).astype(jnp.float32)
    want = jax.device_get(post.postprocess_batch(cfg, fm))
    for name in want._fields:
        a = np.asarray(getattr(got, name))
        b = np.asarray(getattr(want, name))
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4,
                                       err_msg=f"q={q} B={B} field {name}")
        else:
            np.testing.assert_array_equal(
                a, b, err_msg=f"q={q} B={B} field {name}")


def test_forward_postprocess_fast_cpu_fallback():
    """Off-TPU the fused dispatch takes the standard forward + XLA path
    and must agree with the oracle."""
    cfg, model = _model("tiny_test")
    rng = np.random.default_rng(5)
    images = jnp.asarray(rng.random((2, *cfg.insize, 3), np.float32))
    got = jax.device_get(post.forward_postprocess_fast_fn(cfg, model, images))
    want = jax.device_get(post.postprocess_batch(cfg, model(images)))
    for name in want._fields:
        np.testing.assert_array_equal(np.asarray(getattr(got, name)),
                                      np.asarray(getattr(want, name)),
                                      err_msg=f"field {name}")
