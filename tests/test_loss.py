"""Loss tests: golden NumPy oracle + perfect-prediction zeroing (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppn_tpu.configs import get_config
from ppn_tpu.data.synthetic import random_people
from ppn_tpu.ops import encode as enc
from ppn_tpu.train.loss import ppn_loss


def _targets(cfg, seed=0, batch=2):
    ss = [random_people(np.random.default_rng(seed + i), cfg.model,
                        cfg.data.max_persons) for i in range(batch)]
    batched = {k: np.stack([s[k] for s in ss]) for k in ss[0]}
    return enc.encode_batch(cfg.model, batched["keypoints"],
                            batched["visible"], batched["bboxes"],
                            batched["valid"])


def _numpy_oracle(m, fm, t):
    """Independent NumPy reimplementation of the 5-term loss."""

    def sig(x):
        return 1.0 / (1.0 + np.exp(-x))

    K1 = m.num_classes
    H, W = m.outsize
    Hl, Wl = m.local_grid_size
    L = m.num_limbs
    sy, sx = m.stride
    img_h, img_w = m.insize
    B = fm.shape[0]

    resp = sig(fm[..., 0:K1])
    conf = sig(fm[..., K1:2 * K1])
    x = sig(fm[..., 2 * K1:3 * K1])
    y = sig(fm[..., 3 * K1:4 * K1])
    w = sig(fm[..., 4 * K1:5 * K1])
    h = sig(fm[..., 5 * K1:6 * K1])
    e = sig(fm[..., 6 * K1:]).reshape(B, H, W, L, Hl, Wl)

    delta = np.asarray(t.delta)
    iy, ix = np.mgrid[0:H, 0:W]
    iy = iy[None, ..., None]
    ix = ix[None, ..., None]

    # IoU between predicted and GT boxes (pixels, center format)
    px, py = (ix + x) * sx, (iy + y) * sy
    pw, ph = w * img_w, h * img_h
    gx, gy = (ix + np.asarray(t.tx)) * sx, (iy + np.asarray(t.ty)) * sy
    gw, gh = np.asarray(t.tw) * img_w, np.asarray(t.th) * img_h
    x0 = np.maximum(px - pw / 2, gx - gw / 2)
    y0 = np.maximum(py - ph / 2, gy - gh / 2)
    x1 = np.minimum(px + pw / 2, gx + gw / 2)
    y1 = np.minimum(py + ph / 2, gy + gh / 2)
    inter = np.maximum(x1 - x0, 0) * np.maximum(y1 - y0, 0)
    union = np.maximum(pw * ph + gw * gh - inter, 1e-9)
    iou = inter / union

    eps = 1e-6
    limb_sq = (np.asarray(t.te) - e) ** 2
    if m.limb_loss_mode == "paired":
        ch, cw = Hl // 2, Wl // 2
        mask = np.zeros_like(limb_sq)
        for l, (s_c, d_c) in enumerate(m.edges):
            for dy in range(Hl):
                for dx in range(Wl):
                    for yy in range(H):
                        for xx in range(W):
                            y2, x2 = yy + dy - ch, xx + dx - cw
                            dd = (delta[:, y2, x2, d_c]
                                  if 0 <= y2 < H and 0 <= x2 < W else 0.0)
                            mask[:, yy, xx, l, dy, dx] = np.maximum(
                                delta[:, yy, xx, s_c], dd)
        limb = np.sum(mask * limb_sq)
    else:
        limb = np.sum(limb_sq)
    terms = {
        "loss_resp": np.sum((delta - resp) ** 2),
        "loss_iou": np.sum(delta * (iou - conf) ** 2),
        "loss_coor": np.sum(delta * ((np.asarray(t.tx) - x) ** 2 +
                                     (np.asarray(t.ty) - y) ** 2)),
        "loss_size": np.sum(delta * (
            (np.sqrt(np.maximum(np.asarray(t.tw), eps)) -
             np.sqrt(np.maximum(w, eps))) ** 2 +
            (np.sqrt(np.maximum(np.asarray(t.th), eps)) -
             np.sqrt(np.maximum(h, eps))) ** 2)),
        "loss_limb": limb,
    }
    return {k: v / B for k, v in terms.items()}


@pytest.fixture(params=["tiny_test", "mpii_r18_384"])
def cfg(request):
    return get_config(request.param)


def test_loss_matches_numpy_oracle(cfg):
    m = cfg.model
    t = _targets(cfg)
    rng = np.random.default_rng(7)
    fm = rng.normal(0, 1.5, (2, *m.outsize, m.num_channels)).astype(np.float32)
    total, terms = ppn_loss(m, jnp.asarray(fm), t)
    golden = _numpy_oracle(m, fm, t)
    for k, v in golden.items():
        np.testing.assert_allclose(float(terms[k]), v, rtol=2e-4,
                                   err_msg=k)
    expect = (m.lambda_resp * golden["loss_resp"]
              + m.lambda_iou * golden["loss_iou"]
              + m.lambda_coor * golden["loss_coor"]
              + m.lambda_size * golden["loss_size"]
              + m.lambda_limb * golden["loss_limb"])
    np.testing.assert_allclose(float(total), expect, rtol=2e-4)


def test_loss_all_mode_matches_oracle():
    import dataclasses

    cfg = get_config("tiny_test")
    m = dataclasses.replace(cfg.model, limb_loss_mode="all")
    t = _targets(cfg)
    rng = np.random.default_rng(9)
    fm = rng.normal(0, 1.5, (2, *m.outsize, m.num_channels)).astype(np.float32)
    _, terms = ppn_loss(m, jnp.asarray(fm), t)
    golden = _numpy_oracle(m, fm, t)
    np.testing.assert_allclose(float(terms["loss_limb"]),
                               golden["loss_limb"], rtol=2e-4)


def test_perfect_prediction_near_zero_loss(cfg):
    m = cfg.model
    t = _targets(cfg, seed=3)
    fm = jax.vmap(lambda ti: enc.targets_to_feature_map(m, ti))(t)
    total, terms = ppn_loss(m, fm, t)
    # σ saturates at ~6e-6 from its targets; squared residuals are ~1e-10
    # per element, so even summed over the grid everything stays tiny.
    assert float(terms["loss_coor"]) < 1e-6
    assert float(terms["loss_size"]) < 1e-4   # sqrt-space widens σ clip error
    assert float(terms["loss_resp"]) < 1e-4
    assert float(terms["loss_iou"]) < 1e-4
    assert float(terms["loss_limb"]) < 1e-3


def test_iou_target_is_stop_gradient(cfg):
    """Grad of the iou term w.r.t. box channels comes only through the boxes'
    own appearance in other terms — the IoU label must not backprop."""
    m = cfg.model
    t = _targets(cfg, seed=5)
    fm0 = jnp.zeros((2, *m.outsize, m.num_channels))

    def iou_term_only(fm):
        _, terms = ppn_loss(m, fm, t)
        return terms["loss_iou"]

    g = jax.grad(iou_term_only)(fm0)
    K1 = m.num_classes
    # conf channels must receive gradient; x/y/w/h must not (label is
    # stop-gradient, and conf term touches boxes nowhere else).
    g = np.asarray(g)
    assert np.abs(g[..., K1:2 * K1]).sum() > 0
    assert np.abs(g[..., 2 * K1:6 * K1]).sum() == 0
