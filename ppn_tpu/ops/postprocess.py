"""Full on-device post-processing pipeline: feature map → parsed People.

This is the TPU-native ``get_humans_by_feature`` (ref:predict.py†,
SURVEY.md §3.2): decode → per-class NMS → greedy limb assembly, all jittable
with static shapes so JPEG-to-poses never leaves the device (BASELINE
north-star). ``postprocess_*_fn`` are the unjitted bodies for composing into
larger jitted pipelines; the bare names are jitted conveniences.
"""

from __future__ import annotations

from functools import partial

import jax

from ppn_tpu.configs.base import PPNConfig
from ppn_tpu.ops import decode as dec
from ppn_tpu.ops import nms as nmsops
from ppn_tpu.ops import parse as parseops
from ppn_tpu.ops.parse import People


def postprocess_single_fn(cfg: PPNConfig, feature_map) -> People:
    """(H', W', C) feature map → People for one image (composable body)."""
    act, props = dec.decode(cfg, feature_map)
    nms = nmsops.nms_single(cfg, props)
    return parseops.parse_single(cfg, act, props, nms)


def postprocess_batch_fn(cfg: PPNConfig, feature_map) -> People:
    """(B, H', W', C) feature map → batched People (composable body)."""
    act, props = dec.decode(cfg, feature_map)
    nms = nmsops.nms_batch(cfg, props)
    return parseops.parse_batch(cfg, act, props, nms)


postprocess_single = partial(jax.jit, static_argnums=0)(postprocess_single_fn)
postprocess_batch = partial(jax.jit, static_argnums=0)(postprocess_batch_fn)


def postprocess_batch_fast_fn(cfg: PPNConfig, feature_map,
                              exact_bf16: bool = False) -> People:
    """Fastest batched postprocess for the current backend (composable).

    On TPU this is a fused Pallas kernel — decode, exact greedy NMS and
    limb parsing in one VMEM-resident program; elsewhere the XLA
    pipeline. Results are elementwise identical (tested). Two kernel
    variants: the batch-packed kernel (ops/pallas_post_packed.py, G
    images per grid step — amortizes the per-image serial chains) when
    the batch fills at least one group, else the per-image kernel.

    exact_bf16: the packed kernel builds its prep views in bfloat16 —
    lossless iff the feature-map values are bf16-exact, which holds for
    raw model outputs (the head computes in bf16 and upcasts) but NOT
    for TTA-averaged maps. Only affects the packed-kernel path.
    """
    if jax.default_backend() == "tpu":
        from ppn_tpu.ops.pallas_post import postprocess_batch_pallas
        from ppn_tpu.ops.pallas_post_packed import (
            group_size, postprocess_batch_packed)

        B = feature_map.shape[0]
        # Wide q=256 blocks pack 2× the images per grid step; measured
        # ~0.45 ms faster @B=128 (NMS/window/walk all shrink — r4
        # attribution, docs/ARCHITECTURE.md). Used whenever the batch
        # fills a wide group; decisions are identical for any q (tested).
        if B >= group_size(cfg, q=256):
            return postprocess_batch_packed(cfg, feature_map,
                                            exact_bf16=exact_bf16, q=256)
        if B >= group_size(cfg):
            return postprocess_batch_packed(cfg, feature_map,
                                            exact_bf16=exact_bf16)
        return postprocess_batch_pallas(cfg, feature_map)
    return postprocess_batch_fn(cfg, feature_map)


postprocess_batch_fast = partial(
    jax.jit, static_argnums=0, static_argnames=("exact_bf16",))(
    postprocess_batch_fast_fn)


def forward_postprocess_fast_fn(cfg: PPNConfig, model, images) -> People:
    """Fused model forward + postprocess, fastest path per backend
    (composable body — jit the caller).

    On TPU with a batch that fills a packed-kernel group, the head runs
    as a transposed GEMM emitting the kernel's channels-major views
    directly (``model.packed_feature`` + ``views_from_packed_head``):
    no feature-map relayout, no f32 upcast — ~1.3 ms off the fused
    B=128 serving batch vs forward + postprocess_batch_fast_fn.
    Decisions are identical to the standard path (tested on hardware:
    tools/tpu_parity_artifact.py packed_head_serving; the head GEMM
    matches the 1×1 conv to 1 bf16 ulp — the conv lowering's
    accumulation order differs — and every parse decision is bitwise).
    Elsewhere: standard forward + the per-backend postprocess dispatch.
    """
    if jax.default_backend() == "tpu":
        from ppn_tpu.ops.pallas_post_packed import (
            group_size, packed_call, views_from_packed_head)

        B = images.shape[0]
        # widest quantity block the batch fills: each doubling halves the
        # serial per-group stage count (q=512 vs 256 measured −0.7 ms on
        # the B=128 fused batch even with its larger padded tail)
        for q in (512, 256, 128):
            if B >= group_size(cfg, q=q):
                box_t, e_t = model.packed_feature(images, q=q)
                views = views_from_packed_head(cfg, box_t, e_t, q=q)
                return packed_call(cfg, B, views, exact_bf16=True, q=q)
    fm = model(images)
    return postprocess_batch_fast_fn(cfg, fm, exact_bf16=True)


def forward_postprocess_packed_fn(cfg: PPNConfig, model, images,
                                  q: int = 256) -> People:
    """The packed-head fused path at an explicit quantity width (A/B
    harness entry; forward_postprocess_fast_fn picks q automatically)."""
    from ppn_tpu.ops.pallas_post_packed import (packed_call,
                                                views_from_packed_head)

    box_t, e_t = model.packed_feature(images, q=q)
    views = views_from_packed_head(cfg, box_t, e_t, q=q)
    return packed_call(cfg, images.shape[0], views, exact_bf16=True, q=q)
