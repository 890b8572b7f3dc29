"""AOT serving export (jax.export → serialized StableHLO artifact).

Production-deployment path the reference lacks entirely: the full
inference pipeline (forward + decode + NMS + limb parsing, with weights
baked in as constants) is exported once and can be reloaded and invoked in
any process — no model code, checkpoint, or retracing needed — or handed
to a non-JAX runtime that consumes StableHLO.

    from ppn_tpu.utils.export import export_pipeline, load_pipeline
    blob = export_pipeline(cfg, graphdef, state, batch=8)
    open("ppn.stablehlo", "wb").write(blob)
    ...
    run = load_pipeline(open("ppn.stablehlo", "rb").read())
    boxes, scores, valid = run(images)       # (8, H, W, 3) f32
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ppn_tpu.configs.base import Config
from ppn_tpu.ops import postprocess as post
from ppn_tpu.train import steps as st


def export_pipeline(cfg: Config, graphdef, state, batch: int = 8,
                    platform: Optional[str] = None) -> bytes:
    """Serialize the inference pipeline for `batch`-sized inputs.

    Weights from `state` are closed over (exported as constants). Returns
    the serialized artifact bytes. `platform` defaults to the current
    backend; pass "tpu"/"cpu" to cross-export.
    """
    model = nnx.merge(graphdef, st.eval_params(state), state.rest)
    model.eval()
    graphdef, params, rest = nnx.split(model, nnx.Param, ...)
    params = jax.device_get(params)
    rest = jax.device_get(rest)

    def pipeline(images):
        m = nnx.merge(graphdef, params, rest)
        fm = m(images)
        # XLA formulation: portable across platforms (the Pallas kernel
        # would pin the artifact to TPU)
        p = post.postprocess_batch_fn(cfg.model, fm)
        return p.kp_box, p.kp_score, p.valid

    spec = jax.ShapeDtypeStruct((batch, *cfg.model.insize, 3), jnp.float32)
    platforms = [platform] if platform else None
    exported = jax.export.export(jax.jit(pipeline),
                                 platforms=platforms)(spec)
    return bytes(exported.serialize())


def load_pipeline(blob: bytes) -> Callable:
    """Deserialize an exported pipeline into a callable(images)."""
    exported = jax.export.deserialize(blob)

    def run(images: np.ndarray):
        return exported.call(jnp.asarray(images, jnp.float32))

    return run
