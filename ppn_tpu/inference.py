"""High-level inference API: the "switch from the reference" surface.

    from ppn_tpu.inference import Predictor
    p = Predictor.from_checkpoint("mpii_r18_384", "/ckpts/run1")
    people = p.predict(images)          # (B, H, W, 3) float32 [0,1]
    people0 = p.predict_single(image)   # (H, W, 3)

Wraps model restore + jitted forward + the fastest postprocess backend for
the current device (fused Pallas kernel on TPU). Holds compiled functions
per batch shape.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from flax import nnx

from ppn_tpu.configs import Config, get_config
from ppn_tpu.ops import postprocess as post
from ppn_tpu.ops.parse import People


class Predictor:
    def __init__(self, cfg: Config, graphdef, params, rest,
                 flip_tta: bool = False):
        self.cfg = cfg
        self._graphdef = graphdef
        self._params = params
        self._rest = rest

        @jax.jit
        def _run(params, rest, images):
            m = nnx.merge(graphdef, params, rest)
            if flip_tta:
                from ppn_tpu.ops.tta import merge_flip_tta, mirror_images
                fm = m(images)
                fm = merge_flip_tta(cfg.model, fm,
                                    m(mirror_images(images)))
                # bf16 prep views are lossless only for raw model outputs
                # — TTA-averaged maps are not bf16-exact
                return post.postprocess_batch_fast_fn(cfg.model, fm,
                                                      exact_bf16=False)
            # fused fast path: wide TPU batches run the head as a
            # transposed GEMM emitting the packed kernel's views directly
            return post.forward_postprocess_fast_fn(cfg.model, m, images)

        self._run = _run

    # ---- constructors ------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, config: str | Config,
                        ckpt_dir: Optional[str] = None,
                        flip_tta: bool = False) -> "Predictor":
        from ppn_tpu.apps.predict import load_state
        from ppn_tpu.train import steps as st

        cfg = get_config(config) if isinstance(config, str) else config
        graphdef, state = load_state(cfg, ckpt_dir)
        model = nnx.merge(graphdef, st.eval_params(state), state.rest)
        model.eval()
        graphdef, params, rest = nnx.split(model, nnx.Param, ...)
        return cls(cfg, graphdef, params, rest, flip_tta=flip_tta)

    # ---- inference ---------------------------------------------------------
    def predict(self, images: np.ndarray) -> People:
        """(B, H, W, 3) float32 [0,1] or uint8, at cfg insize → host People."""
        if images.ndim != 4:
            raise ValueError(f"expected (B, H, W, 3), got {images.shape}")
        if images.shape[1:3] != tuple(self.cfg.model.insize):
            raise ValueError(
                f"images are {images.shape[1:3]}, config expects "
                f"{self.cfg.model.insize}; resize first "
                "(ppn_tpu.ops.image.resize_bilinear or the native loader)")
        if images.dtype != np.uint8:
            images = images.astype(np.float32)
        return jax.device_get(self._run(self._params, self._rest, images))

    def predict_single(self, image: np.ndarray) -> People:
        ppl = self.predict(image[None])
        return jax.tree.map(lambda x: x[0], ppl)
