"""Shared image file loading for dataset classes.

JPEG files route through the native C++ decode+resize (ppn_tpu/native,
off-GIL libjpeg — the host half of BASELINE's JPEG→poses metric); other
formats (and environments without the native .so) use PIL.

Parity note (docs/PARITY.md): the native resize is plain half-pixel
bilinear while PIL's BILINEAR applies an area filter on downscale — the
pixels differ slightly; GT coordinate semantics are identical (both scale
by original-size / insize).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def load_resized(path: str, out_hw: Tuple[int, int],
                 native_jpeg: bool = True):
    """path → ((H, W, 3) float32 [0,1], W0, H0 original dims)."""
    Ht, Wt = out_hw
    if native_jpeg and path.lower().endswith((".jpg", ".jpeg")):
        from ppn_tpu.native import loader as nl

        if nl.available():
            with open(path, "rb") as f:
                data = f.read()
            W0, H0 = nl.jpeg_dims(data)
            return nl.decode_resize(data, (Ht, Wt)), W0, H0
    from PIL import Image

    img = Image.open(path).convert("RGB")
    W0, H0 = img.size
    img = img.resize((Wt, Ht), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0, W0, H0
