from ppn_tpu.ops import (
    augment,
    boxes,
    decode,
    encode,
    image,
    nms,
    parse,
    postprocess,
)

__all__ = ["augment", "boxes", "decode", "encode", "image", "nms", "parse",
           "postprocess"]
