from ppn_tpu.ops import boxes, decode, encode, nms, parse, postprocess

__all__ = ["boxes", "decode", "encode", "nms", "parse", "postprocess"]
