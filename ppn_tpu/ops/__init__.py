from ppn_tpu.ops import boxes, decode, encode

__all__ = ["boxes", "decode", "encode"]
