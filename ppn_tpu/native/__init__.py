from ppn_tpu.native.loader import NativeJpegLoader, decode_resize, available

__all__ = ["NativeJpegLoader", "decode_resize", "available"]
