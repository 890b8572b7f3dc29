from ppn_tpu.data import synthetic

__all__ = ["synthetic"]
