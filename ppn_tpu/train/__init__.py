from ppn_tpu.train import loss

__all__ = ["loss"]
