from ppn_tpu.eval.pckh import PCKhEvaluator, headsize_from_bbox

__all__ = ["PCKhEvaluator", "headsize_from_bbox"]
