from cudabrot_tpu.models.fractals import FRACTALS, FractalMap, cull_mask, step

__all__ = ["FRACTALS", "FractalMap", "cull_mask", "step"]
