from nimble_tpu.align.engine import AlignEngine, AlignParams

__all__ = ["AlignEngine", "AlignParams"]
