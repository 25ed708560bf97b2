from .quantize import dynamic_quantize_np, hash32_np
from .host import diff_compact_indices, sketch_events_np

__all__ = [
    "dynamic_quantize_np",
    "hash32_np",
    "diff_compact_indices",
    "sketch_events_np",
]
