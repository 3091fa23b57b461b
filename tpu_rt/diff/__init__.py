from tpu_rt.diff.tracer import trace_diff, moller_trumbore_tuv
from tpu_rt.diff.shading import shade_hits_diff, render_image_diff

__all__ = ["trace_diff", "moller_trumbore_tuv", "shade_hits_diff", "render_image_diff"]
