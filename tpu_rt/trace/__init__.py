from tpu_rt.trace.cpu_reference import (
    RayStats,
    intersect_brute,
    trace_flat_scalar,
)
from tpu_rt.trace.xla_tracer import trace_wavefront, device_bvh

__all__ = [
    "RayStats",
    "intersect_brute",
    "trace_flat_scalar",
    "trace_wavefront",
    "device_bvh",
]
