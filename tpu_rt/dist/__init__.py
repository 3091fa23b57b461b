from tpu_rt.dist.sharding import (
    make_ray_mesh,
    shard_rays,
    trace_sharded,
    render_diff_sharded,
    grad_step_sharded,
)
from tpu_rt.dist.multihost import init_multihost, measure_scaling

__all__ = [
    "make_ray_mesh",
    "shard_rays",
    "trace_sharded",
    "render_diff_sharded",
    "grad_step_sharded",
    "init_multihost",
    "measure_scaling",
]
