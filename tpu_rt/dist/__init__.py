from tpu_rt.dist.sharding import (
    make_ray_mesh,
    shard_rays,
    trace_sharded,
    render_diff_sharded,
    grad_step_sharded,
)

__all__ = [
    "make_ray_mesh",
    "shard_rays",
    "trace_sharded",
    "render_diff_sharded",
    "grad_step_sharded",
]
