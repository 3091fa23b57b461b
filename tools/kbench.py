#!/usr/bin/env python
"""Kernel iteration bench: time the packet tracer on a cached scene.

Usage: python tools/kbench.py [scene] [ray_type]
Env: TPU_RT_TILE, KB_WIDTH/KB_HEIGHT, KB_CHAIN, KB_REPEATS.

Prints ms per trace and Mray/s; meant for fast A/B iteration on
tpu_rt/trace/pallas_tracer.py (scene + BVH come from bvhcache).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    ray_type = sys.argv[2] if len(sys.argv) > 2 else "primary"
    width = int(os.environ.get("KB_WIDTH", 1024))
    height = int(os.environ.get("KB_HEIGHT", 768))
    chain = int(os.environ.get("KB_CHAIN", 4))
    repeats = int(os.environ.get("KB_REPEATS", 5))

    import jax
    import jax.numpy as jnp

    from tpu_rt.bvh import load_or_build_bvh
    from tpu_rt.raygen import RayGen
    from tpu_rt.scene import Camera, Scene, procedural
    from tpu_rt.trace import device_bvh
    from tpu_rt.trace.pallas_tracer import pack_kernel_tables, trace_packet_pallas
    from tpu_rt.trace.xla_tracer import trace_wavefront

    t0 = time.time()
    scene = Scene(procedural.scene_by_name(scene_name))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    lo, hi = scene.bbox()
    camera = Camera.for_bbox(lo, hi)
    rays, _, _ = RayGen().primary(camera, width, height)
    print(f"setup {time.time()-t0:.1f}s  tris={scene.num_triangles} "
          f"refs={np.asarray(flat.tri_woop).shape[0]} nodes={np.asarray(flat.nodes).shape[0]}")

    any_hit = False
    if ray_type != "primary":
        dbvh = device_bvh(flat)
        primary_hits = trace_wavefront(dbvh, rays)
        jax.block_until_ready(primary_hits)
        from tpu_rt.raygen.generators import gen_ao_rays

        max_dist = float(np.linalg.norm(hi - lo)) * 0.1 if ray_type == "ao" else camera.far
        rays, _, _ = gen_ao_rays(
            rays.origin, rays.dirn, primary_hits.t, primary_hits.tri,
            jnp.asarray(scene.tri_normal), 1, jnp.float32(max_dist), jnp.uint32(0),
        )
        any_hit = ray_type == "ao"

    packed = pack_kernel_tables(flat)
    assert packed is not None, "scene exceeds packing limits"
    tables = (jnp.asarray(packed[0]), jnp.asarray(packed[1]))
    n = int(rays.origin.shape[0])

    def run(reps: int = 1) -> int:
        acc = jnp.int32(0)
        for _ in range(reps):
            hits = trace_packet_pallas(flat, rays, any_hit=any_hit, tables=tables)
            acc = acc + jnp.sum(hits.tri)
        return int(acc)

    t0 = time.time()
    run()
    print(f"compile+first {time.time()-t0:.1f}s")
    run()

    times = []
    for _ in range(repeats):
        t = time.perf_counter()
        run(chain)
        times.append((time.perf_counter() - t) / chain)
    best = min(times)
    print(f"{scene_name} {ray_type}: best {best*1e3:.2f} ms  mean {np.mean(times)*1e3:.2f} ms  "
          f"{n/(best*1e6):.2f} Mray/s  (n={n}, TILE={os.environ.get('TPU_RT_TILE', 4096)})")


if __name__ == "__main__":
    main()
