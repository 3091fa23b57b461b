#!/usr/bin/env python
"""In-process (tile, K, U) sweep of the packet2 kernel on real hardware.

Usage: python tools/sweep2.py [scene] [ray_type] [tile,k,u[,c] ...]
e.g.   python tools/sweep2.py bunny primary 2048,4,3,2 2048,4,3,3

Each config is compiled once, warmed, then timed with a chained fence
(same discipline as bench.py).  Prints ms and Mray/s per config.
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
    configs = [tuple(int(v) for v in a.split(",")) for a in sys.argv[3:]]
    configs = [cfg + (1,) * (4 - len(cfg)) for cfg in configs]
    if not configs:
        configs = [(2048, 4, 3, 1), (2048, 4, 3, 2), (2048, 4, 3, 3)]
    width = int(os.environ.get("KB_WIDTH", 1024))
    height = int(os.environ.get("KB_HEIGHT", 768))
    chain = int(os.environ.get("KB_CHAIN", 4))
    repeats = int(os.environ.get("KB_REPEATS", 3))

    import jax
    import jax.numpy as jnp

    from tpu_rt.bvh import load_or_build_bvh
    from tpu_rt.raygen import RayGen
    from tpu_rt.scene import Camera, Scene, procedural
    from tpu_rt.trace import device_bvh
    from tpu_rt.trace.packet2 import (prepare_tables2, tables2_residency,
                                      trace_packet2)
    from tpu_rt.trace.xla_tracer import trace_wavefront

    scene = Scene(procedural.scene_by_name(scene_name))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    lo, hi = scene.bbox()
    camera = Camera.for_bbox(lo, hi)
    rays, _, _ = RayGen().primary(camera, width, height)

    any_hit = False
    if ray_type != "primary":
        dbvh = device_bvh(flat)
        primary_hits = trace_wavefront(dbvh, rays)
        jax.block_until_ready(primary_hits)
        from tpu_rt.raygen.generators import gen_ao_rays
        max_dist = (float(np.linalg.norm(hi - lo)) * 0.1
                    if ray_type == "ao" else camera.far)
        rays, _, _ = gen_ao_rays(
            rays.origin, rays.dirn, primary_hits.t, primary_hits.tri,
            jnp.asarray(scene.tri_normal), 1, jnp.float32(max_dist),
            jnp.uint32(0))
        any_hit = ray_type == "ao"

    tables = prepare_tables2(flat)
    hbm = tables2_residency(flat)
    n = int(rays.origin.shape[0])
    print(f"{scene_name} {ray_type}: {n} rays, hbm={hbm}")

    ref = None
    for tile, k, u, c in configs:
        try:
            def run(reps=1):
                acc = jnp.int32(0)
                for _ in range(reps):
                    h = trace_packet2(flat, rays, any_hit=any_hit,
                                      tables=tables, hbm=hbm,
                                      tile=tile, k=k, u=u, c=c, want_uv=False)
                    acc = acc + jnp.sum(h.tri)
                return int(acc)

            chk = run()
            if ref is None:
                ref = chk
            ok = "ok" if chk == ref else f"MISMATCH({chk}!={ref})"
            run()
            times = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                run(chain)
                times.append((time.perf_counter() - t0) / chain)
            best = min(times)
            print(f"tile={tile:5d} K={k} U={u} C={c}: {best*1e3:8.3f} ms  "
                  f"{n/best/1e6:8.2f} Mray/s  [{ok}]")
        except Exception as e:  # noqa: BLE001
            print(f"tile={tile:5d} K={k} U={u} C={c}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
