#!/usr/bin/env python
"""Differentiable-path throughput: forward render and full grad step
(forward + backward + psum) in Mray/s on the current backend.

The routing trace runs on the packet kernel (make_routing_tracer); the
differentiable recompute + shading + backward are dense XLA.  Uses a
singleton (or full) device mesh via the same shard_map path as
production (tpu_rt.dist.sharding).

Usage: python tools/bench_diff.py [scene] [width] [height]
Env: BD_REPEATS (3), BD_CHAIN (2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    height = int(sys.argv[3]) if len(sys.argv) > 3 else 768
    repeats = int(os.environ.get("BD_REPEATS", 3))
    chain = int(os.environ.get("BD_CHAIN", 2))

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpu_rt.bvh import load_or_build_bvh
    from tpu_rt.dist import grad_step_sharded, shard_rays
    from tpu_rt.dist.sharding import AXIS, render_diff_sharded, replicate_bvh
    from tpu_rt.raygen import RayGen
    from tpu_rt.scene import Camera, Scene, procedural
    from tpu_rt.trace import device_bvh, make_routing_tracer

    scene = Scene(procedural.scene_by_name(scene_name))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    lo, hi = scene.bbox()
    camera = Camera.for_bbox(lo, hi)
    rays, _, _ = RayGen().primary(camera, width, height)
    n = int(rays.origin.shape[0])

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices.reshape(-1), (AXIS,))
    routing, kind, tables = make_routing_tracer(flat)
    dflat = replicate_bvh(device_bvh(flat), mesh)
    rtables = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tables)
    srays = shard_rays(rays, mesh)

    vtx = jnp.asarray(scene.vtx_pos)
    tvi = jnp.asarray(scene.tri_vtx_index)
    mat = jnp.asarray(scene.tri_material)
    target = jax.device_put(
        jnp.zeros((n, 3), jnp.float32), NamedSharding(mesh, P(AXIS, None)))

    def fwd(reps=1):
        acc = jnp.float32(0)
        for _ in range(reps):
            rgb = render_diff_sharded(mesh, dflat, srays, vtx, tvi, mat,
                                      routing=routing, tables=rtables)
            acc = acc + jnp.sum(rgb[0])
        return float(acc)

    def step(reps=1):
        acc = jnp.float32(0)
        for _ in range(reps):
            loss, gv, gm = grad_step_sharded(mesh, dflat, srays, vtx, tvi,
                                             mat, target, routing=routing,
                                             tables=rtables)
            acc = acc + loss + jnp.sum(gv[0]) + jnp.sum(gm[0])
        return float(acc)

    out = {"scene": scene_name, "rays": n, "routing": kind,
           "n_devices": int(devices.size),
           "backend": jax.default_backend()}
    for name, fn in (("forward", fwd), ("grad_step", step)):
        fn(); fn()
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(chain)
            times.append((time.perf_counter() - t0) / chain)
        best = min(times)
        out[f"{name}_s"] = round(best, 5)
        out[f"{name}_mrays"] = round(n / best / 1e6, 3)
        print(f"{name}: {best*1e3:.2f} ms = {n/best/1e6:.2f} Mray/s",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
