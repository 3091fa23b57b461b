#!/usr/bin/env python
"""Measure AO-batch kernel time under different ray schedules (round 3).

Variants per scene:
  natural   — Morton sort of all rays incl. degenerates (today's path)
  deadlast  — sort with the degenerate flag as the top key; full trace
  compact   — deadlast + trace only the live prefix (padded to tile);
              dead results are misses by construction
  unsorted  — no sort at all (control)

Prints kernel-only chained times + hit-sum parity per variant.
Run: python tools/ao_probe.py [scene] [ray_type]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_rt.bvh import load_or_build_bvh
from tpu_rt.core.types import Rays
from tpu_rt.raygen import RayGen
from tpu_rt.raygen.generators import gen_ao_rays
from tpu_rt.rays.buffer import morton_sort_device, ray_morton_keys_device
from tpu_rt.scene import Camera, Scene, procedural
from tpu_rt.trace.packet2 import prepare_tables2, tables2_residency, trace_packet2

SCENE = sys.argv[1] if len(sys.argv) > 1 else "knob"
RAY_TYPE = sys.argv[2] if len(sys.argv) > 2 else "ao"
TILE = int(os.environ.get("TPU_RT_TILE2", 2048))


def sort_dead_last(rays: Rays) -> jnp.ndarray:
    keys = ray_morton_keys_device(rays.origin, rays.dirn)
    dead = (rays.tmax < 0).astype(jnp.uint32)
    n = rays.origin.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    operands = [dead] + [keys[:, 5 - k] for k in range(6)] + [perm]
    return jax.lax.sort(operands, num_keys=7, is_stable=True)[7]


def take(rays, order):
    return Rays(origin=rays.origin[order], dirn=rays.dirn[order],
                tmin=rays.tmin[order], tmax=rays.tmax[order])


def main():
    scene = Scene(procedural.scene_by_name(SCENE))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    lo, hi = scene.bbox()
    camera = Camera.for_bbox(lo, hi)
    rays, _, _ = RayGen().primary(camera, 1024, 768)
    tables = prepare_tables2(flat)
    hbm = tables2_residency(flat)

    ph = trace_packet2(flat, rays, tables=tables, hbm=hbm, want_uv=False)
    extent = float(np.linalg.norm(hi - lo))
    max_dist = 0.1 * extent if RAY_TYPE == "ao" else camera.far
    any_hit = RAY_TYPE == "ao"
    arays, _, _ = gen_ao_rays(rays.origin, rays.dirn, ph.t, ph.tri,
                              jnp.asarray(scene.tri_normal), 1,
                              jnp.float32(max_dist), jnp.uint32(0))
    live = int(np.sum(np.asarray(arays.tmax) >= 0))
    n = int(arays.origin.shape[0])
    print(f"{SCENE} {RAY_TYPE}: {n} rays, {live} live "
          f"({live/n*100:.1f}%)", flush=True)

    variants = {}
    variants["unsorted"] = (arays, {})
    variants["natural"] = (take(arays, morton_sort_device(arays.origin,
                                                          arays.dirn)), {})
    dl = take(arays, sort_dead_last(arays))
    m = min(n, -(-live // TILE) * TILE)
    compact = jax.tree_util.tree_map(lambda x: x[:m], dl)
    variants["compact"] = (compact, {})
    # Uniform live spread: stride live rays round-robin over all packets
    # so every packet carries the same live fraction (max ~ mean).
    order = np.argsort(np.arange(n) % (n // TILE), kind="stable")
    variants["spread"] = (take(dl, jnp.asarray(order, jnp.int32)), {})
    for t_ in (512, 1024):
        for k_ in (4, 8):
            variants[f"uns-t{t_}k{k_}"] = (arays, {"tile": t_, "k": k_})
    variants["uns-c2"] = (arays, {"c": 2})
    variants["cmp-t512k8"] = (compact, {"tile": 512, "k": 8})
    variants["cmp-c2"] = (compact, {"c": 2})

    for name, (rr, kw) in variants.items():
        def run(reps=1):
            acc = jnp.int32(0)
            for _ in range(reps):
                h = trace_packet2(flat, rr, any_hit=any_hit, tables=tables,
                                  hbm=hbm, want_uv=False, **kw)
                acc = acc + jnp.sum(jnp.where(h.tri >= 0, 1, 0))

            return int(acc)

        hits = run()
        run()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            run(3)
            best = min(best, (time.perf_counter() - t0) / 3)
        print(f"{name:11s}: {best*1e3:7.2f} ms  hits {hits}  "
              f"metric {live/best/1e6:6.2f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
