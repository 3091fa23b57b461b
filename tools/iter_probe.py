#!/usr/bin/env python
"""REAL kernel iteration counts per grid step (count_iters=True) per
scene x ray type — ground truth for the per-row cost model and the
knob-secondary diagnosis (round 4).

For each requested ray type the probe runs the SUITE's schedule
(Morton-sorted batch, suite AO radius) and reports group-iteration
stats + wall clock.  With --subsets (knob-class scenes) it also probes
the AO batch split by primary-hit surface (blob vs ground plane) and a
direction-octant-major sort variant, to localize union pathologies.

Run: python tools/iter_probe.py [scene] [raytype ...] [--subsets]
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
from tpu_rt.trace.packet2 import (TILE, K, U, prepare_tables2,
                                  tables2_residency, _trace2_jit)

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SCENE = args[0] if args else "knob"
RAY_TYPES = args[1:] if len(args) > 1 else ["primary", "ao", "diffuse"]
SUBSETS = "--subsets" in sys.argv


def take(rays, order):
    return Rays(origin=rays.origin[order], dirn=rays.dirn[order],
                tmin=rays.tmin[order], tmax=rays.tmax[order])


def sort_dead_last(rays: Rays) -> jnp.ndarray:
    keys = ray_morton_keys_device(rays.origin, rays.dirn)
    dead = (rays.tmax < 0).astype(jnp.uint32)
    n = rays.origin.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    operands = [dead] + [keys[:, 5 - k] for k in range(6)] + [perm]
    return jax.lax.sort(operands, num_keys=7, is_stable=True)[7]


def sort_dir_octant(rays: Rays) -> jnp.ndarray:
    """Direction-octant-major sort: 3 sign bits of direction as the top
    key, then the standard Morton key — packets share a traversal
    ordering AND rough direction, shrinking divergent-hemisphere
    unions."""
    keys = ray_morton_keys_device(rays.origin, rays.dirn)
    oct_ = ((rays.dirn[:, 0] >= 0).astype(jnp.uint32)
            | ((rays.dirn[:, 1] >= 0).astype(jnp.uint32) << 1)
            | ((rays.dirn[:, 2] >= 0).astype(jnp.uint32) << 2))
    dead = (rays.tmax < 0).astype(jnp.uint32)
    n = rays.origin.shape[0]
    perm = jnp.arange(n, dtype=jnp.int32)
    operands = ([dead, oct_] + [keys[:, 5 - k] for k in range(6)] + [perm])
    return jax.lax.sort(operands, num_keys=8, is_stable=True)[8]


def probe(name, tables, rays, any_hit, hbm, tile=None, k=None):
    tile = tile or TILE
    k = k or K
    s = tile // 128
    hits, iters = _trace2_jit(tables[0], tables[1], rays, any_hit, hbm,
                              False, False, k, s, U, count_iters=True)
    int(jnp.sum(iters))  # fence
    t0 = time.perf_counter()
    h2 = _trace2_jit(tables[0], tables[1], rays, any_hit, hbm,
                     False, False, k, s, U, count_iters=True)
    int(jnp.sum(h2[1]))
    dt = time.perf_counter() - t0
    it = np.asarray(iters)
    n = rays.origin.shape[0]
    live = int(np.sum(np.asarray(rays.tmax) >= 0))
    print(f"{name:16s}: rays {n:7d} live {live:7d} groups {it.size:4d} "
          f"iters total {it.sum():8d} mean {it.mean():7.1f} "
          f"p90 {np.percentile(it, 90):7.0f} max {it.max():7d} "
          f"wall {dt*1e3:7.2f} ms  {dt/max(it.sum(),1)*1e6:5.2f} us/iter "
          f"{it.sum()/max(live,1)*1e3:7.1f} iters/kray",
          flush=True)
    return hits


def pad_to_block(rays: Rays, block: int) -> Rays:
    n = int(rays.origin.shape[0])
    m = -(-n // block) * block
    if m == n:
        return rays
    p = m - n

    def pad(x, fill):
        return jnp.concatenate([x, jnp.full((p,) + x.shape[1:], fill,
                                            x.dtype)])

    return Rays(origin=pad(rays.origin, 0.0), dirn=pad(rays.dirn, 1.0),
                tmin=pad(rays.tmin, 0.0), tmax=pad(rays.tmax, -1.0))


def main():
    from tpu_rt.bench.workload import (FRAME_H, FRAME_W, suite_ao_radius,
                                       suite_camera)
    from tpu_rt.trace.packet2 import choose_node_format

    scene = Scene(procedural.scene_by_name(SCENE))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    camera = suite_camera(SCENE, scene)
    rays, _, _ = RayGen().primary(camera, FRAME_W, FRAME_H)
    hbm, bf16 = choose_node_format(flat)
    tables = prepare_tables2(flat, bf16_nodes=bf16)

    ph = None
    for rt in RAY_TYPES:
        if rt == "primary":
            ph = probe("primary", tables, rays, False, hbm)
            continue
        if ph is None:
            ph = _trace2_jit(tables[0], tables[1], rays, False, hbm,
                             False, False, K, TILE // 128, U)
        max_dist = (suite_ao_radius(SCENE, scene)
                    if rt == "ao" else camera.far)
        any_hit = rt == "ao"
        arays, _, _ = gen_ao_rays(rays.origin, rays.dirn, ph.t, ph.tri,
                                  jnp.asarray(scene.tri_normal), 1,
                                  jnp.float32(max_dist), jnp.uint32(0))
        srt = take(arays, morton_sort_device(arays.origin, arays.dirn))
        probe(f"{rt}-suite", tables, srt, any_hit, hbm)
        octs = take(arays, sort_dir_octant(arays))
        probe(f"{rt}-diroct", tables, octs, any_hit, hbm)

        if SUBSETS:
            # Split by primary-hit surface: ground plane = the last 2
            # triangles of the knob-class blob mesh.
            tri = np.asarray(ph.tri)
            n_tris = int(np.asarray(flat.tri_index).max()) + 1
            on_plane = tri >= n_tris - 2
            live_m = np.asarray(arays.tmax) >= 0
            for label, m in (("plane", on_plane & live_m),
                             ("blob", (~on_plane) & live_m)):
                idx = np.flatnonzero(m)
                if idx.size == 0:
                    continue
                sub = take(arays, jnp.asarray(idx, jnp.int32))
                sub = pad_to_block(sub, TILE * K)
                sub = take(sub, morton_sort_device(sub.origin, sub.dirn))
                probe(f"{rt}-{label}", tables, sub, any_hit, hbm)


if __name__ == "__main__":
    main()
