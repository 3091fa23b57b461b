#!/usr/bin/env python
"""Measure REAL kernel iteration counts per grid step (count_iters=True)
for primary vs AO schedules — ground truth for the AO cost model.

Run: python tools/iter_probe.py [scene]
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
from tpu_rt.rays.buffer import morton_sort_device
from tpu_rt.scene import Camera, Scene, procedural
from tpu_rt.trace.packet2 import (TILE, K, U, prepare_tables2,
                                  tables2_residency, _trace2_jit)
from tools.ao_probe import sort_dead_last, take

SCENE = sys.argv[1] if len(sys.argv) > 1 else "knob"


def probe(name, tables, rays, any_hit, hbm):
    hits, iters = _trace2_jit(tables[0], tables[1], rays, any_hit, hbm,
                              False, False, K, TILE // 128, U,
                              count_iters=True)
    s = jnp.sum(iters)  # fence
    int(s)
    t0 = time.perf_counter()
    h2 = _trace2_jit(tables[0], tables[1], rays, any_hit, hbm,
                     False, False, K, TILE // 128, U, count_iters=True)
    int(jnp.sum(h2[1]))
    dt = time.perf_counter() - t0
    it = np.asarray(iters)
    print(f"{name:10s}: rays {rays.origin.shape[0]:7d} groups {it.size:4d} "
          f"iters total {it.sum():7d} mean {it.mean():7.1f} "
          f"p90 {np.percentile(it, 90):7.0f} max {it.max():7d} "
          f"wall {dt*1e3:7.2f} ms -> {dt/max(it.sum(),1)*1e6:6.2f} us/iter",
          flush=True)
    return hits


def main():
    scene = Scene(procedural.scene_by_name(SCENE))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    lo, hi = scene.bbox()
    camera = Camera.for_bbox(lo, hi)
    rays, _, _ = RayGen().primary(camera, 1024, 768)
    tables = prepare_tables2(flat)
    hbm = tables2_residency(flat)

    ph = probe("primary", tables, rays, False, hbm)
    if os.environ.get("IP_PRIMARY_ONLY"):
        return

    extent = float(np.linalg.norm(hi - lo))
    arays, _, _ = gen_ao_rays(rays.origin, rays.dirn, ph.t, ph.tri,
                              jnp.asarray(scene.tri_normal), 1,
                              jnp.float32(0.1 * extent), jnp.uint32(0))
    live = int(np.sum(np.asarray(arays.tmax) >= 0))
    print(f"ao: {live} live of {arays.origin.shape[0]}")
    nat = take(arays, morton_sort_device(arays.origin, arays.dirn))
    probe("ao-natural", tables, nat, True, hbm)
    dl = take(arays, sort_dead_last(arays))
    m = min(arays.origin.shape[0], -(-live // TILE) * TILE)
    compact = jax.tree_util.tree_map(lambda x: x[:m], dl)
    probe("ao-compact", tables, compact, True, hbm)


if __name__ == "__main__":
    main()
