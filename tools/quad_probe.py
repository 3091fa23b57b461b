#!/usr/bin/env python
"""Measure the 4-wide (MBVH4) packet kernel against the binary packet2
kernel on the calibrated suite workload — the VERDICT r4 #1 accept/kill
experiment.

Per scene x ray type: wall-clock (chained, kernel-only), count_iters
census for both kernels, quad collapse statistics, and an oracle
verification of a ray subset.  Env: QP_CHAIN (32), QP_REPEATS (3),
QP_U4 sweep list (e.g. "3,4,6,8"), QP_VERIFY (4096 rays).

Run: python tools/quad_probe.py [scene ...] [--types primary,ao,diffuse]
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
from tpu_rt.bvh.collapse import collapse4, MAX_LEAF4
from tpu_rt.core.types import Rays
from tpu_rt.raygen import RayGen
from tpu_rt.raygen.generators import gen_ao_rays
from tpu_rt.rays.buffer import morton_sort_device
from tpu_rt.scene import Scene, procedural
from tpu_rt.trace import trace_flat_scalar
from tpu_rt.trace.packet2 import (choose_node_format, prepare_tables2,
                                  prepare_tables4, trace_packet2,
                                  trace_packet4, VMEM_TABLE_BUDGET)

CHAIN = int(os.environ.get("QP_CHAIN", 32))
REPEATS = int(os.environ.get("QP_REPEATS", 3))
VERIFY = int(os.environ.get("QP_VERIFY", 4096))
U4_SWEEP = [int(x) for x in os.environ.get("QP_U4", "4").split(",")]
K4 = int(os.environ.get("QP_K", 0)) or None    # packet4 interleave
TILE4 = int(os.environ.get("QP_TILE", 0)) or None
LEAF_MAX = int(os.environ.get("QP_LEAF", 0)) or MAX_LEAF4


def take(rays, order):
    return Rays(origin=rays.origin[order], dirn=rays.dirn[order],
                tmin=rays.tmin[order], tmax=rays.tmax[order])


def timed(fn):
    fn()  # warm
    fn()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best


def bench_kernel(label, trace_fn, rays, num_metric, flat, any_hit):
    def chain():
        acc = jnp.int32(0)
        for _ in range(CHAIN):
            acc = acc + jnp.sum(trace_fn(rays).tri)
        return int(acc)

    best = timed(chain)
    h, iters = trace_fn(rays, count_iters=True)
    it = np.asarray(iters)
    mrays = num_metric / best / 1e6
    print(f"  {label:28s}: {mrays:8.2f} Mray/s  best {best*1e3:8.3f} ms  "
          f"iters {it.sum():8d} groups {it.size:4d}", flush=True)
    # Oracle verification of a deterministic subset.
    n = rays.origin.shape[0]
    idx = np.linspace(0, n - 1, min(VERIFY, n)).astype(np.int64)
    o = np.asarray(rays.origin)[idx]
    d = np.asarray(rays.dirn)[idx]
    tn = np.asarray(rays.tmin)[idx]
    tx = np.asarray(rays.tmax)[idx]
    s_id, s_t, s_u, s_v = trace_flat_scalar(flat, o, d, tn, tx,
                                            any_hit=any_hit)
    got = np.asarray(h.tri)[idx]
    if any_hit:
        bad = int(np.sum((got >= 0) != (s_id >= 0)))
    else:
        exact = got == s_id
        tie = ~exact & np.isclose(np.asarray(h.t)[idx], s_t,
                                  rtol=2e-4, atol=1e-5)
        margin = np.minimum(np.minimum(s_u, s_v), 1.0 - s_u - s_v)
        graze = ~exact & ~tie & (s_id >= 0) & (margin < 1e-3)
        bad = int(np.sum(~exact & ~tie & ~graze))
    if bad:
        print(f"    *** VERIFY FAILED: {bad}/{idx.size} rays wrong ***",
              flush=True)
    return mrays, int(it.sum()), bad


def main():
    from tpu_rt.bench.workload import (FRAME_H, FRAME_W, suite_ao_radius,
                                       suite_camera)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    scenes = args or ["bunny", "sponza", "knob", "dragon"]
    types = ["primary"]
    for a in sys.argv[1:]:
        if a.startswith("--types"):
            types = a.split("=", 1)[1].split(",")

    for name in scenes:
        scene = Scene(procedural.scene_by_name(name))
        flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
        t0 = time.time()
        quad = collapse4(flat, leaf_max=LEAF_MAX)
        tcol = time.time() - t0
        t0 = time.time()
        tab4 = prepare_tables4(quad)
        tpack = time.time() - t0
        res2, bf16 = choose_node_format(flat)
        tab2 = prepare_tables2(flat, bf16_nodes=bf16)
        n4b = int(tab4[0].size) * 4
        w4b = int(tab4[1].size) * 4
        res4 = ("vmem" if n4b + w4b <= VMEM_TABLE_BUDGET
                else "mixed" if n4b <= VMEM_TABLE_BUDGET else "hbm")
        print(f"\n{name}: binary {flat.nodes.shape[0]} nodes/"
              f"{flat.tri_woop.shape[0]} refs [{res2}"
              f"{'-bf16' if bf16 else ''}] -> quad {quad.num_nodes} nodes/"
              f"{quad.num_refs} refs [{res4}] "
              f"(collapse {tcol:.1f}s pack {tpack:.1f}s; "
              f"nodes {n4b/1e6:.1f}MB woop {w4b/1e6:.1f}MB)", flush=True)

        camera = suite_camera(name, scene)
        prim, _, _ = RayGen().primary(camera, FRAME_W, FRAME_H)
        ph = None
        for rt in types:
            any_hit = rt == "ao"
            if rt == "primary":
                rays, num = prim, prim.origin.shape[0]
            else:
                if ph is None:
                    ph = trace_packet2(flat, prim, tables=tab2, hbm=res2,
                                       want_uv=False)
                live = int(np.sum(np.asarray(ph.tri) >= 0))
                max_dist = (suite_ao_radius(name, scene) if rt == "ao"
                            else camera.far)
                rays, _, _ = gen_ao_rays(
                    prim.origin, prim.dirn, ph.t, ph.tri,
                    jnp.asarray(scene.tri_normal), 1,
                    jnp.float32(max_dist), jnp.uint32(0))
                rays = take(rays, morton_sort_device(rays.origin, rays.dirn))
                num = live
            print(f" {name} {rt} (metric rays {num}):", flush=True)

            def t2(r, count_iters=False):
                return trace_packet2(flat, r, any_hit=any_hit, tables=tab2,
                                     hbm=res2, want_uv=False,
                                     count_iters=count_iters)

            m2, i2, _ = bench_kernel(f"packet2 [{res2}"
                                     + ("-bf16" if bf16 else "") + "]",
                                     t2, rays, num, flat, any_hit)
            for u4 in U4_SWEEP:
                def t4(r, count_iters=False, u4=u4):
                    return trace_packet4(quad, r, any_hit=any_hit,
                                         tables=tab4, hbm=res4,
                                         want_uv=False, u=u4, k=K4,
                                         tile=TILE4,
                                         count_iters=count_iters)

                m4, i4, _ = bench_kernel(
                    f"packet4 [{res4}] U={u4}"
                    + (f" K={K4}" if K4 else "")
                    + (f" t={TILE4}" if TILE4 else ""),
                    t4, rays, num, flat, any_hit)
                print(f"    -> packet4/packet2 = {m4/m2:.3f}x "
                      f"(iters {i4}/{i2} = {i4/max(i2,1):.3f}x)", flush=True)


if __name__ == "__main__":
    main()
