#!/usr/bin/env python
"""Surrogate-difficulty calibration vs the reference workload (round 4).

For every suite row, runs the scalar CPU oracle (trace_flat_scalar with
RayStats) on a stride sample of the row's exact ray batch and records:

- node/tri tests per LIVE ray (the workload-difficulty analog of the
  reference's IST/TRV percentages, README.md:61-81 — those are
  hardware-unit occupancies and not directly computable here, but
  tests/ray is the quantity that drives them),
- hit fraction and live fraction (the secondary-metric numerator),
- the calibrated AO radius actually used (tpu_rt/bench/workload.py).

Output: BENCH_CALIB.json, merged into BENCH_SUITE.md as a calibration
column by tools/bench_suite.py.  CPU-only (forces the cpu backend —
never claims the TPU).

Usage: python tools/calibrate.py [n_sample] [row ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from tools.bench_suite import ROWS, _setup_scene  # noqa: E402
from tpu_rt.bench.workload import (FRAME_H, FRAME_W, scene_extent,  # noqa: E402
                                   suite_ao_radius, suite_camera)
from tpu_rt.raygen import RayGen  # noqa: E402
from tpu_rt.raygen.generators import gen_ao_rays  # noqa: E402
from tpu_rt.trace.cpu_reference import RayStats, trace_flat_scalar  # noqa: E402


def calibrate_row(scene_name: str, ray_type: str, n_sample: int) -> dict:
    scene, flat = _setup_scene(scene_name)
    camera = suite_camera(scene_name, scene)
    rays, _, _ = RayGen().primary(camera, FRAME_W, FRAME_H)
    n = int(rays.origin.shape[0])
    stride = max(1, n // n_sample)
    sl = slice(0, stride * n_sample, stride)
    o = np.asarray(rays.origin)[sl]
    d = np.asarray(rays.dirn)[sl]
    tmin = np.asarray(rays.tmin)[sl]
    tmax = np.asarray(rays.tmax)[sl]

    stats = RayStats()
    tri, t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax, stats=stats)
    ao_radius = None
    any_hit = False
    if ray_type != "primary":
        ao_radius = suite_ao_radius(
            scene_name, scene, os.environ.get("BS_AO_RADIUS", "grt"))
        max_dist = ao_radius if ray_type == "ao" else camera.far
        any_hit = ray_type == "ao"
        arays, _, _ = gen_ao_rays(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t),
            jnp.asarray(tri.astype(np.int32)),
            jnp.asarray(scene.tri_normal), 1, jnp.float32(max_dist),
            jnp.uint32(0))
        o, d = np.asarray(arays.origin), np.asarray(arays.dirn)
        tmin, tmax = np.asarray(arays.tmin), np.asarray(arays.tmax)
        stats = RayStats()
        tri, t, _, _ = trace_flat_scalar(flat, o, d, tmin, tmax,
                                         any_hit=any_hit, stats=stats)
    live_m = tmax >= 0
    live = int(live_m.sum())
    hits = int(np.sum(tri[live_m] >= 0))
    return {
        "scene": scene_name, "ray_type": ray_type,
        "sampled_rays": int(o.shape[0]), "live_frac": round(live / o.shape[0], 4),
        "hit_frac": round(hits / max(live, 1), 4),
        "node_tests_per_ray": round(
            float(stats.per_ray_node_tests[live_m].mean()) if live else 0.0, 1),
        "tri_tests_per_ray": round(
            float(stats.per_ray_tri_tests[live_m].mean()) if live else 0.0, 1),
        "ao_radius": round(ao_radius, 4) if ao_radius else None,
        "extent": round(scene_extent(scene), 3),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if ":" not in a]
    n_sample = int(args[0]) if args else 2048
    rows = ([tuple(a.split(":")) for a in sys.argv[1:] if ":" in a] or ROWS)
    out = []
    for scene_name, ray_type in rows:
        try:
            r = calibrate_row(scene_name, ray_type, n_sample)
            print(f"{scene_name:11s} {ray_type:8s} "
                  f"tests/ray {r['node_tests_per_ray']:7.1f}n "
                  f"{r['tri_tests_per_ray']:6.1f}t  hit {r['hit_frac']:.2f} "
                  f"live {r['live_frac']:.2f} ao_r={r['ao_radius']}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            r = {"scene": scene_name, "ray_type": ray_type,
                 "error": f"{type(e).__name__}: {e}"}
            print(f"{scene_name} {ray_type} FAILED: {r['error'][:100]}",
                  flush=True)
        out.append(r)
        with open("BENCH_CALIB.json", "w") as f:
            json.dump(out, f, indent=1)
    print("wrote BENCH_CALIB.json")


if __name__ == "__main__":
    main()
