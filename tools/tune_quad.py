#!/usr/bin/env python
"""Per-scene MBVH4 leaf-width autotune -> cache.

The leaf-width knee is scene-shaped (round-5 measurements: dragon and
hairball gain +7%/+16% at 64-wide leaves, sanmiguel loses 24%), so the
static quad_policy rule (16 small / 32 big) can leave measured wins on
the table.  This tool measures the candidate widths on the suite
primary workload and records the winner in a content-keyed tune file
next to the quad cache; quad_policy picks it up automatically in every
later process (renderer, bench, suite).

Run (one TPU process): python tools/tune_quad.py dragon hairball ...
Env: TQ_CANDIDATES (comma list, default per static policy x {1,2}),
     TQ_CHAIN (16), TQ_REPEATS (3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_rt.bvh import load_or_build_bvh, load_or_collapse_quad
from tpu_rt.bench.workload import FRAME_H, FRAME_W, suite_camera
from tpu_rt.raygen import RayGen
from tpu_rt.scene import Scene, procedural
from tpu_rt.trace import _tune_path, quad_policy
from tpu_rt.trace.packet2 import prepare_tables4, trace_packet4

CHAIN = int(os.environ.get("TQ_CHAIN", 16))
REPEATS = int(os.environ.get("TQ_REPEATS", 3))
CACHE = "bvhcache"


def tune(name: str) -> None:
    scene = Scene(procedural.scene_by_name(name))
    flat, _ = load_or_build_bvh(scene, cache_dir=CACHE)
    base = quad_policy(flat)  # static rule (ignores any existing tune)
    cands = os.environ.get("TQ_CANDIDATES")
    cands = ([int(x) for x in cands.split(",")] if cands
             else sorted({base, min(base * 2, 127)}))
    cam = suite_camera(name, scene)
    rays, _, _ = RayGen().primary(cam, FRAME_W, FRAME_H)
    best = (None, float("inf"))
    for lm in cands:
        quad = load_or_collapse_quad(flat, leaf_max=lm, cache_dir=CACHE)
        tab = prepare_tables4(quad)
        if tab is None:
            print(f"{name} leaf{lm}: exceeds packing limits", flush=True)
            continue

        def chain():
            acc = jnp.int32(0)
            for _ in range(CHAIN):
                acc = acc + jnp.sum(trace_packet4(
                    quad, rays, tables=tab, want_uv=False, u=lm).tri)
            return int(acc)

        chain()
        chain()
        t = min((lambda t0: (chain(), time.perf_counter() - t0)[1])(
            time.perf_counter()) for _ in range(REPEATS)) / CHAIN
        print(f"{name} leaf{lm}: {t * 1e3:8.3f} ms/frame "
              f"({307200 / t / 1e6:.2f} Mray/s)", flush=True)
        if t < best[1]:
            best = (lm, t)
    if best[0] is None:
        return
    path = _tune_path(flat, CACHE)
    with open(path, "w") as f:
        json.dump({"scene": name, "leaf_max": best[0],
                   "best_s": round(best[1], 5),
                   "candidates": cands,
                   "device": str(jax.devices()[0])}, f)
    print(f"{name}: tuned leaf_max={best[0]} -> {path}", flush=True)


if __name__ == "__main__":
    for n in (sys.argv[1:] or ["dragon", "hairball", "sanmiguel"]):
        tune(n)
