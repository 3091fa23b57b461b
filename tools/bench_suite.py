#!/usr/bin/env python
"""Run the full BASELINE.md scene x ray-type suite in ONE process and
rewrite BENCH_SUITE.md.

One process = one TPU claim + shared compile cache.  Metric discipline is
bench.py's: kernel-only time, chained device-scalar fences, numerator =
primary hits x samples for secondary types (App.cc:188-204,
Renderer.cc:221-238).

Usage: python tools/bench_suite.py [out.json] [row ...]
  row = scene:ray_type (default: the 17 BASELINE rows)
Env: BS_WIDTH/BS_HEIGHT (1024x768), BS_REPEATS (3), BS_CHAIN (3),
     BS_TRACER (auto), TPU_RT_* kernel knobs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROWS = [
    ("sponza", "primary"), ("knob", "primary"), ("hairball", "primary"),
    ("dragon", "primary"), ("bunny", "primary"),
    ("conference", "diffuse"), ("fairy", "diffuse"), ("sibenik", "diffuse"),
    ("sanmiguel", "diffuse"), ("sponza", "diffuse"), ("knob", "diffuse"),
    ("conference", "ao"), ("fairy", "ao"), ("sibenik", "ao"),
    ("sanmiguel", "ao"), ("sponza", "ao"), ("knob", "ao"),
]

BASELINES = {
    ("sponza", "primary"): 597.51, ("knob", "primary"): 1271.61,
    ("hairball", "primary"): 280.49, ("dragon", "primary"): 575.43,
    ("bunny", "primary"): 825.11,
    ("conference", "diffuse"): 831.28, ("fairy", "diffuse"): 678.77,
    ("sibenik", "diffuse"): 286.97, ("sanmiguel", "diffuse"): 132.28,
    ("sponza", "diffuse"): 325.33, ("knob", "diffuse"): 1466.05,
    ("conference", "ao"): 1478.43, ("fairy", "ao"): 1280.77,
    ("sibenik", "ao"): 1499.86, ("sanmiguel", "ao"): 556.89,
    ("sponza", "ao"): 1022.61, ("knob", "ao"): 2763.01,
}

TRIS = {"knob": "12.6K", "sponza": "121.4K", "bunny": "144.5K",
        "fairy": "174.1K", "conference": "350.9K", "sibenik": "75.3K",
        "dragon": "910.3K", "sanmiguel": "1.50M", "hairball": "6.47M"}


def bench_row(scene_name: str, ray_type: str, width: int, height: int,
              repeats: int, chain: int, samples: int = 1) -> dict:
    import jax
    import jax.numpy as jnp

    from tpu_rt.bvh import load_or_build_bvh
    from tpu_rt.raygen import RayGen
    from tpu_rt.raygen.generators import gen_ao_rays
    from tpu_rt.rays.buffer import morton_sort_device
    from tpu_rt.core.types import Rays
    from tpu_rt.scene import Camera, Scene, procedural
    from tpu_rt.trace import device_bvh
    from tpu_rt.trace.packet2 import (prepare_tables2, tables2_residency,
                                      trace_packet2)
    from tpu_rt.trace.xla_tracer import trace_wavefront

    scene = Scene(procedural.scene_by_name(scene_name))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    lo, hi = scene.bbox()
    # Elevated framing for the object-on-plane scene (the reference
    # knob camera signature looks down at its plane; edge-on the
    # plane is invisible and the hit numerator collapses).
    camera = Camera.for_bbox(lo, hi,
                             elevation_deg=25.0 if scene_name == 'knob'
                             else 0.0)
    rays, _, _ = RayGen().primary(camera, width, height)
    num_rays = width * height
    any_hit = False

    tables = prepare_tables2(flat)
    hbm = tables2_residency(flat)
    tracer = os.environ.get("BS_TRACER", "auto")
    if tracer == "auto":
        if jax.default_backend() != "tpu" or tables is None:
            tracer = "xla"
        else:
            tracer = "pallas" if hbm == "vmem" else f"pallas-{hbm}"
    dbvh = device_bvh(flat) if (ray_type != "primary"
                                or tracer == "xla") else None

    if ray_type != "primary":
        # Primary hits via the fast kernel when available (the pre-trace
        # is not part of the metric).
        if tracer.startswith("pallas"):
            primary_hits = trace_packet2(flat, rays, tables=tables, hbm=hbm,
                                         want_uv=False)
        else:
            primary_hits = trace_wavefront(dbvh, rays)
        num_rays = int(np.sum(np.asarray(primary_hits.tri) >= 0)) * samples
        # AO radius: the reference flag default is 5.0 on scenes tens of
        # units across (its cookbook tunes per scene: 0.3 fairy, 1.5
        # sanmiguel, grtcmdline.txt); the procedural surrogates span ~2
        # units, so scale-equivalent locality is radius ∝ scene extent.
        # BS_AO_RADIUS=abs:<v> forces an absolute value.
        spec = os.environ.get("BS_AO_RADIUS", "rel:0.1")
        kind_r, val = spec.split(":")
        extent = float(np.linalg.norm(hi - lo))
        ao_radius = float(val) * (extent if kind_r == "rel" else 1.0)
        max_dist = ao_radius if ray_type == "ao" else camera.far
        rays, _, _ = gen_ao_rays(
            rays.origin, rays.dirn, primary_hits.t, primary_hits.tri,
            jnp.asarray(scene.tri_normal), samples, jnp.float32(max_dist),
            jnp.uint32(0))
        # Coherence sort (device Morton, NOT timed — the reference metric
        # excludes raygen/sort/reconstruct, App.cc:188-204).
        order = morton_sort_device(rays.origin, rays.dirn)
        rays = Rays(origin=rays.origin[order], dirn=rays.dirn[order],
                    tmin=rays.tmin[order], tmax=rays.tmax[order])
        any_hit = ray_type == "ao"

    def run(reps=1):
        acc = jnp.int32(0)
        for _ in range(reps):
            if tracer.startswith("pallas"):
                h = trace_packet2(flat, rays, any_hit=any_hit, tables=tables,
                                  hbm=hbm, want_uv=False)
            else:
                h = trace_wavefront(dbvh, rays, any_hit=any_hit)
            acc = acc + jnp.sum(h.tri)
        return int(acc)

    run()
    run()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(chain)
        times.append((time.perf_counter() - t0) / chain)
    best = min(times)
    mrays = num_rays / best / 1e6
    base = BASELINES.get((scene_name, ray_type))
    return {
        "scene": scene_name, "ray_type": ray_type,
        "mrays": round(mrays, 2), "baseline": base,
        "vs_baseline": round(mrays / base, 4) if base else None,
        "best_s": round(best, 5), "rays_metric": num_rays,
        "rays_traced": int(rays.origin.shape[0]), "tracer": tracer,
    }


def main() -> None:
    width = int(os.environ.get("BS_WIDTH", 1024))
    height = int(os.environ.get("BS_HEIGHT", 768))
    repeats = int(os.environ.get("BS_REPEATS", 3))
    chain = int(os.environ.get("BS_CHAIN", 32))
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SUITE.json"
    rows = ([tuple(a.split(":")) for a in sys.argv[2:]]
            if len(sys.argv) > 2 else ROWS)

    results = []
    for scene_name, ray_type in rows:
        try:
            r = bench_row(scene_name, ray_type, width, height, repeats, chain)
            print(f"{scene_name:11s} {ray_type:8s} {r['mrays']:8.2f} Mray/s"
                  f"  (x{r['vs_baseline']:.3f} of {r['baseline']})"
                  f"  [{r['tracer']}]", flush=True)
        except Exception as e:  # noqa: BLE001
            r = {"scene": scene_name, "ray_type": ray_type,
                 "error": f"{type(e).__name__}: {e}"}
            print(f"{scene_name:11s} {ray_type:8s} FAILED {r['error'][:100]}",
                  flush=True)
        results.append(r)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)

    ok = [r for r in results if "mrays" in r]
    if ok:
        import jax
        dev = str(jax.devices()[0])
        lines = [
            "# Benchmark suite snapshot", "",
            f"Measured with `tools/bench_suite.py` on {dev}, "
            f"{width}x{height}, kernel-time-only Mray/s (reference metric,"
            " App.cc:188-204; secondary numerator = primary hits x samples,"
            " Renderer.cc:221-238).  Timing chains "
            f"{chain} traces per device-scalar fence: each python dispatch"
            " through the tunneled platform costs ~6-10 ms that is NOT"
            " kernel time (the reference times kernels with cudaEvents,"
            " which excludes launch overhead the same way)."
            "  Scenes are procedural surrogates with"
            " the reference scenes' triangle counts; baselines are the"
            " reference's published GPU numbers (BASELINE.md).  Secondary"
            " rays are device-Morton-sorted before tracing (sort excluded"
            " from the metric, as in the reference); AO radius is scale-"
            "equivalent (0.1 x scene extent — the flag default 5.0 assumes"
            " the real scenes' tens-of-units span; cf. the per-scene radii"
            " in grtcmdline.txt).", "",
            f"Updated: round 3 ({time.strftime('%Y-%m-%d')}).", "",
            "| Scene | Ray type | Mray/s | Baseline | vs_baseline |",
            "|---|---|---|---|---|",
        ]
        for r in ok:
            lines.append(
                f"| {r['scene']} ({TRIS.get(r['scene'], '?')}) "
                f"| {r['ray_type']} | {r['mrays']} | {r['baseline']} "
                f"| {r['vs_baseline']:.3f} |")
        for r in results:
            if "error" in r:
                lines.append(f"| {r['scene']} | {r['ray_type']} | "
                             f"FAILED: {r['error'][:60]} | | |")
        # North-star axes (VERDICT r2 #5): differentiable-path and
        # scaling-efficiency rows, from their artifact files when present
        # (tools/bench_diff.py writes BENCH_DIFF.json lines;
        # BENCH_MODE=scaling bench.py writes BENCH_SCALING.json).
        for path, title in (("BENCH_DIFF.json", "Differentiable path "
                             "(forward render / full grad step, dense-XLA "
                             "diff recompute over packet-kernel routing)"),
                            ("BENCH_SCALING.json", "Scaling efficiency "
                             "(strong mode = fixed global work; weak "
                             "alongside; 0.85 is the BASELINE bar)")):
            if os.path.exists(path):
                lines += ["", f"## {title}", "", "```json"]
                with open(path) as f:
                    lines += [ln.rstrip() for ln in f if ln.strip()]
                lines += ["```"]
        with open("BENCH_SUITE.md", "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote BENCH_SUITE.md + {out_path}")


if __name__ == "__main__":
    main()
