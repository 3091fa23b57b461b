#!/usr/bin/env python
"""Run the full BASELINE.md scene x ray-type suite in ONE process and
rewrite BENCH_SUITE.md.

One process = one TPU claim + shared compile cache.  Metric discipline is
bench.py's: kernel-only time, chained device-scalar fences, numerator =
primary hits x samples for secondary types (App.cc:188-204,
Renderer.cc:221-238).

Round-4 workload calibration (tpu_rt/bench/workload.py): the frame is
the reference's committed 640x480 (App.cc:53), cameras use the decoded
per-scene fov with object-framed knob, and AO radii are the
grtcmdline.txt absolute values translated to surrogate scale.  Each row
also records a count_iters census (group count + kernel iterations) and
the suite fits the per-residency cost model
    predicted_s = g * groups + c * iters
so every row carries a vs_model column (VERDICT r3 #8).

Usage: python tools/bench_suite.py [out.json] [row ...]
       python tools/bench_suite.py --verify-full
  row = scene:ray_type (default: the 17 BASELINE rows)
Env: BS_WIDTH/BS_HEIGHT (640x480), BS_REPEATS (3), BS_CHAIN (32),
     BS_TRACER (auto), BS_AO_RADIUS (grt), TPU_RT_* kernel knobs.

--verify-full: full-frame compiled-device parity artifact
(BENCH_FULLFRAME.json): for one scene per residency mode, trace the
entire primary frame on the device, cross-check hit ids against the
independent XLA wavefront tracer on the same device, and adjudicate
every disputed ray with the scalar CPU oracle (exact / fp-tie /
edge-graze / kernel-wrong).  The reference's analog is its golden-dump
discipline, CudaTracer.cc:519-637.
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
    # Non-baseline rows (the reference publishes no dragon secondary
    # numbers) kept for cost-model support: every residency's fit should
    # rest on >=2 rows (VERDICT r4 #6).
    ("dragon", "ao"), ("dragon", "diffuse"),
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

# Full-frame verification targets: one scene per active tracer/residency.
# "auto" exercises the round-5 default (packet4); "packet" the binary
# packet2 paths; "hbm-f32" the forced fully-streamed packet2.
FULLFRAME_TARGETS = [
    ("bunny", "auto"),          # packet4 vmem
    ("conference", "auto"),     # packet4 (auto residency)
    ("dragon", "auto"),         # packet4 mixed, 32-wide leaves
    ("bunny", "packet"),        # packet2 vmem f32
    ("conference", "packet"),   # packet2 mixed f32
    ("dragon", "packet"),       # packet2 mixed bf16
    ("dragon", "hbm-f32"),      # packet2 forced fully-streamed f32
]


def _setup_scene(scene_name: str):
    from tpu_rt.bvh import load_or_build_bvh
    from tpu_rt.scene import Scene, procedural

    scene = Scene(procedural.scene_by_name(scene_name))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    return scene, flat


def bench_row(scene_name: str, ray_type: str, width: int, height: int,
              repeats: int, chain: int, samples: int = 1) -> dict:
    import jax
    import jax.numpy as jnp

    from tpu_rt.bench.workload import suite_ao_radius, suite_camera
    from tpu_rt.raygen import RayGen
    from tpu_rt.raygen.generators import gen_ao_rays
    from tpu_rt.rays.buffer import morton_sort_device
    from tpu_rt.core.types import Rays
    from tpu_rt.trace import device_bvh, make_routing_tracer
    from tpu_rt.trace.xla_tracer import trace_wavefront

    scene, flat = _setup_scene(scene_name)
    camera = suite_camera(scene_name, scene)
    rays, _, _ = RayGen().primary(camera, width, height)
    num_rays = width * height
    any_hit = False

    # BS_TRACER: auto (packet4 -> packet2 -> xla), pallas, packet4,
    # packet (binary packet2), xla.
    routing_fn, tracer, tables = make_routing_tracer(
        flat, prefer=os.environ.get("BS_TRACER", "auto"),
        cache_dir="bvhcache")
    leaf_max = None
    if tracer.startswith("packet4"):
        from tpu_rt.trace import quad_policy

        leaf_max = quad_policy(flat, cache_dir="bvhcache")
    if tracer == "xla":
        routing_fn = None
    dbvh = device_bvh(flat) if (ray_type != "primary"
                                or tracer == "xla") else None

    ao_radius = None
    live = num_rays
    if ray_type != "primary":
        # Primary hits via the fast kernel when available (the pre-trace
        # is not part of the metric).
        if routing_fn is not None:
            primary_hits = routing_fn(tables, rays)
        else:
            primary_hits = trace_wavefront(dbvh, rays)
        live = int(np.sum(np.asarray(primary_hits.tri) >= 0)) * samples
        num_rays = live
        # AO radius: reference-calibrated per scene (workload.py) —
        # grtcmdline.txt absolute radii at the surrogate's scale.
        ao_radius = suite_ao_radius(
            scene_name, scene, os.environ.get("BS_AO_RADIUS", "grt"))
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
            if routing_fn is not None:
                h = routing_fn(tables, rays, any_hit=any_hit)
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
    row = {
        "scene": scene_name, "ray_type": ray_type,
        "mrays": round(mrays, 2), "baseline": base,
        "vs_baseline": round(mrays / base, 4) if base else None,
        "best_s": round(best, 5), "rays_metric": num_rays,
        "rays_traced": int(rays.origin.shape[0]), "tracer": tracer,
        "leaf_max": leaf_max,
        "width": width, "height": height,
        "ao_radius": round(ao_radius, 4) if ao_radius else None,
    }
    if routing_fn is not None:
        # Iteration census for the roofline model (one extra untimed
        # trace with the count_iters kernel output).
        _, iters = routing_fn(tables, rays, any_hit=any_hit,
                              count_iters=True)
        it = np.asarray(iters)
        row["iters"] = int(it.sum())
        row["groups"] = int(it.size)
    return row


def fit_cost_model(rows: list[dict]) -> dict:
    """Per-residency linear model best_s ~= g * groups + c * iters,
    least-squares over the suite rows (the VERDICT r3 #8 roofline
    test: where a row deviates, that row is the next target; where the
    model holds, the gap is structural)."""
    out = {}
    by_res = {}
    for r in rows:
        if "iters" in r and r.get("best_s"):
            # Fit groups split by leaf width where recorded: one (g, c)
            # pair cannot span 32- and 64-wide drain configurations
            # (round-5: dragon's tuned leaf-64 rows sat at 0.68/1.62 of
            # a mixed-width packet4-mixed fit).
            key = r["tracer"] + (f"-leaf{r['leaf_max']}"
                                 if r.get("leaf_max") else "")
            by_res.setdefault(key, []).append(r)
    fits = {}
    shared_g = []
    for res, rs in by_res.items():
        A = np.array([[r["groups"], r["iters"]] for r in rs], np.float64)
        b = np.array([r["best_s"] for r in rs], np.float64)
        if len(rs) >= 2:
            coef, *_ = np.linalg.lstsq(A, b, rcond=None)
            g, c = float(max(coef[0], 0.0)), float(max(coef[1], 0.0))
            shared_g.append(g)
            fits[res] = (g, c, len(rs), False)
        else:
            fits[res] = (None, None, 1, True)
    for res, (g, c, n, single) in fits.items():
        rs = by_res[res]
        if single:
            # A 1-row residency cannot support a 2-parameter fit
            # (VERDICT r4 #6): share per_group from the multi-row
            # residencies and solve per_iter from the single row.
            g = float(np.mean(shared_g)) if shared_g else 0.0
            r0 = rs[0]
            c = max((r0["best_s"] - g * r0["groups"]), 0.0) / max(
                r0["iters"], 1)
        out[res] = {"per_group_us": round(g * 1e6, 2),
                    "per_iter_us": round(c * 1e6, 3), "n_rows": n,
                    **({"per_group_shared": True} if single else {})}
        for r in rs:
            pred = g * r["groups"] + c * r["iters"]
            r["model_s"] = round(pred, 5)
            r["vs_model"] = round(r["best_s"] / pred, 3) if pred > 0 else None
    return out


def write_suite_md(results, width, height, chain, model=None, dev=None):
    ok = [r for r in results if "mrays" in r]
    if not ok:
        return
    if dev is None:
        import jax
        dev = str(jax.devices()[0])
    calib = {}
    if os.path.exists("BENCH_CALIB.json"):
        with open("BENCH_CALIB.json") as f:
            calib = {(c["scene"], c["ray_type"]): c for c in json.load(f)}
    lines = [
        "# Benchmark suite snapshot", "",
        f"Measured with `tools/bench_suite.py` on {dev}, "
        f"{width}x{height} (the reference's committed frame, App.cc:53), "
        "kernel-time-only Mray/s (reference metric, App.cc:188-204; "
        "secondary numerator = primary hits x samples, "
        f"Renderer.cc:221-238).  Timing chains {chain} traces per "
        "device-scalar fence (python dispatch through the tunneled "
        "platform costs ~6-10 ms that is NOT kernel time; the reference "
        "times kernels with cudaEvents, which excludes launch overhead "
        "the same way).  Scenes are procedural surrogates with the "
        "reference scenes' triangle counts; baselines are the "
        "reference's published GPU numbers (BASELINE.md).", "",
        "ROUND-5 KERNEL CHANGE: the default tracer is the 4-wide MBVH "
        "packet kernel (packet4, bvh/collapse.py + packet2.py w4 path): "
        "SAH-collapsed 4-wide nodes with 16-wide merged leaves (32 for "
        "scenes whose binary node table exceeds the VMEM budget) and "
        "U=16 triangle drain.  Measured +8..69% over the binary packet2 "
        "kernel across the suite (tools/quad_probe.py); iteration "
        "censuses drop 2.8-5.7x.  vs_model groups are therefore "
        "per-packet4-residency this round.", "",
        "ROUND-4 WORKLOAD CHANGE (re-baselining note): the frame moved "
        "1024x768 -> 640x480 to match the reference exactly, cameras use "
        "the per-scene decoded fov (object scenes 46.8 deg; knob frames "
        "the object, not the ground plane), AO radii are the "
        "grtcmdline.txt absolute values translated to surrogate scale "
        "(tpu_rt/bench/workload.py), and the hairball surrogate was "
        "regenerated with locally-wandering strands so it builds at the "
        "reference sbvh-alpha=1e-5 (62.9% split duplication) instead of "
        "requiring spatial splits to be disabled.  Round-over-round "
        "per-row deltas vs BENCH_r03 therefore mix workload and kernel "
        "changes; knob rows in particular changed scene framing in "
        "rounds 3 AND 4.", "",
        "`calib` = CPU-oracle difficulty calibration "
        "(tools/calibrate.py): mean node+tri tests per live ray / hit "
        "fraction.  `vs_model` = measured / (fitted per-residency "
        "g*groups + c*iters) — rows far from 1.0 are scheduling "
        "anomalies, rows near 1.0 are iteration-bound (structural).", "",
        "| Scene | Ray type | Mray/s | Baseline | vs_baseline | "
        "calib tests/ray | hit% | iters | vs_model |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in ok:
        cal = calib.get((r["scene"], r["ray_type"]), {})
        tests = (f"{cal['node_tests_per_ray'] + cal['tri_tests_per_ray']:.0f}"
                 if cal else "")
        hitp = f"{cal['hit_frac'] * 100:.0f}%" if cal else ""
        vsb = (f"{r['vs_baseline']:.3f}"
               if r.get("vs_baseline") is not None else "n/a")
        lines.append(
            f"| {r['scene']} ({TRIS.get(r['scene'], '?')}) "
            f"| {r['ray_type']} | {r['mrays']} | {r['baseline'] or 'n/a'} "
            f"| {vsb} | {tests} | {hitp} "
            f"| {r.get('iters', '')} | {r.get('vs_model', '')} |")
    for r in results:
        if "error" in r:
            lines.append(f"| {r['scene']} | {r['ray_type']} | "
                         f"FAILED: {r['error'][:60]} | | | | | | |")
    if model:
        lines += ["", "## Fitted cost model (per residency)", "",
                  "```json", json.dumps(model, indent=1), "```"]
    for path, title in (
            ("BENCH_HIRES.json", "Resolution scaling (non-baseline "
             "1280x960 rows: tessellation-bound scenes gain Mray/s with "
             "resolution — the packet union sweeps the same visible "
             "geometry per frame, BASELINE.md:72-74)"),
            ("BENCH_FULLFRAME.json", "Full-frame compiled-device parity "
             "(exact hit-id compare vs the CPU wavefront per residency)"),
            ("BENCH_DIFF.json", "Differentiable path (forward render / "
             "full grad step, dense-XLA diff recompute over packet-kernel "
             "routing)"),
            ("BENCH_SCALING.json", "Scaling efficiency (strong mode = "
             "fixed global work; weak alongside; 0.85 is the BASELINE "
             "bar)")):
        if os.path.exists(path):
            lines += ["", f"## {title}", "", "```json"]
            with open(path) as f:
                lines += [ln.rstrip() for ln in f if ln.strip()]
            lines += ["```"]
    lines += ["", f"Updated: round 5 ({time.strftime('%Y-%m-%d')})."]
    with open("BENCH_SUITE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


def verify_full() -> None:
    """Full-frame device parity per residency -> BENCH_FULLFRAME.json."""
    import jax
    import jax.numpy as jnp

    from tpu_rt.bench.workload import FRAME_H, FRAME_W, suite_camera
    from tpu_rt.raygen import RayGen
    from tpu_rt.trace.packet2 import (choose_node_format, prepare_tables2,
                                      trace_packet2)

    results = {}
    from tpu_rt.trace import device_bvh, make_routing_tracer, trace_flat_scalar
    from tpu_rt.trace.xla_tracer import trace_wavefront

    for scene_name, mode in FULLFRAME_TARGETS:
        scene, flat = _setup_scene(scene_name)
        cam = suite_camera(scene_name, scene)
        rays, _, _ = RayGen().primary(cam, FRAME_W, FRAME_H)
        if mode == "hbm-f32":
            residency, bf16 = "hbm", False
            tables = prepare_tables2(flat, bf16_nodes=bf16)
            h = trace_packet2(flat, rays, tables=tables, hbm=residency,
                              want_uv=False)
            key = "hbm"
        else:
            fn, kind, tables = make_routing_tracer(flat, prefer=mode,
                                                   cache_dir="bvhcache")
            h = fn(tables, rays)
            # packet2 keys keep the round-4 residency names
            # (vmem/mixed/mixed-bf16); packet4 entries use their kind.
            key = (("vmem" if kind == "packet"
                    else kind.replace("packet-", ""))
                   if mode == "packet" else kind)
        key = f"{key}:{scene_name}" if key in results else key
        tri = np.asarray(h.tri)
        t = np.asarray(h.t)
        # Stage 1: full-frame cross-check against an INDEPENDENT device
        # tracer (the XLA wavefront, per-lane stacks, different compile
        # pipeline).  Agreement there is overwhelming (>=99.99%); the
        # small disagreement set D goes to stage 2.
        hw = trace_wavefront(device_bvh(flat), rays)
        wtri = np.asarray(hw.tri)
        d_idx = np.flatnonzero(wtri != tri)
        # Stage 2: adjudicate D with the scalar CPU ORACLE, ray by ray.
        # A disputed ray is OK if the packet kernel matches the oracle
        # exactly, or sits on an fp tie (equal-t different-triangle, or
        # a hit/miss flip where both t are within fp noise of tmax/each
        # other) — the reference's own CPU/GPU paths disagree on such
        # rays too (Util.cc:106 vs kepler_dynamic_fetch.cu:336).
        o = np.asarray(rays.origin)[d_idx]
        dn = np.asarray(rays.dirn)[d_idx]
        tn = np.asarray(rays.tmin)[d_idx]
        tx = np.asarray(rays.tmax)[d_idx]
        s_id, s_t, s_u, s_v = trace_flat_scalar(flat, o, dn, tn, tx)
        pk_tri, pk_t = tri[d_idx], t[d_idx]
        exact = pk_tri == s_id
        tie = ~exact & np.isclose(pk_t, s_t, rtol=2e-4, atol=1e-5)
        # Edge-grazing adjudication: a hit whose barycentric margin is
        # within fp noise of an edge (u, v, or 1-u-v ~ 0) can flip to a
        # miss under a different (but equally valid) f32 contraction —
        # Mosaic fuses multiply-adds the oracle's numpy does not.  The
        # reference's own CPU and GPU intersectors diverge the same way
        # (Util.cc:106 vs kepler_dynamic_fetch.cu:336-396).
        margin = np.minimum(np.minimum(s_u, s_v), 1.0 - s_u - s_v)
        graze = ~exact & ~tie & (s_id >= 0) & (margin < 1e-3)
        bad = int(np.sum(~exact & ~tie & ~graze))
        results[key] = {
            "scene": scene_name, "rays": int(tri.size),
            "cross_tracer_disputes": int(d_idx.size),
            "oracle_adjudicated_exact": int(exact.sum()),
            "oracle_adjudicated_fp_tie": int(tie.sum()),
            "oracle_adjudicated_edge_graze": int(graze.sum()),
            "kernel_wrong": bad, "verified": bad == 0,
            "device": str(jax.devices()[0]),
        }
        print(f"fullframe {scene_name:10s} [{key}]: {tri.size} rays, "
              f"{d_idx.size} cross-tracer disputes -> oracle says "
              f"{int(exact.sum())} exact + {int(tie.sum())} fp-tie + "
              f"{int(graze.sum())} edge-graze + {bad} KERNEL-WRONG",
              flush=True)
    with open("BENCH_FULLFRAME.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote BENCH_FULLFRAME.json")


def verify_ao_frame(scene_name: str = "knob", samples: int = 8) -> None:
    """Device-verified SECONDARY frame (VERDICT r4 #4): run a full AO
    frame through the real Renderer at samples=8 with max_batch forced
    small enough to produce >= 3 batches — exercising gen_ao_rays, the
    batching cursor, the device Morton sort, per-ray anyhit vote
    retirement, and id/slot reassembly on device — then cross-check
    every batch's anyhit classification against the independent XLA
    wavefront tracer and adjudicate disputes with the scalar CPU oracle.
    Adds an "ao" entry to BENCH_FULLFRAME.json.  (Reference analog:
    RayBuffer.cc:89-223 dumps AO batches for exactly this purpose.)"""
    import jax
    import jax.numpy as jnp

    from tpu_rt.bench.workload import (FRAME_H, FRAME_W, suite_ao_radius,
                                       suite_camera)
    from tpu_rt.renderer import Renderer, RendererParams
    from tpu_rt.trace import device_bvh, trace_flat_scalar
    from tpu_rt.trace.xla_tracer import trace_wavefront

    scene, flat = _setup_scene(scene_name)
    cam = suite_camera(scene_name, scene)
    radius = suite_ao_radius(scene_name, scene)
    # max_batch in OUTPUT rays; inputs per batch = max_batch // samples.
    # 1<<19 at samples=8 = 64K inputs/batch -> >=3 batches for any scene
    # with >=128K primary hits (knob's object framing hits ~77% of 307K).
    r = Renderer(FRAME_W, FRAME_H, RendererParams(
        ray_type="ao", num_samples=samples, ao_radius=float(radius),
        sort_secondary=True, max_batch=1 << 19, cache_dir="bvhcache"))
    r.set_scene(scene)
    stats = r.render_frame(cam)
    img = r.update_result()  # exercises reassembly end-to-end
    batches = [b for b in r._batches]
    assert len(batches) >= 3, f"want >=3 batches, got {len(batches)}"

    dbvh = device_bvh(r.flat)
    total = disputes = wrong = 0
    for b in batches:
        got = np.asarray(b.hits.tri)
        ref = np.asarray(trace_wavefront(dbvh, b.rays, any_hit=True).tri)
        d_idx = np.flatnonzero((got >= 0) != (ref >= 0))
        total += got.size
        disputes += int(d_idx.size)
        if d_idx.size:
            o = np.asarray(b.rays.origin)[d_idx]
            dn = np.asarray(b.rays.dirn)[d_idx]
            tn = np.asarray(b.rays.tmin)[d_idx]
            tx = np.asarray(b.rays.tmax)[d_idx]
            s_id, s_t, s_u, s_v = trace_flat_scalar(r.flat, o, dn, tn, tx)
            # The kernel is wrong only if it disagrees with the oracle
            # AND the oracle's hit is not a borderline case (t within fp
            # noise of tmax, or an edge graze).
            kdis = (got[d_idx] >= 0) != (s_id >= 0)
            margin = np.minimum(np.minimum(s_u, s_v), 1.0 - s_u - s_v)
            border = ((s_id >= 0) & ((margin < 1e-3)
                                     | np.isclose(s_t, tx, rtol=2e-4)))
            wrong += int(np.sum(kdis & ~border))
    entry = {
        "scene": scene_name, "ray_type": "ao", "samples": samples,
        "batches": len(batches), "rays": int(total),
        "rays_metric": int(stats["total_rays"]),
        "cross_tracer_disputes": int(disputes),
        "kernel_wrong": int(wrong), "verified": wrong == 0,
        "image_nonempty": bool(np.any(img[..., :3] != img[0, 0, :3])),
        "device": str(jax.devices()[0]),
    }
    try:
        with open("BENCH_FULLFRAME.json") as f:
            results = json.load(f)
    except OSError:
        results = {}
    results["ao"] = entry
    with open("BENCH_FULLFRAME.json", "w") as f:
        json.dump(results, f, indent=1)
    print(f"ao fullframe {scene_name}: {len(batches)} batches, {total} rays, "
          f"{disputes} disputes -> {wrong} KERNEL-WRONG", flush=True)


def main() -> None:
    if "--verify-full" in sys.argv:
        verify_full()
        return
    if "--verify-ao" in sys.argv:
        verify_ao_frame()
        return
    if "--regen-md" in sys.argv:
        # Re-render BENCH_SUITE.md from the existing JSON artifacts
        # without touching the device (replaces tools/regen_suite_md.py).
        with open("BENCH_SUITE.json") as f:
            results = json.load(f)
        model = fit_cost_model([r for r in results if "mrays" in r])
        write_suite_md(results, int(os.environ.get("BS_WIDTH", 640)),
                       int(os.environ.get("BS_HEIGHT", 480)),
                       int(os.environ.get("BS_CHAIN", 32)), model,
                       dev="TPU v5 lite (regenerated)")
        print("regenerated BENCH_SUITE.md")
        return
    width = int(os.environ.get("BS_WIDTH", 640))
    height = int(os.environ.get("BS_HEIGHT", 480))
    repeats = int(os.environ.get("BS_REPEATS", 3))
    chain = int(os.environ.get("BS_CHAIN", 32))
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SUITE.json"
    rows = ([tuple(a.split(":")) for a in sys.argv[2:]]
            if len(sys.argv) > 2 else ROWS)

    results = []
    for scene_name, ray_type in rows:
        try:
            r = bench_row(scene_name, ray_type, width, height, repeats, chain)
            vsb = (f"(x{r['vs_baseline']:.3f} of {r['baseline']})"
                   if r.get("vs_baseline") is not None else "(non-baseline)")
            print(f"{scene_name:11s} {ray_type:8s} {r['mrays']:8.2f} Mray/s"
                  f"  {vsb}  [{r['tracer']}]", flush=True)
        except Exception as e:  # noqa: BLE001
            r = {"scene": scene_name, "ray_type": ray_type,
                 "error": f"{type(e).__name__}: {e}"}
            print(f"{scene_name:11s} {ray_type:8s} FAILED {r['error'][:100]}",
                  flush=True)
        results.append(r)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    model = fit_cost_model([r for r in results if "mrays" in r])
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    if out_path == "BENCH_SUITE.json":
        # Ad-hoc row subsets (custom out_path) must not clobber the
        # committed full-suite snapshot.
        write_suite_md(results, width, height, chain, model)
        print(f"wrote BENCH_SUITE.md + {out_path}")
    else:
        print(f"wrote {out_path} (BENCH_SUITE.md untouched for ad-hoc runs)")


if __name__ == "__main__":
    main()
