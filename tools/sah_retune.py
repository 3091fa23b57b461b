#!/usr/bin/env python
"""Host experiment: does retuning the SAH node:triangle cost ratio cut
the packet kernel's SHARED step count?

The reference Platform('GPU') uses node_cost == triangle_cost == 1 with
leaf prefs (1, 8) — the GPU's per-test cost ratio.  The packet kernel's
per-STEP costs differ (a node step ~90 vector ops, a leaf visit ~128 and
its count is leaf-VISIT-bound), so a tree built with a different ratio
(or leaf-size prefs) may trade fewer leaf visits for more node steps or
vice versa.  This sim counts shared steps per packet for candidate
platforms; tools/sweep2.py then validates wall-clock on hardware for the
winner (build the BVH into bvhcache with TPU_RT_SAH_* env first).

Usage: python tools/sah_retune.py [scene] [tile]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SCENE = sys.argv[1] if len(sys.argv) > 1 else "bunny"
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
MAXP = int(os.environ.get("PS_MAX_PACKETS", 24))
U = 3


def shared_steps(flat, o, d, tmin, tmax):
    """(node_steps, leaf_visits, tri_steps) of one packet's shared
    traversal — mirrors packet2 semantics (closest hit, near-first by
    packet vote)."""
    nodes = np.asarray(flat.nodes)
    links = np.ascontiguousarray(nodes[:, 12:16]).view(np.int32)
    counts = np.asarray(flat.leaf_counts)
    woop = np.asarray(flat.tri_woop)
    ooeps = np.float32(2.0 ** -80)
    safe = np.where(np.abs(d) > ooeps, d, np.where(d >= 0, ooeps, -ooeps))
    idir = (1.0 / safe).astype(np.float32)
    ood = o * idir
    hit_t = tmax.copy()
    valid = tmax >= 0

    def span(b):
        t0 = b[0::2][None] * idir - ood
        t1 = b[1::2][None] * idir - ood
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        near = np.maximum(lo.max(axis=1), tmin)
        far = np.minimum(hi.min(axis=1), hit_t)
        return (far >= near) & valid

    nv = lv = ts = 0
    stack = []
    node = 0
    while node is not None:
        nv += 1
        row = nodes[node]
        b0 = np.array([row[0], row[1], row[2], row[3], row[8], row[9]])
        b1 = np.array([row[4], row[5], row[6], row[7], row[10], row[11]])
        hits = []
        for c, b in ((0, b0), (1, b1)):
            if span(b).any():
                hits.append(links[node, c])
        nxt = None
        for lnk in hits:
            if lnk < 0:
                first = ~lnk
                count = counts[first]
                lv += 1
                ts += -(-int(count) // U)
                for j in range(first, first + int(count)):
                    w = woop[j]
                    ozt = w[3] - o[:, 0] * w[0] - o[:, 1] * w[1] - o[:, 2] * w[2]
                    dzt = d[:, 0] * w[0] + d[:, 1] * w[1] + d[:, 2] * w[2]
                    with np.errstate(divide="ignore", invalid="ignore"):
                        t = ozt / dzt
                        u = (w[7] + o[:, 0] * w[4] + o[:, 1] * w[5]
                             + o[:, 2] * w[6]) + t * (d[:, 0] * w[4]
                             + d[:, 1] * w[5] + d[:, 2] * w[6])
                        v = (w[11] + o[:, 0] * w[8] + o[:, 1] * w[9]
                             + o[:, 2] * w[10]) + t * (d[:, 0] * w[8]
                             + d[:, 1] * w[9] + d[:, 2] * w[10])
                    ok = (valid & (t > tmin) & (t < hit_t) & (u >= 0)
                          & (v >= 0) & (u + v <= 1))
                    hit_t = np.where(ok, t, hit_t)
            elif nxt is None:
                nxt = lnk
            else:
                stack.append(lnk)
        node = nxt if nxt is not None else (stack.pop() if stack else None)
    return nv, lv, ts


def main() -> None:
    from tpu_rt.bvh import BuildParams, Platform, build_sbvh, flatten_bvh
    from tpu_rt.raygen import RayGen
    from tpu_rt.scene import Camera, Scene, procedural

    scene = Scene(procedural.scene_by_name(SCENE))
    lo, hi = scene.bbox()
    rays, _, _ = RayGen().primary(Camera.for_bbox(lo, hi), 1024, 768)
    o = np.asarray(rays.origin)
    d = np.asarray(rays.dirn)
    tmin = np.asarray(rays.tmin)
    tmax = np.asarray(rays.tmax)
    n = o.shape[0]
    total_packets = n // TILE
    # Sample packets evenly across the image: leading packets are often
    # pure background (union dies at the root) and would skew the mean.
    sel = np.unique(np.linspace(0, total_packets - 1,
                                min(MAXP, total_packets)).astype(int))

    # Candidates: (node_cost, tri_cost, min_leaf, max_leaf)
    cands = [
        ("gpu 1:1 (1,8)", 1.0, 1.0, 1, 8),
        ("node-cheap 0.5:1 (1,8)", 0.5, 1.0, 1, 8),
        ("node-pricey 2:1 (1,8)", 2.0, 1.0, 1, 8),
        ("big-leaf 1:1 (4,8)", 1.0, 1.0, 4, 8),
        ("tri-cheap 1:0.5 (1,8)", 1.0, 0.5, 1, 8),
    ]
    for name, nc, tc, mn, mx in cands:
        plat = Platform(name=f"tune-{nc}-{tc}-{mn}", sah_node_cost=nc,
                        sah_triangle_cost=tc, min_leaf_size=mn,
                        max_leaf_size=mx)
        bvh = build_sbvh(scene, platform=plat, params=BuildParams())
        flat = flatten_bvh(bvh, scene.tri_vtx_index, scene.vtx_pos)
        tot = np.zeros(3)
        for p in sel:
            sl = slice(p * TILE, (p + 1) * TILE)
            tot += shared_steps(flat, o[sl], d[sl], tmin[sl], tmax[sl])
        nv, lv, ts = tot / sel.size
        iters = max(nv, ts)
        print(f"{name:26s} node {nv:6.1f}  leaf {lv:6.1f}  tri {ts:6.1f}"
              f"  iters~{iters:6.1f}  refs {np.asarray(flat.tri_woop).shape[0]}",
              flush=True)


if __name__ == "__main__":
    main()
