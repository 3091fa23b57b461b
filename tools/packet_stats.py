#!/usr/bin/env python
"""Host simulation of packet traversal to count shared steps.

Reports, per packet size: node visits, leaf visits, leaf-tri iterations
(the kernel's serial step counts) plus per-ray averages.  Drives kernel
design decisions (TILE, leaf fusion, wide nodes).

Usage: python tools/packet_stats.py [scene] [tile ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def simulate_packet(nodes, links, woop, o, d, tmin, tmax):
    """One packet's shared traversal; returns (node_visits, leaf_visits,
    leaf_tri_steps). Mirrors _packet_kernel's semantics (closest hit)."""
    ooeps = np.float32(2.0**-80)

    def rcp(x):
        safe = np.where(np.abs(x) > ooeps, x, np.where(x >= 0, ooeps, -ooeps))
        return np.float32(1.0) / safe

    idir = rcp(d)
    ood = o * idir
    hit_t = tmax.copy()
    valid = tmax >= 0

    stack: list[int] = []
    node = 0 if valid.any() else None
    nv = lv = lts = 0
    while node is not None:
        if node >= 0:
            nv += 1
            row = nodes[node]
            lnk = links[node]

            def span(lox, hix, loy, hiy, loz, hiz):
                tx0 = lox * idir[:, 0] - ood[:, 0]
                tx1 = hix * idir[:, 0] - ood[:, 0]
                ty0 = loy * idir[:, 1] - ood[:, 1]
                ty1 = hiy * idir[:, 1] - ood[:, 1]
                tz0 = loz * idir[:, 2] - ood[:, 2]
                tz1 = hiz * idir[:, 2] - ood[:, 2]
                near = np.maximum(
                    np.maximum(np.minimum(tx0, tx1), np.minimum(ty0, ty1)),
                    np.maximum(np.minimum(tz0, tz1), tmin),
                )
                far = np.minimum(
                    np.minimum(np.maximum(tx0, tx1), np.maximum(ty0, ty1)),
                    np.minimum(np.maximum(tz0, tz1), hit_t),
                )
                return near, far

            n0, f0 = span(row[0], row[1], row[2], row[3], row[8], row[9])
            n1, f1 = span(row[4], row[5], row[6], row[7], row[10], row[11])
            m0 = (f0 >= n0) & valid
            m1 = (f1 >= n1) & valid
            big = np.float32(3e38)
            near0 = np.where(m0, n0, big).min()
            near1 = np.where(m1, n1, big).min()
            any0, any1 = near0 < big, near1 < big
            first, second = lnk[0], lnk[1]
            if any0 and any1:
                if near1 < near0:
                    first, second = second, first
                stack.append(second)
                node = first
            elif any0:
                node = lnk[0]
            elif any1:
                node = lnk[1]
            else:
                node = stack.pop() if stack else None
        else:
            lv += 1
            enc = ~node
            first = enc & ((1 << 24) - 1)
            count = (enc >> 24) & 0xFF
            lts += count
            for j in range(first, first + count):
                w = woop[j]
                oz_t = w[3] - o[:, 0] * w[0] - o[:, 1] * w[1] - o[:, 2] * w[2]
                dz_t = d[:, 0] * w[0] + d[:, 1] * w[1] + d[:, 2] * w[2]
                with np.errstate(divide="ignore", invalid="ignore"):
                    t = oz_t / dz_t
                    u = (w[7] + o[:, 0] * w[4] + o[:, 1] * w[5] + o[:, 2] * w[6]) + t * (
                        d[:, 0] * w[4] + d[:, 1] * w[5] + d[:, 2] * w[6]
                    )
                    v = (w[11] + o[:, 0] * w[8] + o[:, 1] * w[9] + o[:, 2] * w[10]) + t * (
                        d[:, 0] * w[8] + d[:, 1] * w[9] + d[:, 2] * w[10]
                    )
                ok = valid & (t > tmin) & (t < hit_t) & (u >= 0) & (v >= 0) & (u + v <= 1)
                hit_t = np.where(ok, t, hit_t)
            node = stack.pop() if stack else None
    return nv, lv, lts


def main() -> None:
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
    tiles = [int(t) for t in sys.argv[2:]] or [1024, 2048, 4096]

    from tpu_rt.bvh import load_or_build_bvh
    from tpu_rt.raygen import RayGen
    from tpu_rt.scene import Camera, Scene, procedural

    scene = Scene(procedural.scene_by_name(scene_name))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    lo, hi = scene.bbox()
    rays, _, _ = RayGen().primary(Camera.for_bbox(lo, hi), 1024, 768)
    o = np.asarray(rays.origin)
    d = np.asarray(rays.dirn)
    tmin = np.asarray(rays.tmin)
    tmax = np.asarray(rays.tmax)

    # Links with packed leaf encoding (first | count<<24), straight from
    # the FlatBVH (leaf_counts supplies the count field).
    nodes_raw = np.asarray(flat.nodes)
    rows = nodes_raw
    n_nodes = nodes_raw.shape[0]
    links = np.ascontiguousarray(nodes_raw[:, 12:16]).view(np.int32).copy()
    counts_tab = np.asarray(flat.leaf_counts)
    for c in range(2):
        leaf = links[:, c] < 0
        first = ~links[leaf, c]
        links[leaf, c] = ~(first | (counts_tab[first].astype(np.int64)
                                    << 24)).astype(np.int64).astype(np.int32)
    woop = np.asarray(flat.tri_woop)

    n = o.shape[0]
    leaf_hist = np.bincount(
        np.asarray(flat.leaf_counts)[np.asarray(flat.leaf_counts) > 0], minlength=9
    )
    print(f"{scene_name}: {n} rays, {n_nodes} nodes, {woop.shape[0]} refs; "
          f"leaf-count histogram (1..8): {leaf_hist[1:9].tolist()}")

    max_packets = int(os.environ.get("PS_MAX_PACKETS", 64))
    for tile in tiles:
        num = n // tile
        sel = np.linspace(0, num - 1, min(num, max_packets)).astype(int)
        NV = LV = LTS = 0
        for p in sel:
            s = slice(p * tile, (p + 1) * tile)
            nv, lv, lts = simulate_packet(rows, links, woop, o[s], d[s], tmin[s], tmax[s])
            NV += nv
            LV += lv
            LTS += lts
        k = len(sel)
        print(
            f"TILE={tile}: node_visits/packet {NV/k:.0f}, leaf_visits {LV/k:.0f}, "
            f"leaf_tri_steps {LTS/k:.0f}, total_serial {(NV+LTS)/k:.0f} "
            f"(fused-leaf {(NV+LV)/k:.0f}); per-ray node tests {NV*tile/k/tile:.2f}"
            f" -> steps/ray now {(NV+LTS)/k/tile:.3f}, fused {(NV+LV)/k/tile:.3f}"
        )


if __name__ == "__main__":
    main()
