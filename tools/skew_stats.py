#!/usr/bin/env python
"""Quantify the K-interleave max-skew tax of the packet kernel.

The kernel advances K packets per while_loop iteration; a grid step only
finishes when its SLOWEST packet finishes, so wall-clock per group of K
consecutive packets ~ K x max(iterations) while useful work is
sum(iterations).  For uniform primary tiles max ~ mean; for post-sort
AO/diffuse batches (dead/easy/hard packets interleaved) the tax can be
large.  This tool measures it per scene x ray type, plus orderings:
  natural   — packets in Morton ray order (what the kernel runs today)
  lb        — packets sorted by simulated cost (oracle load balance)
  compact   — degenerate rays dropped first, then natural order

Usage: python tools/skew_stats.py [scene] [ray_type] [tile] [K]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from treelet_sim import Stepper, gen_rays, leaf_encode_links


def packet_iters(stepper, o, d, tmin, tmax, tile, any_hit, U=3):
    """Per-packet kernel-iteration estimate: node steps and triangle
    drains overlap (separate units), so iters ~ max(nv, tri_drains);
    tri_drains ~ lts/U."""
    iters = []
    n = o.shape[0]
    for p in range(n // tile):
        s = slice(p * tile, (p + 1) * tile)
        _, _, (nv, lv, lts, _), _ = stepper.run(
            o[s], d[s], tmin[s], tmax[s], any_hit=any_hit)
        iters.append(max(nv, lts / U, 1))
    return np.array(iters)


def group_cost(iters, K):
    pad = (-len(iters)) % K
    it = np.concatenate([iters, np.zeros(pad)])
    return float(it.reshape(-1, K).max(axis=1).sum() * K)


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else "knob"
    ray_type = sys.argv[2] if len(sys.argv) > 2 else "ao"
    tile = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    flat, o, d, tmin, tmax, any_hit = gen_rays(scene, ray_type, 1024, 768)
    stepper = Stepper(np.asarray(flat.nodes), leaf_encode_links(flat),
                      np.asarray(flat.tri_woop))

    iters = packet_iters(stepper, o, d, tmin, tmax, tile, any_hit)
    work = float(iters.sum())
    live = tmax >= 0
    print(f"{scene} {ray_type}: {o.shape[0]} rays ({int(live.sum())} live), "
          f"{len(iters)} packets, iters mean {iters.mean():.0f} "
          f"p50 {np.percentile(iters,50):.0f} p90 {np.percentile(iters,90):.0f} "
          f"max {iters.max():.0f}")

    nat = group_cost(iters, K)
    lb = group_cost(np.sort(iters)[::-1], K)
    print(f"natural order: slot-iters {nat:.0f} (work {work:.0f}, "
          f"skew tax {nat/work:.2f}x)")
    print(f"cost-sorted:   slot-iters {lb:.0f} (skew tax {lb/work:.2f}x)")

    # compact: drop degenerate rays, re-pack packets
    oc, dc = o[live], d[live]
    tminc, tmaxc = tmin[live], tmax[live]
    itc = packet_iters(stepper, oc, dc, tminc, tmaxc, tile, any_hit)
    workc = float(itc.sum())
    natc = group_cost(itc, K)
    lbc = group_cost(np.sort(itc)[::-1], K)
    print(f"compacted: {len(itc)} packets, work {workc:.0f} "
          f"({workc/work:.2f}x of natural work)")
    print(f"compact natural: slot-iters {natc:.0f} (tax {natc/workc:.2f}x, "
          f"total win vs natural {nat/natc:.2f}x)")
    print(f"compact sorted:  slot-iters {lbc:.0f} "
          f"(total win vs natural {nat/lbc:.2f}x)")


if __name__ == "__main__":
    main()
