#!/usr/bin/env python
"""Probe: can the MXU beat the VPU triangle unit at contraction depth 8?

The packet2 triangle test is 6 dot products per (ray, tri) contracting
over 8 ray components (ox,oy,oz,1,dx,dy,dz,0).  Roadmap item 1
(ARCHITECTURE.md) proposes W(6U,8) @ R(8,TILE) on the MXU; this measures
that matmul inside a loop shaped like the real kernel step, against the
current VPU formulation, including the epilogue and hit-merge layouts.

Modes (per iteration, per packet, K packets interleaved):
  vpu3        current scheme: 3 sequential broadcast tri tests (baseline)
  mm_only     one f32 matmul (48,8)@(8,2048), minimal consume
  mm_epi      matmul + epilogue on (8,2048) quantity slices + sublane
              min-merge to (1,2048)
  mm_merge    mm_epi + relayout of the (1,2048) result into (S,128)
              (the hit-state interface cost)
  mm_sub      S small matmuls (48,8)@(8,128) into a (48,S,128) scratch
              + one (S,128) slice consume

Usage: python tools/mxu_probe.py [niter]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048
S = TILE // 128
K = 4
U = 3
NITER = int(sys.argv[1]) if len(sys.argv) > 1 else 2000


def make_kernel(mode, niter):
    def kernel(wtab_ref, woop_ref, rwide_ref, rsub_ref, rays_ref, out_ref,
               scr_ref):
        def body(i, state):
            accs, nodes = state
            o_accs, o_nodes = [], []
            for k in range(K):
                acc, node = accs[k], nodes[k]
                nxt = node + 1

                if mode == "vpu3":
                    tpos = node % (woop_ref.shape[0] * 128)
                    tblk = woop_ref[tpos // 128]
                    wblk = pltpu.roll(tblk, -(tpos % 128), axis=1)
                    ox = rays_ref[k, 0]
                    oy = rays_ref[k, 1]
                    oz = rays_ref[k, 2]
                    dx = rays_ref[k, 3]
                    dy = rays_ref[k, 4]
                    dz = rays_ref[k, 5]
                    for uu in range(U):
                        # Real-kernel parity: have mask, tid bitcast,
                        # hit merges (packet2.py:411-440).
                        have = (node + uu) < (node + U)
                        wrep = jnp.repeat(wblk[:, uu:uu + 1], S, axis=0)

                        def c(j):
                            return wrep[S * j:S * (j + 1)]

                        oz_t = c(3) - ox * c(0) - oy * c(1) - oz * c(2)
                        dz_t = dx * c(0) + dy * c(1) + dz * c(2)
                        t = oz_t / dz_t
                        ox_t = c(7) + ox * c(4) + oy * c(5) + oz * c(6)
                        dx_t = dx * c(4) + dy * c(5) + dz * c(6)
                        u = ox_t + t * dx_t
                        oy_t = c(11) + ox * c(8) + oy * c(9) + oz * c(10)
                        dy_t = dx * c(8) + dy * c(9) + dz * c(10)
                        v = oy_t + t * dy_t
                        ok = (have & (t > 0.0) & (t < 1e30) & (u >= 0.0)
                              & (v >= 0.0) & (u + v <= 1.0))
                        tid = jax.lax.bitcast_convert_type(
                            wrep, jnp.int32)[12 * S:13 * S]
                        acc = acc + jnp.where(ok, t, 0.0) \
                            + jnp.where(ok, tid, 0).astype(jnp.float32)

                elif mode in ("mm_only", "mm_epi", "mm_merge"):
                    w = wtab_ref[node % 128]              # (48,8)
                    out = jax.lax.dot_general(
                        w, rwide_ref[k],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (48,2048)
                    if mode == "mm_only":
                        # Consume every output row so no part of the
                        # matmul is dead-code-eliminated.
                        tot = out[0:8]
                        for r in range(1, 6):
                            tot = tot + out[8 * r:8 * (r + 1)]
                        acc = acc + jnp.broadcast_to(
                            jnp.sum(tot, axis=0, keepdims=True)[:, 0:128],
                            (S, 128))
                    else:
                        ozt = out[0:8]
                        dzt = out[8:16]
                        oxt = out[16:24]
                        dxt = out[24:32]
                        oyt = out[32:40]
                        dyt = out[40:48]
                        t = ozt / dzt
                        u = oxt + t * dxt
                        v = oyt + t * dyt
                        ok = ((t > 0.0) & (t < 1e30) & (u >= 0.0)
                              & (v >= 0.0) & (u + v <= 1.0))
                        tm = jnp.where(ok, t, 3e38)
                        tbest = jnp.min(tm, axis=0, keepdims=True)  # (1,2048)
                        if mode == "mm_epi":
                            acc = acc + jnp.broadcast_to(
                                tbest[:, 0:128], (S, 128))
                        else:
                            hb = tbest.reshape(S, 128)
                            acc = acc + hb

                elif mode == "mm_sub":
                    w = wtab_ref[node % 128]              # (48,8)
                    for s in range(S):
                        o = jax.lax.dot_general(
                            w, rsub_ref[k, s],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (48,128)
                        scr_ref[:, s, :] = o
                    acc = acc + scr_ref[0] / scr_ref[8]

                o_accs.append(acc)
                o_nodes.append(nxt)
            return tuple(o_accs), tuple(o_nodes)

        accs = tuple(jnp.zeros((S, 128), jnp.float32) for _ in range(K))
        nodes = tuple(jnp.int32(7 * k) for k in range(K))
        accs, _ = jax.lax.fori_loop(0, niter, body, (accs, nodes))
        for k in range(K):
            out_ref[k] = accs[k]

    return kernel


def run(mode, niter):
    wtab = np.random.randn(128, 48, 8).astype(np.float32)
    woop = np.random.randn(64, 16, 128).astype(np.float32)
    rwide = np.random.randn(K, 8, 2048).astype(np.float32)
    rsub = np.ascontiguousarray(
        rwide.reshape(K, 8, S, 128).transpose(0, 2, 1, 3))
    rays = np.random.randn(K, 8, S, 128).astype(np.float32)

    fn = pl.pallas_call(
        make_kernel(mode, niter),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, S, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((48, S, 128), jnp.float32)],
    )
    # NB: block_until_ready does not fence on the tunneled axon platform —
    # only a device-scalar readback does (same discipline as bench.py).
    f = jax.jit(lambda *a: jnp.sum(fn(*a)))
    args = [jnp.asarray(x) for x in (wtab, woop, rwide, rsub, rays)]
    float(f(*args))
    # Min over several reps: differential timing is noise-sensitive and
    # can otherwise go negative (advisor finding, round 1).
    best = float("inf")
    for _ in range(7):
        t0 = time.perf_counter()
        float(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    modes = ["vpu3", "mm_only", "mm_epi", "mm_merge", "mm_sub"]
    print(f"TILE={TILE} K={K} U={U} niter={NITER}")
    for mode in modes:
        try:
            lo = run(mode, NITER // 4)
            hi = run(mode, NITER)
            per_iter = (hi - lo) / (NITER - NITER // 4) * 1e9
            flag = "  [UNSTABLE: delta<=0]" if per_iter <= 0 else ""
            print(f"{mode:10s}  {per_iter:8.1f} ns/iter "
                  f"({per_iter / K:6.1f} ns/packet-step){flag}")
        except Exception as e:
            print(f"{mode:10s}  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()
