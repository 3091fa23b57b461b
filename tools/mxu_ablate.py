#!/usr/bin/env python
"""Fixed-trip ablation of packet2's MXU triangle phase on real tables.

Each variant is the real kernel's mxu branch with one piece stubbed, so
the delta pins the cost.  Fixed trip count (fori_loop) keeps timing
comparable when results are garbage.

Variants:
  vpu      the U=3 VPU triangle loop (baseline, real kernel shape)
  full     transpose + L-build + matmul + epilogue + relayout + merge
  noT      L built from a loop-hoisted pre-transposed block (isolates
           the in-loop (16,8) transpose)
  noL      L = scratch constant (isolates transpose+concat build)
  noM      matmul replaced by broadcast of L[0:48,0:1] (isolates matmul)
  noR      merge on flat (1,S*128) slices, no _flat_to_rows
  epi0     matmul result consumed by one sum (no epilogue/merge)

Usage: python tools/mxu_ablate.py [tile] [K] [niter]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
NITER = int(sys.argv[3]) if len(sys.argv) > 3 else 4000
S = TILE // 128
UM = 8  # MXU candidate width
UV = 3  # VPU baseline width


def _flat_to_rows(x, S):
    return jnp.concatenate(
        [x[:, 128 * s:128 * (s + 1)] for s in range(S)], axis=0)


def make_kernel(variant, niter):
    def kernel(woop_ref, rays_ref, rmat_ref, out_ref, lscr_ref, wt_scr):
        wb = woop_ref.shape[0]
        # Hoisted pre-transposed block for noT.
        wt_scr[...] = jnp.transpose(woop_ref[0][:, 0:UM])

        def body(i, accs):
            o_accs = []
            for k in range(K):
                acc = accs[k]
                ti = (i * 7 + k) % (wb * 128)
                tblk0 = woop_ref[ti // 128]
                wblk = pltpu.roll(tblk0, -(ti % 128), axis=1)
                hit_t = rays_ref[0, k, 6]
                hit_tri = jnp.full((S, 128), -1, jnp.int32)

                if variant == "vpu":
                    ox, oy, oz = (rays_ref[0, k, 0], rays_ref[0, k, 1],
                                  rays_ref[0, k, 2])
                    dx, dy, dz = (rays_ref[0, k, 3], rays_ref[0, k, 4],
                                  rays_ref[0, k, 5])
                    for uu in range(UV):
                        wrep = jnp.repeat(wblk[:, uu:uu + 1], S, axis=0)

                        def c(j):
                            return wrep[S * j:S * (j + 1)]

                        oz_t = c(3) - ox * c(0) - oy * c(1) - oz * c(2)
                        dz_t = dx * c(0) + dy * c(1) + dz * c(2)
                        t = oz_t / dz_t
                        u = (c(7) + ox * c(4) + oy * c(5) + oz * c(6)) \
                            + t * (dx * c(4) + dy * c(5) + dz * c(6))
                        v = (c(11) + ox * c(8) + oy * c(9) + oz * c(10)) \
                            + t * (dx * c(8) + dy * c(9) + dz * c(10))
                        ok = ((t > 0.0) & (t < hit_t) & (u >= 0.0)
                              & (v >= 0.0) & (u + v <= 1.0))
                        tid = jax.lax.bitcast_convert_type(
                            wrep, jnp.int32)[12 * S:13 * S]
                        hit_t = jnp.where(ok, t, hit_t)
                        hit_tri = jnp.where(ok, tid, hit_tri)
                    acc = acc + hit_t
                    o_accs.append(acc)
                    continue

                # ---- MXU variants ----
                U = UM
                if variant == "noL":
                    L = lscr_ref[...]
                    wT = wt_scr[...]
                else:
                    if variant == "noT":
                        wT = wt_scr[...]
                    else:
                        wT = jnp.transpose(wblk[:, 0:U])
                    z3 = jnp.zeros((U, 3), jnp.float32)
                    z4 = jnp.zeros((U, 4), jnp.float32)
                    z6 = jnp.zeros((U, 6), jnp.float32)

                    def lo(c):
                        return jnp.concatenate(
                            [c[:, 0:3], c[:, 3:4], z6], axis=1)

                    def ld(c):
                        return jnp.concatenate([z4, c[:, 0:3], z3], axis=1)

                    w_z = wT[:, 0:4]
                    w_x = wT[:, 4:8]
                    w_y = wT[:, 8:12]
                    L = jnp.concatenate([
                        lo(jnp.concatenate([-w_z[:, 0:3], w_z[:, 3:4]],
                                           axis=1)),
                        ld(w_z), lo(w_x), ld(w_x), lo(w_y), ld(w_y)], axis=0)
                rmat = rmat_ref[0, k]
                if variant == "noM":
                    O = jnp.repeat(L[:, 0:1], S * 128, axis=1) + rmat[0:1]
                else:
                    O = jax.lax.dot_general(
                        L, rmat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision="float32")
                if variant == "epi0":
                    acc = acc + jnp.sum(O) + jnp.sum(wT)
                    o_accs.append(acc)
                    continue
                ozt, dzt = O[0:U], O[U:2 * U]
                oxt, dxt = O[2 * U:3 * U], O[3 * U:4 * U]
                oyt, dyt = O[4 * U:5 * U], O[5 * U:6 * U]
                t = ozt / dzt
                uu_ = oxt + t * dxt
                vv_ = oyt + t * dyt
                tminf = rmat[7:8]
                tmaxf = rmat[8:9]
                have = (jax.lax.broadcasted_iota(jnp.int32, (U, 1), 0)
                        < (jnp.int32(5) + (i % 3)))
                okc = (have & (t > tminf) & (t < tmaxf)
                       & (uu_ >= 0.0) & (vv_ >= 0.0) & (uu_ + vv_ <= 1.0))
                tsel = jnp.where(okc, t, jnp.float32(np.inf))
                tb = jnp.min(tsel, axis=0, keepdims=True)
                eq = tsel == tb
                tid_col = jax.lax.bitcast_convert_type(
                    wT[:, 12:13], jnp.int32)
                idb = jnp.max(jnp.where(eq, tid_col, -1), axis=0,
                              keepdims=True)
                if variant == "noR":
                    acc = acc + tb[0:1, 0:128] + \
                        jnp.min(idb).astype(jnp.float32)
                else:
                    tb2 = _flat_to_rows(tb, S)
                    idb2 = _flat_to_rows(idb, S)
                    upd = tb2 < hit_t
                    hit_t = jnp.where(upd, tb2, hit_t)
                    hit_tri = jnp.where(upd, idb2, hit_tri)
                    acc = acc + hit_t + hit_tri.astype(jnp.float32) * 1e-9
                o_accs.append(acc)
            return tuple(o_accs)

        accs = jax.lax.fori_loop(
            0, niter, body,
            tuple(rays_ref[0, k, 7] * 0.0 for k in range(K)))
        for k in range(K):
            out_ref[0, k] = accs[k]

    return kernel


def timed(variant, woop3, rays, rmat, niter):
    f = pl.pallas_call(
        make_kernel(variant, niter),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, K, 8, S, 128), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, K, 10, S * 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K, S, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, K, S, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6 * UM, 10), jnp.float32),
                        pltpu.VMEM((UM, 16), jnp.float32)],
    )
    g = jax.jit(lambda *a: jnp.sum(f(*a)))
    float(g(woop3, rays, rmat))  # compile
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(g(woop3, rays, rmat))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from tpu_rt.bvh import load_or_build_bvh
    from tpu_rt.scene import Scene, procedural
    from tpu_rt.trace.packet2 import pack_tables2

    scene = Scene(procedural.scene_by_name("bunny"))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    _, woop3 = pack_tables2(flat)
    woop3 = jnp.asarray(woop3)
    rng = np.random.default_rng(0)
    rays = jnp.asarray(rng.standard_normal((1, K, 8, S, 128)), jnp.float32)
    rmat = jnp.asarray(rng.standard_normal((1, K, 10, S * 128)), jnp.float32)

    lo_n = NITER // 4
    for variant in ["vpu", "full", "noT", "noL", "noM", "noR", "epi0"]:
        t_hi = timed(variant, woop3, rays, rmat, NITER)
        t_lo = timed(variant, woop3, rays, rmat, lo_n)
        ns = (t_hi - t_lo) / (NITER - lo_n) * 1e9
        print(f"{variant:5s}: {ns:8.1f} ns/iter  (hi {t_hi*1e3:.2f} ms, "
              f"lo {t_lo*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
