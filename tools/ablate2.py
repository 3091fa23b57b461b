#!/usr/bin/env python
"""Fixed-trip ablation of the packet2 step: measures ns/iteration as each
component of the traversal step is layered in, on real tables.

Levels (cumulative):
  0 empty loop            4 + any-votes + scalar ordering
  1 + node fetch+roll     5 + stack/queue SMEM logic
  2 + bounds broadcast    6 + tri fetch+roll
  3 + span math           7 + U tri tests + hit writes (= full step shape)

Usage: python tools/ablate2.py [tile] [K] [U] [niter]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
U = int(sys.argv[3]) if len(sys.argv) > 3 else 3
NITER = int(sys.argv[4]) if len(sys.argv) > 4 else 2000
S = TILE // 128
STACK_DEPTH = 64
QUEUE_DEPTH = 64


def make_kernel(level):
    def kernel(nodes_ref, woop_ref, rays_ref, out_ref, stack_ref, queue_ref,
               ctx_ref):
        nb = nodes_ref.shape[0]
        wb = woop_ref.shape[0]

        def body(i, state):
            accs, nodes = state
            o_accs, o_nodes = [], []
            for k in range(K):
                acc, node = accs[k], nodes[k]
                nxt = node + 1
                if level >= 1:
                    nd = node % (nb * 128)
                    blk = nodes_ref[nd // 128]
                    col = pltpu.roll(blk, -(nd % 128), axis=1)[:, 0:1]
                    icol = jax.lax.bitcast_convert_type(col, jnp.int32)
                    link0 = icol[12, 0]
                    link1 = icol[13, 0]
                    nxt = nxt + (link0 % 3) - (link0 % 3)
                if level >= 2:
                    crep = jnp.repeat(col, S, axis=0)

                    def b(j):
                        return crep[S * j:S * (j + 1)]
                else:
                    def b(j):
                        return jnp.float32(j)
                if level >= 3:
                    idirx = ctx_ref[k, 0]
                    idiry = ctx_ref[k, 1]
                    idirz = ctx_ref[k, 2]
                    oodx = ctx_ref[k, 3]
                    oody = ctx_ref[k, 4]
                    oodz = ctx_ref[k, 5]
                    hit_t = ctx_ref[k, 6 % 6]  # reuse a ctx row as hit_t

                    def span(lox, hix, loy, hiy, loz, hiz):
                        tx0 = lox * idirx - oodx
                        tx1 = hix * idirx - oodx
                        ty0 = loy * idiry - oody
                        ty1 = hiy * idiry - oody
                        tz0 = loz * idirz - oodz
                        tz1 = hiz * idirz - oodz
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.minimum(jnp.maximum(tz0, tz1), hit_t))
                        return near, far

                    c0min, c0max = span(b(0), b(1), b(2), b(3), b(8), b(9))
                    c1min, c1max = span(b(4), b(5), b(6), b(7), b(10), b(11))
                    acc = acc + c0min[0, 0] * 0.0
                if level >= 4:
                    any0 = jnp.any(c0max >= c0min)
                    any1 = jnp.any(c1max >= c1min)
                    enc = icol[14, 0]
                    swap = ((enc >> 2) ^ enc) & 1
                    nxt = jnp.where(any0 & any1 & (swap != 0), nxt, nxt + 0)
                if level >= 5:
                    sp = node % (STACK_DEPTH - 1)
                    stack_ref[k, sp] = jnp.where(any0, link0, stack_ref[k, sp])
                    popped = stack_ref[k, jnp.clip(sp - 1, 0, STACK_DEPTH - 1)]
                    qw = node % QUEUE_DEPTH
                    queue_ref[k, qw] = jnp.where(any1, link1, queue_ref[k, qw])
                    qr = queue_ref[k, (node + 1) % QUEUE_DEPTH]
                    nxt = nxt + ((popped + qr) % 3) - ((popped + qr) % 3)
                if level >= 6:
                    ti = (node * 7) % (wb * 128)
                    tblk = woop_ref[ti // 128]
                    wblk = pltpu.roll(tblk, -(ti % 128), axis=1)
                    tw = jax.lax.bitcast_convert_type(wblk, jnp.int32)[12, 0]
                    nxt = nxt + (tw % 3) - (tw % 3)
                if level >= 7:
                    ox = rays_ref[0, k, 0]
                    oy = rays_ref[0, k, 1]
                    oz = rays_ref[0, k, 2]
                    dx = rays_ref[0, k, 3]
                    dy = rays_ref[0, k, 4]
                    dz = rays_ref[0, k, 5]
                    hh = acc
                    for uu in range(U):
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
                        ok = (t > 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        hh = jnp.where(ok, t, hh)
                    acc = hh
                if level >= 8:
                    ht = ctx_ref[k, 0]
                    htri = jax.lax.bitcast_convert_type(ctx_ref[k, 1], jnp.int32)
                    ok2 = acc > 0.5
                    ctx_ref[k, 0] = jnp.where(ok2, acc, ht)
                    ctx_ref[k, 1] = jax.lax.bitcast_convert_type(
                        jnp.where(ok2, htri + 1, htri), jnp.float32)
                o_accs.append(acc)
                o_nodes.append(nxt)
            return tuple(o_accs), tuple(o_nodes)

        init = (tuple(rays_ref[0, k, 6] for k in range(K)),
                tuple(jnp.int32(k) for k in range(K)))
        if level >= 9:
            def wbody(state):
                accs, nodes = body(0, state)
                return accs, nodes

            def wcond(state):
                accs, nodes = state
                alive = nodes[0] < NITER
                for k in range(1, K):
                    alive = alive | (nodes[k] < NITER)
                return alive

            accs, nodes = jax.lax.while_loop(wcond, wbody, init)
        else:
            accs, nodes = jax.lax.fori_loop(0, NITER, body, init)
        for k in range(K):
            out_ref[0, k] = accs[k] + nodes[k].astype(jnp.float32)

    return kernel


def main() -> None:
    from tpu_rt.bvh import load_or_build_bvh
    from tpu_rt.scene import Scene, procedural
    from tpu_rt.trace.packet2 import pack_tables2

    scene = Scene(procedural.scene_by_name("bunny"))
    flat, _ = load_or_build_bvh(scene, cache_dir="bvhcache")
    nodes3, woop3 = pack_tables2(flat)
    nodes3 = jnp.asarray(nodes3)
    woop3 = jnp.asarray(woop3)
    rays = jnp.ones((1, K, 8, S, 128), jnp.float32)

    def timed(level, niter):
        global NITER
        NITER = niter
        f = pl.pallas_call(
            make_kernel(level),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec((1, K, 8, S, 128), lambda i: (i, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, K, S, 128), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, K, S, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((K, STACK_DEPTH), jnp.int32),
                            pltpu.SMEM((K, QUEUE_DEPTH), jnp.int32),
                            pltpu.VMEM((K, 6, S, 128), jnp.float32)],
        )
        jf = jax.jit(lambda n, w, r, f=f: jnp.sum(f(n, w, r)))
        int(jf(nodes3, woop3, rays))  # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            int(jf(nodes3, woop3, rays))
            best = min(best, time.perf_counter() - t0)
        return best

    base = NITER
    prev = 0.0
    for level in range(10):
        t_small = timed(level, base)
        t_big = timed(level, base * 5)
        ns = (t_big - t_small) / (4 * base) * 1e9
        print(f"level {level}: {ns:9.1f} ns/iter  (+{ns - prev:7.1f})")
        prev = ns

    print(f"\nconfig tile={TILE} K={K} U={U} niter={NITER}")


if __name__ == "__main__":
    main()
