#!/usr/bin/env python
"""Probe the primitives of the ROW-CURSOR kernel design (round 3).

Design under test: one (16,128) packet holds 16 independent traversals,
one per sublane row of 128 Morton-consecutive rays.  Per iteration every
row advances one node step: 16 dynamic record fetches (scalar-indexed),
assembly into per-row (16,1) bound columns via a 16x16 transpose, ONE
(16,128) span test for all rows, per-row lane-reduction votes, one-hot
VMEM stacks (no scalar RMW), and 16 next-node scalar extracts.

Row-cursor pays union(128 rays) per row instead of union(2048) per
packet (~3-6x less total work on dragon/bunny), IF the per-iteration
cost stays comparable to today's ~550ns packet step.  The probes here
measure the unknown costs: extract chains, 16-way fetch, transpose,
one-hot stacks, and a full replica step.

Run: python tools/mosaic_probe3.py [mode ...]
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 16          # rows (sublane cursors)
NB = 64         # table blocks
ITERS = 20000


def make_kernel(mode, iters):
    def kernel(tab_ref, x_ref, o_ref, stack_ref, sp_ref):
        x = x_ref[0]          # (R,128) f32
        acc0 = x
        iota64 = jax.lax.broadcasted_iota(jnp.int32, (R, 64), 1)

        def body(i, carry):
            acc, nodes = carry  # nodes: tuple of R scalars
            if mode == "empty":
                return acc + 1.0, tuple(n + 1 for n in nodes)

            if mode == "x16":
                # 16 independent sublane extracts from one vreg.
                s = jnp.int32(0)
                for r in range(R):
                    s = s + jax.lax.convert_element_type(acc[r, 0], jnp.int32)
                return acc + 1e-9, tuple((n + s - s + 1) % (NB * 128)
                                         for n in nodes)

            if mode == "fetch16":
                cols = []
                for r in range(R):
                    blk = tab_ref[nodes[r] // 128]            # (16,128)
                    col = pltpu.roll(blk, -(nodes[r] % 128), axis=1)[:, 0:1]
                    cols.append(col)
                M = jnp.concatenate(cols, axis=1)             # (16,R)
                acc = acc + M[0, 0] * 1e-9
                return acc, tuple((n + 1) % (NB * 128) for n in nodes)

            if mode == "fetch16T":
                cols = []
                for r in range(R):
                    blk = tab_ref[nodes[r] // 128]
                    col = pltpu.roll(blk, -(nodes[r] % 128), axis=1)[:, 0:1]
                    cols.append(col)
                M = jnp.concatenate(cols, axis=1)             # (slots=16, R)
                T = jnp.transpose(M)                           # (R, slots)
                acc = acc + T[0, 0] * 1e-9
                return acc, tuple((n + 1) % (NB * 128) for n in nodes)

            if mode == "onehot_stack":
                # Per-row push + pop entirely as (R,64) vector ops.
                sp = sp_ref[0]                                 # (R,64) carr.. use stack_ref[1]? keep in VMEM scratch row
                spv = stack_ref[1][:, 0:1]                     # (R,1) f32 as sp
                spi = jax.lax.convert_element_type(spv, jnp.int32)
                st = stack_ref[0]                              # (R,64)
                push_mask = iota64 == spi
                st = jnp.where(push_mask, acc[:, 0:1], st)
                popped = jnp.max(jnp.where(iota64 == (spi - 1), st, -3e38),
                                 axis=1, keepdims=True)        # (R,1)
                stack_ref[0] = st
                stack_ref[1] = jnp.broadcast_to(
                    (spv + 1.0) % 60.0, (R, 64))
                return acc + popped * 1e-12, tuple(n + 1 for n in nodes)

            if mode == "rowstep":
                # Full row-cursor node step replica.
                cols = []
                for r in range(R):
                    blk = tab_ref[nodes[r] // 128]
                    col = pltpu.roll(blk, -(nodes[r] % 128), axis=1)[:, 0:1]
                    cols.append(col)
                M = jnp.concatenate(cols, axis=1)              # (16,R)
                T = jnp.transpose(M)                           # (R,16)

                def b(i):
                    return T[:, i:i + 1]                       # (R,1)

                idir = acc[:, 0:1] + 1.0
                ood = acc[:, 1:2]
                # both children spans on the full (R,128) ray block
                def span(lo, hi, lo2, hi2, lo3, hi3):
                    t0 = lo * idir - ood
                    t1 = hi * idir - ood
                    u0 = lo2 * idir - ood
                    u1 = hi2 * idir - ood
                    v0 = lo3 * idir - ood
                    v1 = hi3 * idir - ood
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0, t1), jnp.minimum(u0, u1)),
                        jnp.minimum(v0, v1))
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0, t1), jnp.maximum(u0, u1)),
                        jnp.maximum(v0, v1))
                    return near * acc, far * acc  # broadcast to (R,128)

                n0, f0 = span(b(0), b(1), b(2), b(3), b(8), b(9))
                n1, f1 = span(b(4), b(5), b(6), b(7), b(10), b(11))
                hit0 = jnp.any(f0 >= n0, axis=1, keepdims=True)  # (R,1)
                hit1 = jnp.any(f1 >= n1, axis=1, keepdims=True)
                Ti = jax.lax.bitcast_convert_type(T, jnp.int32)
                link0 = Ti[:, 12:13]
                link1 = Ti[:, 13:14]
                first = jnp.where(hit0, link0, link1)
                push = hit0 & hit1

                spv = stack_ref[1][:, 0:1]
                spi = jax.lax.convert_element_type(spv, jnp.int32)
                st = stack_ref[0]
                st = jnp.where((iota64 == spi) & push,
                               jax.lax.convert_element_type(
                                   link1, jnp.float32), st)
                spi2 = spi + push.astype(jnp.int32)
                popped = jnp.max(jnp.where(iota64 == (spi2 - 1), st, -3e38),
                                 axis=1, keepdims=True)
                need_pop = ~(hit0 | hit1)
                nxt = jnp.where(need_pop,
                                jax.lax.convert_element_type(popped,
                                                             jnp.int32),
                                first)                          # (R,1)
                stack_ref[0] = st
                stack_ref[1] = jnp.broadcast_to(
                    jax.lax.convert_element_type(
                        spi2 % 60, jnp.float32), (R, 64))
                acc = acc + f0 * 1e-12 + f1 * 1e-12
                new_nodes = tuple(
                    jnp.abs(nxt[r, 0]) % (NB * 128) for r in range(R))
                return acc, new_nodes


            if mode in ("div8", "mul8", "divmul"):
                # f32 divide vs multiply issue cost on (R,128) vregs:
                # decides the division-free-accept question (roadmap #1)
                # without building the kernel variant.
                v = acc
                for _ in range(8):
                    if mode == "div8":
                        v = v / (v + 1.5)
                    elif mode == "mul8":
                        v = v * (v + 1.5)
                    else:
                        v = v / (v + 1.5) if _ % 2 == 0 else v * (v + 1.5)
                return v * 1e-6 + acc * 0.5, tuple(n + 1 for n in nodes)
            raise ValueError(mode)

        init = (acc0, tuple(jnp.int32(r * 7 + 1) for r in range(R)))
        final = jax.lax.fori_loop(0, iters, body, init)
        o_ref[0] = final[0] + jax.lax.convert_element_type(
            final[1][0], jnp.float32)

    return kernel


def run(mode):
    tab = jnp.asarray(np.random.rand(NB, 16, 128).astype(np.float32) * 1e-3)
    x = jnp.asarray(np.random.rand(1, R, 128).astype(np.float32))

    def build(iters):
        f = pl.pallas_call(
            make_kernel(mode, iters),
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, R, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((2, R, 64), jnp.float32),
                            pltpu.SMEM((R,), jnp.int32)],
        )
        return jax.jit(lambda a, b: jnp.sum(f(a, b)))

    try:
        f1, f2 = build(ITERS), build(ITERS * 5)
        float(f1(tab, x))
        float(f2(tab, x))
    except Exception as e:
        print(f"{mode:14s} FAILED: {str(e)[:200]}")
        return

    def best(f):
        b = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(tab, x))
            b = min(b, time.perf_counter() - t0)
        return b

    dt = (best(f2) - best(f1)) / (ITERS * 4)
    print(f"{mode:14s} {dt*1e9:8.1f} ns/iter "
          f"({dt*1e9/R:6.2f} ns/row-step)", flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["empty", "x16", "fetch16", "fetch16T",
                             "onehot_stack", "rowstep", "div8", "mul8"]
    for m in modes:
        run(m)


def gather_rates():
    """XLA gather/scatter rates backing the round-4 record-touch floor
    (ARCHITECTURE.md roofline section).  Run: python - <<< 'from
    tools.mosaic_probe3 import gather_rates; gather_rates()'"""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    def timeit(f, *a):
        int(jnp.sum(f(*a)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            acc = jnp.float32(0)
            for _ in range(8):
                acc = acc + jnp.sum(f(*a))
            int(acc)
            best = min(best, (time.perf_counter() - t0) / 8)
        return best

    rng = np.random.default_rng(0)
    for R in (307200, 786432):
        for N, W in ((500_000, 16), (500_000, 8), (4_000_000, 16)):
            tab = jnp.asarray(rng.normal(size=(N, W)).astype(np.float32))
            idx = jnp.asarray(rng.integers(0, N, R).astype(np.int32))
            dt = timeit(jax.jit(lambda t, i: t[i]), tab, idx)
            print(f"gather R={R} N={N} W={W}: {dt*1e3:7.3f} ms "
                  f"{dt/R*1e9:6.2f} ns/row", flush=True)
    R, N, W = 307200, 150_000, 3
    tab = jnp.zeros((N, W), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, R).astype(np.int32))
    val = jnp.asarray(rng.normal(size=(R, W)).astype(np.float32))
    dt = timeit(jax.jit(lambda t, i, v: t.at[i].add(v)), tab, idx, val)
    print(f"scatter-add R={R}: {dt*1e3:.3f} ms {dt/R*1e9:.2f} ns/row",
          flush=True)
