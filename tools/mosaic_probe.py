#!/usr/bin/env python
"""Probe which scalar-broadcast idioms Mosaic compiles + their speed.

Each variant runs a loop of node-step-like work: fetch a (1,128) row,
produce 12 per-record constants, combine with (S,128) ray vectors.
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 32
ITERS = 2000


def make_kernel(mode):
    def kernel(tab_ref, x_ref, o_ref):
        x = x_ref[0]

        def body(i, acc):
            row = tab_ref[pl.ds(i % 64, 1), :]  # (1,128)

            if mode == "extract":
                def sc(k):
                    return row[0, k]
            elif mode == "slice11":
                def sc(k):
                    return row[0:1, k:k + 1]
            elif mode == "barrier":
                def sc(k):
                    v = jnp.broadcast_to(row[0:1, k:k + 1], (1, 128))
                    return jax.lax.optimization_barrier(v)
            elif mode == "barrier_full":
                def sc(k):
                    v = jnp.broadcast_to(row[0:1, k:k + 1], (1, 128))
                    v = jax.lax.optimization_barrier(v)
                    return jnp.broadcast_to(v, (S, 128))
            elif mode == "matmul":
                # one-hot matmul splat: row (1,128) @ M (128, 12*128)
                # done once for all 12 constants
                pass

            if mode == "matmul":
                m = splat_mat()
                allc = jnp.dot(row, m, preferred_element_type=jnp.float32)  # (1, 12*128)
                def sc(k):
                    return allc[0:1, 128 * k:128 * (k + 1)]

            acc = acc + sc(0) * x
            for k in range(1, 12):
                acc = acc + sc(k) * acc
            return acc

        o_ref[0] = jax.lax.fori_loop(0, ITERS, body, x * 0.0)

    return kernel


_splat = None


def splat_mat():
    # (128, 12*128): column block k has a 1 in row k
    m = np.zeros((128, 12 * 128), np.float32)
    for k in range(12):
        m[k, 128 * k:128 * (k + 1)] = 1.0
    return jnp.asarray(m)


def run(mode):
    tab = jnp.asarray(np.random.rand(64, 128).astype(np.float32) * 1e-3)
    x = jnp.asarray(np.random.rand(1, S, 128).astype(np.float32))
    f = pl.pallas_call(
        make_kernel(mode),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, S, 128), jnp.float32),
    )
    f = jax.jit(f)
    try:
        r = f(tab, x)
        jax.block_until_ready(r)
    except Exception as e:
        print(f"{mode:14s} FAILED: {str(e)[:160]}")
        return
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(tab, x))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{mode:14s} {best*1e3:8.2f} ms  {best/ITERS*1e9:8.1f} ns/step")


if __name__ == "__main__":
    modes = sys.argv[1:] or ["extract", "slice11", "barrier", "barrier_full", "matmul"]
    for m in modes:
        run(m)
