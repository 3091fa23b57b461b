#!/usr/bin/env python
"""Probe the per-step cost components of the packet traversal kernel."""
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
ITERS = 100000


def make_kernel(mode):
    def kernel(tab_ref, x_ref, o_ref, stack_ref):
        x = x_ref[0]

        def body(i, carry):
            acc, node = carry
            if mode == "empty":
                return acc + 1.0, node + 1

            if mode == "fetch_roll":
                row = tab_ref[pl.ds(node // 8, 1), :]
                rolled = pltpu.roll(row, -(node % 8) * 16, axis=1)
                r = rolled[:, 0:16]
                acc = acc + r[0, 0]
                return acc, node + 1

            if mode == "fetch_ds":
                row = tab_ref[pl.ds(node % 64, 1), :]
                acc = acc + row[0, 0]
                return acc, node + 1

            if mode == "reduce2":
                m = jnp.min(jnp.where(acc > 0.5, acc, 3e38))
                m2 = jnp.min(jnp.where(acc < 0.5, acc, 3e38))
                node = node + (m < m2).astype(jnp.int32)
                return acc + 1.0, node

            if mode == "stack":
                sp = node % 60
                stack_ref[sp] = node
                p = stack_ref[jnp.clip(sp - 1, 0, 63)]
                return acc + 1.0, node + 1 + p - p

            if mode == "cond":
                def a(n):
                    return n + 1

                def b(n):
                    return n + 2

                node = jax.lax.cond(node % 2 == 0, a, b, node)
                return acc + 1.0, node

            if mode == "vec12":
                row = tab_ref[pl.ds(node % 64, 1), :]
                def sc(k):
                    return row[0, k]
                for k in range(12):
                    acc = acc + sc(k) * acc * 1e-6
                return acc, node + 1

            if mode == "node_step":
                # full realistic node step
                row = tab_ref[pl.ds(node // 8, 1), :]
                rolled = pltpu.roll(row, -(node % 8) * 16, axis=1)
                r = rolled[:, 0:16]
                def sc(k):
                    return r[0, k]
                near = jnp.maximum(jnp.maximum(jnp.minimum(sc(0) * acc, sc(1) * acc),
                                               jnp.minimum(sc(2) * acc, sc(3) * acc)),
                                   jnp.minimum(sc(8) * acc, sc(9) * acc))
                far = jnp.minimum(jnp.minimum(jnp.maximum(sc(4) * acc, sc(5) * acc),
                                              jnp.maximum(sc(6) * acc, sc(7) * acc)),
                                  jnp.maximum(sc(10) * acc, sc(11) * acc))
                big = jnp.float32(3e38)
                n0 = jnp.min(jnp.where(far >= near, near, big))
                n1 = jnp.min(jnp.where(far < near, far, big))
                any0 = n0 < big
                any1 = n1 < big
                both = any0 & any1
                sp = node % 60
                stack_ref[sp] = jnp.where(both, node, stack_ref[sp])
                nxt = jnp.where(any0, node * 2 + 1, stack_ref[jnp.clip(sp, 0, 63)])
                return acc + 1e-9, (nxt % 4096) + 1

        final = jax.lax.fori_loop(0, ITERS, body, (x, jnp.int32(1)))
        o_ref[0] = final[0]

    return kernel


def run(mode, iters_list=(100000, 1000000)):
    tab = jnp.asarray(np.random.rand(64, 128).astype(np.float32) * 1e-3)
    x = jnp.asarray(np.random.rand(1, S, 128).astype(np.float32))
    f = pl.pallas_call(
        make_kernel(mode),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, S, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
    )
    raise RuntimeError("use run2")


if __name__ == "__main__":
    modes = sys.argv[1:] or ["empty", "fetch_ds", "fetch_roll", "reduce2", "stack",
                             "cond", "vec12", "node_step"]
    for m in modes:
        run(m)
