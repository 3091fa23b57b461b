#!/usr/bin/env python
"""Round-3 primitive microbenchmarks on the real TPU chip.

Measures the device cost of the binning primitives the two-phase
(treelet re-binning) traversal needs per frame.  block_until_ready does
NOT fence through the tunneled platform; only a device-scalar readback
does, and each dispatch costs 10s of ms.  So every op is timed by SLOPE:
one jit per chain length k (the op applied k times with a data
dependency), scalar readback, cost = (t_k2 - t_k1) / (k2 - k1).

Run: python tools/microbench_r3.py
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
from jax import lax

K1, K2 = 1, 5


def slope_time(make_chain, *args, reps=2):
    """make_chain(k) -> jitted fn(*args) returning a scalar after k
    dependent applications.  Returns seconds per application."""
    f1, f2 = make_chain(K1), make_chain(K2)
    int(f1(*args))  # compile + warm
    int(f2(*args))

    def best(f):
        b = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            int(f(*args))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(f2) - best(f1)) / (K2 - K1)


def main():
    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)

    # --- sort (key int32, value int32) ---
    for n in [1 << 20, 1 << 22]:
        keys = jnp.asarray(rng.integers(0, 512, n, dtype=np.int32))
        vals = jnp.arange(n, dtype=jnp.int32)

        def mk(k):
            @jax.jit
            def f(ks, vs):
                acc = jnp.int32(0)
                for _ in range(k):
                    sk, sv = lax.sort((ks ^ (acc & 1), vs), num_keys=1)
                    acc = acc + sv[0] + sk[-1]
                return acc
            return f

        t = slope_time(mk, keys, vals)
        print(f"sort kv n={n>>20}M: {t*1e3:.2f} ms ({n/t/1e6:.0f} Mkeys/s)")

    # --- batched sort: 32 windows x 128K ---
    n = 1 << 22
    keys = jnp.asarray(rng.integers(0, 512, n, dtype=np.int32)).reshape(32, -1)
    vals = jnp.broadcast_to(jnp.arange(n // 32, dtype=jnp.int32),
                            (32, n // 32))

    def mkb(k):
        @jax.jit
        def f(ks, vs):
            acc = jnp.int32(0)
            for _ in range(k):
                sk, sv = lax.sort((ks ^ (acc & 1), vs), dimension=1,
                                  num_keys=1)
                acc = acc + sv[0, 0] + sk[-1, -1]
            return acc
        return f

    t = slope_time(mkb, keys, vals)
    print(f"sort kv batched 32x128K: {t*1e3:.2f} ms ({n/t/1e6:.0f} Mkeys/s)")

    # --- multi-operand sort: key + 9 f32 payloads ---
    n = 1 << 21
    keys = jnp.asarray(rng.integers(0, 512, n, dtype=np.int32))
    pay = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(9)]

    def mkm(k):
        @jax.jit
        def f(ks, *ps):
            acc = jnp.int32(0)
            for _ in range(k):
                out = lax.sort((ks ^ (acc & 1), *ps), num_keys=1)
                acc = acc + jnp.int32(out[1][0] * 0) + out[0][-1]
            return acc
        return f

    t = slope_time(mkm, keys, *pay)
    print(f"sort k+9xf32 n={n>>20}M: {t*1e3:.2f} ms")

    # --- permutation gather ---
    for n in [786432, 1 << 21]:
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))
        mat = jnp.asarray(rng.random((n, 8), dtype=np.float32))
        comps = [jnp.asarray(mat[:, i]) for i in range(8)]

        def mkg(k):
            @jax.jit
            def f(p, *cs):
                acc = jnp.float32(0)
                for _ in range(k):
                    pp = p ^ (jnp.int32(acc) & 0)
                    taken = [c[pp] for c in cs]
                    acc = acc + taken[0][0] + taken[-1][-1]
                return acc
            return f

        t = slope_time(mkg, perm, *comps)
        mb = n * 8 * 4 / 1e6
        print(f"take 8x(N,) f32 n={n}: {t*1e3:.2f} ms ({mb/t/1e3:.1f} GB/s)")

        def mkg2(k):
            @jax.jit
            def f(p, m):
                acc = jnp.float32(0)
                for _ in range(k):
                    pp = p ^ (jnp.int32(acc) & 0)
                    tk = m[pp]
                    acc = acc + tk[0, 0] + tk[-1, -1]
                return acc
            return f

        t2 = slope_time(mkg2, perm, mat)
        print(f"take (N,8) f32 n={n}: {t2*1e3:.2f} ms ({mb/t2/1e3:.1f} GB/s)")

    # --- permutation scatter set ---
    n = 1 << 21
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    x = jnp.asarray(rng.random(n, dtype=np.float32))

    def mks(k):
        @jax.jit
        def f(p, v):
            acc = jnp.float32(0)
            for _ in range(k):
                out = jnp.zeros_like(v).at[p ^ (jnp.int32(acc) & 0)].set(v)
                acc = acc + out[0] + out[-1]
            return acc
        return f

    t = slope_time(mks, perm, x)
    print(f"scatter set (N,) n={n>>20}M: {t*1e3:.2f} ms")

    # --- scatter-min (combine pair results per ray) ---
    def mksm(k):
        @jax.jit
        def f(p, v):
            acc = jnp.float32(0)
            for _ in range(k):
                out = jnp.full_like(v, 1e9).at[p ^ (jnp.int32(acc) & 0)].min(v)
                acc = acc + out[0] + out[-1]
            return acc
        return f

    t = slope_time(mksm, perm, x)
    print(f"scatter min (N,) n={n>>20}M: {t*1e3:.2f} ms")

    # --- cumsum ---
    n = 1 << 22
    m = jnp.asarray((rng.random(n) < 0.3))

    def mkc(k):
        @jax.jit
        def f(b):
            acc = jnp.int32(0)
            for _ in range(k):
                c = jnp.cumsum(b.astype(jnp.int32) + (acc & 0))
                acc = acc + c[-1]
            return acc
        return f

    t = slope_time(mkc, m)
    print(f"cumsum (N,) n={n>>20}M: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
