"""Pallas packet-traversal kernel — the TPU performance core.

Redesign of the reference's per-thread persistent traversal
(src/rt/kernels/kepler_dynamic_fetch.cu) around what the TPU is actually
good at.  Per-lane divergent traversal is hostile to XLA (per-lane gathers
run ~65x off HBM peak; per-iteration scatters of per-lane stacks worse), so
instead: **packet traversal**.

- A *packet* = one ray tile of shape (8, 128) = 1024 rays, Morton-ordered
  for coherence (the reference's PixelTable / mortonSort provide exactly
  this ordering).
- The whole packet shares ONE traversal: a scalar node cursor + a scalar
  stack in SMEM.  No per-lane gathers or scatters exist anywhere in the
  kernel.
- Node/triangle records are fetched from VMEM-resident tables by dynamic
  *sublane* slice.  VMEM tiles are (8, 128), so records are packed 8 per
  128-lane row (a [N,16] table would pad every record to 128 lanes and
  blow VMEM 8x); the in-row record is picked with a 7-step select chain.
- Every node visit slab-tests BOTH children against all 1024 rays on the
  VPU (the reference's spanBegin/End max-of-mins composition,
  CudaTracerKernels.hh:247-279).  A child is entered iff ANY ray hits it —
  the packet-level analogue of the SIMT warp vote — with automatic subtree
  culling as per-ray hitT tightens.
- Leaves iterate their (counted) Woop triangles, testing all rays at once
  (equations of kepler_dynamic_fetch.cu:334-370).
- anyHit retires rays via a mask; the packet exits when its stack empties
  (or every valid ray has a hit, for anyHit).

The tables live fully in VMEM: 64 B per node + 64 B per triangle record
(Woop rows padded 12 -> 16 floats), fitting ~150K-ref scenes (bunny
~12 MB).  Larger scenes currently fall back to the XLA wavefront tracer; a
two-level treelet-streaming variant is the planned extension.

Packet-leaf encoding: the canonical FlatBVH stores per-leaf counts out of
line (leaf_counts); this kernel wants the count recoverable from the link
alone, so the wrapper packs links as ``~(first | count << 24)``
(count < 256, first < 2^24) into a kernel-private node table.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_rt.core.types import FlatBVH, Hits, Rays

import os

# Rays per packet, shape (TILE/128, 128).  Larger packets amortize the
# per-node scalar work (fetch, extracts, reductions, stack) over more rays
# at the cost of a looser traversal union; 4096 measured best on v5e.
TILE = int(os.environ.get("TPU_RT_TILE", 4096))
assert TILE % 128 == 0
SUBLANES = TILE // 128
STACK_DEPTH = 64
SENT = np.int32(0x7FFFFFFF)
OOEPS = np.float32(2.0**-80)
COUNT_SHIFT = 24
FIRST_MASK = (1 << COUNT_SHIFT) - 1

# VMEM budget for the resident tables (out of ~16 MB physical, leaving room
# for ray blocks, outputs, and pipeline buffers).
VMEM_TABLE_BUDGET = 12 * 1024 * 1024


def _pack_rows_128(rows: np.ndarray, width: int) -> np.ndarray:
    """Pack [N, width<=16] records into a [ceil(N/8), 128] f32 table
    (record i at row i//8, lanes (i%8)*16 .. +16)."""
    n = rows.shape[0]
    padded = np.zeros((max(n, 1), 16), np.float32)
    padded[:n, :width] = rows[:, :width]
    flat = padded.reshape(-1)
    rem = (-flat.size) % 128
    if rem:
        flat = np.concatenate([flat, np.zeros(rem, np.float32)])
    return flat.reshape(-1, 128)


def pack_kernel_tables(flat: FlatBVH):
    """Kernel-private packed tables (nodes_pk, woop_pk) as [R,128] f32, or
    None if the scene violates packing limits (see module docstring)."""
    nodes = np.array(np.asarray(flat.nodes), np.float32, copy=True)
    links = np.ascontiguousarray(nodes[:, 12:16]).view(np.int32).copy()
    num_refs = int(np.asarray(flat.tri_woop).shape[0])
    if num_refs >= (1 << COUNT_SHIFT):
        return None
    for c in range(2):
        leaf = links[:, c] < 0
        first = ~links[leaf, c]
        count = links[leaf, 2 + c]
        if count.size and int(count.max(initial=0)) > 255:
            return None
        links[leaf, c] = ~(first | (count << COUNT_SHIFT))
    nodes[:, 12:16] = links.view(np.float32)
    nodes_pk = _pack_rows_128(nodes, 16)
    woop_pk = _pack_rows_128(np.asarray(flat.tri_woop, np.float32), 12)
    return nodes_pk, woop_pk


def tables_fit_vmem(flat: FlatBVH) -> bool:
    nodes_b = int(np.asarray(flat.nodes).shape[0]) * 64
    woop_b = int(np.asarray(flat.tri_woop).shape[0]) * 64
    return nodes_b + woop_b <= VMEM_TABLE_BUDGET


def _fetch_record(table_ref, idx):
    """Record `idx` from a packed [R,128] table -> (1,16) f32.

    One dynamic-sublane read + one dynamic lane rotate (tpu.DynamicRotate);
    measured ~3x cheaper than a where-select chain over the 8 slots."""
    row = table_ref[pl.ds(idx // 8, 1), :]  # (1,128)
    slot = idx % 8
    rolled = pltpu.roll(row, -slot * 16, axis=1)
    return rolled[:, 0:16]


def _packet_kernel(any_hit: bool,
                   nodes_ref, woop_ref,
                   ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmin_ref, tmax_ref,
                   hit_row_ref, hit_t_ref, hit_u_ref, hit_v_ref,
                   stack_ref):
    ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    tmin = tmin_ref[0]
    tmax = tmax_ref[0]

    def rcp_dir(d):
        safe = jnp.where(jnp.abs(d) > OOEPS, d, jnp.where(d >= 0, OOEPS, -OOEPS))
        return 1.0 / safe

    idirx, idiry, idirz = rcp_dir(dx), rcp_dir(dy), rcp_dir(dz)
    oodx, oody, oodz = ox * idirx, oy * idiry, oz * idirz

    valid = tmax >= 0.0  # degenerate rays (reference convention) never hit

    hit_row_ref[0] = jnp.full(ox.shape, -1, jnp.int32)
    hit_t_ref[0] = tmax
    hit_u_ref[0] = jnp.zeros(ox.shape, jnp.float32)
    hit_v_ref[0] = jnp.zeros(ox.shape, jnp.float32)

    start_node = jax.lax.select(jnp.any(valid), jnp.int32(0), SENT)

    def cond(state):
        node, sp, live = state
        return (node != SENT) & live

    def body(state):
        node, sp, live = state
        hit_t = hit_t_ref[0]

        def node_step(node, sp):
            row = _fetch_record(nodes_ref, node)  # (1,16)

            def sc(i):
                # Scalar extract; a (1,1)->(S,128) broadcast would be cheaper
                # but Mosaic can't broadcast sublanes and lanes in one op.
                return row[0, i]

            def span(lox, hix, loy, hiy, loz, hiz):
                tx0 = lox * idirx - oodx
                tx1 = hix * idirx - oodx
                ty0 = loy * idiry - oody
                ty1 = hiy * idiry - oody
                tz0 = loz * idirz - oodz
                tz1 = hiz * idirz - oodz
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), tmin),
                )
                far = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), hit_t),
                )
                return near, far

            c0min, c0max = span(sc(0), sc(1), sc(2), sc(3), sc(8), sc(9))
            c1min, c1max = span(sc(4), sc(5), sc(6), sc(7), sc(10), sc(11))
            m0 = (c0max >= c0min) & valid
            m1 = (c1max >= c1min) & valid

            # Mosaic only bitcasts vectors: reinterpret the whole row, then
            # extract the link scalars.
            irow = jax.lax.bitcast_convert_type(row, jnp.int32)  # (1,16)
            link0 = irow[0, 12]
            link1 = irow[0, 13]

            # Near-first at packet granularity: minimum entry distance over
            # the rays hitting each child.  The min-reduction doubles as the
            # packet vote: child hit iff its masked min stays below `big`.
            big = jnp.float32(3.0e38)
            near0 = jnp.min(jnp.where(m0, c0min, big))
            near1 = jnp.min(jnp.where(m1, c1min, big))
            any0 = near0 < big
            any1 = near1 < big
            swap = any0 & any1 & (near1 < near0)
            first = jnp.where(swap, link1, jnp.where(any0, link0, link1))
            second = jnp.where(swap, link0, link1)

            both = any0 & any1
            sp_w = jnp.minimum(sp, STACK_DEPTH - 1)
            stack_ref[sp_w] = jnp.where(both, second, stack_ref[sp_w])
            sp = sp + both.astype(jnp.int32)

            none = ~(any0 | any1)
            sp_after = jnp.where(none, sp - 1, sp)
            popped = stack_ref[jnp.clip(sp_after, 0, STACK_DEPTH - 1)]
            popped = jnp.where(sp_after < 0, SENT, popped)
            node = jnp.where(none, popped, first)
            sp = jnp.maximum(sp_after, 0)
            return node, sp

        def leaf_step(node, sp):
            enc = ~node
            first = enc & FIRST_MASK
            count = (enc >> COUNT_SHIFT) & 0xFF
            last = first + count - 1

            # One row fetch covers 8 consecutive records; leaves (<=8 tris,
            # stored contiguously) span at most 2 rows.  Per-slot tests are
            # statically unrolled and branch-guarded so only real triangles
            # pay compute, and every triangle constant enters as a (1,1)
            # lane broadcast -- the leaf phase has NO vector->scalar moves.
            def row_body(r, _):
                wrow = woop_ref[pl.ds(r, 1), :]  # (1,128)
                for j in range(8):
                    m = r * 8 + j

                    @pl.when((m >= first) & (m <= last))
                    def _():
                        def sw(i):
                            return wrow[0, 16 * j + i]

                        oz_t = sw(3) - ox * sw(0) - oy * sw(1) - oz * sw(2)
                        dz_t = dx * sw(0) + dy * sw(1) + dz * sw(2)
                        t = oz_t / dz_t
                        ox_t = sw(7) + ox * sw(4) + oy * sw(5) + oz * sw(6)
                        dx_t = dx * sw(4) + dy * sw(5) + dz * sw(6)
                        u = ox_t + t * dx_t
                        oy_t = sw(11) + ox * sw(8) + oy * sw(9) + oz * sw(10)
                        dy_t = dx * sw(8) + dy * sw(9) + dz * sw(10)
                        v = oy_t + t * dy_t

                        cur_t = hit_t_ref[0]
                        if any_hit:
                            ok = valid & (hit_row_ref[0] < 0)
                        else:
                            ok = valid
                        ok = ok & (t > tmin) & (t < cur_t) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                        hit_t_ref[0] = jnp.where(ok, t, cur_t)
                        hit_row_ref[0] = jnp.where(ok, m, hit_row_ref[0])
                        hit_u_ref[0] = jnp.where(ok, u, hit_u_ref[0])
                        hit_v_ref[0] = jnp.where(ok, v, hit_v_ref[0])
                return 0

            jax.lax.fori_loop(first // 8, last // 8 + 1, row_body, 0)

            sp_after = sp - 1
            popped = stack_ref[jnp.clip(sp_after, 0, STACK_DEPTH - 1)]
            popped = jnp.where(sp_after < 0, SENT, popped)
            return popped, jnp.maximum(sp_after, 0)

        node, sp = jax.lax.cond(node >= 0, node_step, leaf_step, node, sp)

        if any_hit:
            live = jnp.any(valid & (hit_row_ref[0] < 0))
        else:
            live = jnp.bool_(True)
        return node, sp, live

    jax.lax.while_loop(cond, body, (start_node, jnp.int32(0), jnp.bool_(True)))


@partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _trace_packets_jit(nodes_pk, woop_pk, tri_index, rays: Rays, any_hit: bool, interpret: bool):
    """Fully-jitted trace: pad/tile/kernel/unpad/remap in ONE dispatch (the
    eager wrapper ops each cost a tunnel round-trip on the axon platform)."""
    n = rays.origin.shape[0]
    t = max(1, -(-n // TILE))
    pad = t * TILE - n

    def prep(x, fill):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, jnp.float32)])
        return x.reshape(t, SUBLANES, 128)

    rays8 = {
        "ox": prep(rays.origin[:, 0], 0.0),
        "oy": prep(rays.origin[:, 1], 0.0),
        "oz": prep(rays.origin[:, 2], 0.0),
        "dx": prep(rays.dirn[:, 0], 1.0),
        "dy": prep(rays.dirn[:, 1], 0.0),
        "dz": prep(rays.dirn[:, 2], 0.0),
        "tmin": prep(rays.tmin, 0.0),
        "tmax": prep(rays.tmax, -1.0),  # padding rays are degenerate
    }
    hit_row, hit_t, hit_u, hit_v = _trace_packets(nodes_pk, woop_pk, rays8, any_hit, interpret)
    hit_row = hit_row.reshape(-1)[:n]
    num_refs = tri_index.shape[0]
    tri = jnp.where(
        hit_row >= 0,
        tri_index[jnp.clip(hit_row, 0, max(0, num_refs - 1))],
        jnp.int32(-1),
    )
    return Hits(
        tri=tri,
        t=hit_t.reshape(-1)[:n],
        u=hit_u.reshape(-1)[:n],
        v=hit_v.reshape(-1)[:n],
    )


def _trace_packets(nodes_pk, woop_pk, rays8, any_hit: bool, interpret: bool):
    t = rays8["ox"].shape[0]
    ray_spec = pl.BlockSpec((1, SUBLANES, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((t, SUBLANES, 128), jnp.int32),
        jax.ShapeDtypeStruct((t, SUBLANES, 128), jnp.float32),
        jax.ShapeDtypeStruct((t, SUBLANES, 128), jnp.float32),
        jax.ShapeDtypeStruct((t, SUBLANES, 128), jnp.float32),
    ]
    return pl.pallas_call(
        partial(_packet_kernel, any_hit),
        grid=(t,),
        in_specs=[table_spec, table_spec] + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(
        nodes_pk, woop_pk,
        rays8["ox"], rays8["oy"], rays8["oz"],
        rays8["dx"], rays8["dy"], rays8["dz"],
        rays8["tmin"], rays8["tmax"],
    )


def trace_packet_pallas(flat: FlatBVH, rays: Rays, any_hit: bool = False,
                        tables=None, interpret: bool = False) -> Hits:
    """Host wrapper: tile rays into packets, run the kernel, unpad.

    tables: optional pre-packed (nodes_pk, woop_pk) from pack_kernel_tables
    (device-resident) to skip per-call packing.
    """
    if tables is None:
        packed = pack_kernel_tables(flat)
        if packed is None:
            raise ValueError("scene exceeds packet-kernel packing limits")
        tables = (jnp.asarray(packed[0]), jnp.asarray(packed[1]))
    nodes_pk, woop_pk = tables
    return _trace_packets_jit(
        nodes_pk, woop_pk, jnp.asarray(flat.tri_index), rays, any_hit, interpret
    )
