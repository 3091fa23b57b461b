"""Branch-free interleaved packet-traversal kernel (the TPU hot loop).

Redesign of the reference's persistent-threads traversal
(src/rt/kernels/kepler_dynamic_fetch.cu:66-411).  Four measured findings
on v5e drive the architecture (tools/mosaic_probe*.py):

1. **The scalar port saturates first.**  A traversal step that extracts
   the 12 node bounds to scalars costs ~160 ns even with 8 packets in
   flight; the same math with bounds kept as (S,1) sublane slices
   lane-broadcast against (S,128) ray vectors costs ~28 ns.  So tables
   are stored TRANSPOSED (record floats on sublanes) and no per-bound
   vector->scalar move exists anywhere.

2. **A single traversal chain is latency-bound** (~370 ns/step: fetch ->
   span -> reduce -> next fetch cannot pipeline).  K independent packets
   advance per loop iteration so their chains overlap — the TPU analogue
   of persistent warps hiding latency, with the atomic work queue
   replaced by a static packet->iteration assignment.

3. **Branches defeat the interleave.**  One `lax.cond` around the step
   doubles its cost (134 -> 261 ns measured): basic-block boundaries stop
   the VLIW scheduler from overlapping the packets' chains.  The kernel
   is therefore STRAIGHT-LINE: every iteration executes one masked node
   step and U masked triangle tests per packet.  Leaves found during
   traversal are not processed inline; they are pushed to a per-packet
   SMEM ring queue and drained by the triangle units, so the traversal
   stack holds only inner nodes and every select stays branchless.
   (Deferring leaves relaxes strict near-first hit_t tightening; the
   traversal stays correct because hit_t pruning is conservative.)

4. **Packet votes replace per-lane ballots**: one masked min-reduction
   per child doubles as the `vote.ballot` (kepler_dynamic_fetch.cu:
   287-316) and the near-first ordering key.

Layouts (built host-side by pack_tables2):
- nodes3: (ceil(N/128), 16, 128) f32 — node n's record at
  [n//128, :, n%128]: slots 0-11 the Compact2 child bounds
  (CudaBVH.cc:270-357 ordering), slots 12/13 child links (int32 bits),
  inner = child node index, leaf = ~(first | count<<24); slot 14 the
  split-axis ordering hint.  With bf16_nodes=True the record is
  (ceil(N/128), 8, 128) int32 — 32 B/node — see the pack_tables2
  docstring.
- woop3: same transposition of the Woop triangle records
  (CudaBVH.cc:361-380); hit rows remap through flat.tri_index.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_rt.core.types import FlatBVH, Hits, Rays

# Rays per packet: (S, 128); K packets advance per iteration; U triangle
# tests per packet per iteration (tri steps outnumber node steps ~2:1).
# Defaults come from env; all are per-call static config so sweeps
# (in-process overrides).  U=3/K=4/TILE=2048 measured best on
# v5e for VMEM-resident tables.
TILE = int(os.environ.get("TPU_RT_TILE2", 2048))
# K=2 re-measured best across vmem scenes after the fused-I/O layout
# (round 3, chain=32: bunny +24%, sponza +10%, knob +10% over the old
# K=4 optimum — the fused single-DMA grid step shifted the knee).
K = int(os.environ.get("TPU_RT_K", 2))
U = int(os.environ.get("TPU_RT_U", 3))
# C parallel leaf cursors per packet.  Leaf visits bind the iteration
# count (bunny: ~215 leaf-visit steps vs ~100 node steps per packet, and
# the mean leaf holds ~3 refs so U>3 cannot reduce steps); C cursors
# drain C queue entries per iteration, cutting tri-step iterations ~C x
# for one extra fetch+roll + U tri units each.
C = int(os.environ.get("TPU_RT_C", 1))
# MXU triangle unit (round-1 roadmap #1): the 6 Woop dot products per
# (ray, candidate) become one L(48,10) @ R(10,TILE) matmul per packet
# per iteration, with U pinned to 8 = MAX_LEAF so a whole leaf drains in
# one iteration.  MEASURED SLOWER than the VPU path and therefore OFF by
# default (tools/mxu_ablate.py, v5e): the matmul alone costs ~210 ns per
# packet-step and the (8,TILE)-layout epilogue roughly doubles the VPU
# epilogue's issue count, while the mean leaf holds only ~3 refs — so
# whole-leaf drain wastes most of the 8-wide matmul.  The kernel is
# vector-ISSUE-bound, and the MXU path issues more, not less.  Kept as
# an opt-in mode for wide-leaf scenes (TPU_RT_MXU=1).
MXU = os.environ.get("TPU_RT_MXU", "0") != "0"
assert TILE % 128 == 0
STACK_DEPTH = 64
# Leaf ring-queue depth.  Also the closest-hit pruning LAG bound: a
# queued leaf's triangles are tested up to ~QUEUE_DEPTH/U iterations
# after discovery, during which hit_t is looser than it could be —
# smaller depths force draining (backpressure stalls the node unit)
# and tighten pruning sooner, at the cost of idle node slots.
QUEUE_DEPTH = int(os.environ.get("TPU_RT_QD", 64))
SENT = np.int32(0x7FFFFFFF)
OOEPS = np.float32(2.0**-80)
COUNT_SHIFT = 24
FIRST_MASK = (1 << COUNT_SHIFT) - 1
MAX_LEAF = 8

VMEM_TABLE_BUDGET = 12 * 1024 * 1024


def _bf16_round_dir(x: np.ndarray, up: bool) -> np.ndarray:
    """Directed f32 -> bf16 rounding as uint16 bit patterns: up=False
    rounds toward -inf, up=True toward +inf, so bf16 node bounds are
    OUTWARD-rounded (lo <= true lo, hi >= true hi) and every slab test
    against them is conservative — hit results are exactly preserved
    (triangle tests stay f32)."""
    x = np.ascontiguousarray(x, np.float32)
    b = x.view(np.uint32)
    tr = (b >> 16).astype(np.uint16)          # truncate-toward-zero bf16
    trf = (tr.astype(np.uint32) << 16).view(np.float32)
    sign = (tr & np.uint16(0x8000)) != 0
    if up:
        need = trf < x
        adj = np.where(sign, tr - np.uint16(1), tr + np.uint16(1))
    else:
        need = trf > x
        adj = np.where(sign, tr + np.uint16(1), tr - np.uint16(1))
    return np.where(need, adj, tr).astype(np.uint16)


def pack_tables2(flat: FlatBVH, bf16_nodes: bool = False):
    """Transposed kernel tables (nodes3, woop3, tri_index2) or None if the
    scene violates packing limits (count<=8 per leaf, refs < 2^24).

    bf16_nodes=True emits the node table as (NB, 8, 128) int32
    (32 B/node instead of 64): slots 0-5 pack the 12 outward-rounded
    bf16 bound BIT PATTERNS two-per-int32 (bound 2j in the low half of
    slot j, bound 2j+1 in the high half — widening bf16->f32 is then
    just `slot << 16` / `slot & 0xFFFF0000` plus a bitcast), slots 6-7
    the two int32 child links verbatim, with the 3-bit split-axis hint
    stuffed into bits 28-30 of link0 (free in both encodings: inner
    links are < 2^24 node indices and leaf links ~(first|count<<24)
    always carry 111 there).  The table stays integer-typed end to end:
    a bfloat16-typed table corrupts link halves that alias NaN patterns
    (float ops canonicalize payloads) and Mosaic has no 16-bit dynamic
    rotate; int32 carries the same bits with full op support.  This is
    the TPU analog of the reference keeping nodes resident in the
    texture cache (CudaTracerKernels.hh:185-187): dragon-class node
    sets (301K x 32 B = 9.6 MB) drop inside the VMEM budget, enabling
    true mixed residency, and hairball-class streams half the bytes.

    Leaf triangle runs are re-packed contiguously, never crossing a
    128-lane block, so a leaf's triangles are consecutive records.
    Fully vectorized (round-2 review: the per-leaf python loop was ~2M
    iterations for hairball-class scenes): leaves are bucketed by
    triangle count — a count-c bucket packs floor(128/c) leaves per
    128-lane block with <1% lane waste — and all triangle moves are one
    gather/scatter pair."""
    nodes = np.array(np.asarray(flat.nodes), np.float32, copy=True)
    links = np.ascontiguousarray(nodes[:, 12:16]).view(np.int32).copy()
    woop = np.asarray(flat.tri_woop, np.float32)
    tri_index = np.asarray(flat.tri_index, np.int32)
    num_refs = woop.shape[0]
    if num_refs >= (1 << COUNT_SHIFT):
        return None

    # Leaf children of every node, child-0 rows first (order is layout
    # cosmetics only; the kernel follows links).
    ln0, ln1 = np.where(links[:, 0] < 0)[0], np.where(links[:, 1] < 0)[0]
    leaf_node = np.concatenate([ln0, ln1])
    leaf_child = np.concatenate([np.zeros(ln0.size, np.int64),
                                 np.ones(ln1.size, np.int64)])
    leaf_first = ~links[leaf_node, leaf_child]
    leaf_count = links[leaf_node, 2 + leaf_child].astype(np.int64)
    if leaf_count.size and leaf_count.max(initial=0) > MAX_LEAF:
        return None

    # Bucket by count; count-0 (empty) leaves keep first=0.
    new_first = np.zeros(leaf_count.shape[0], np.int64)
    base = 0
    for c in range(1, MAX_LEAF + 1):
        sel = np.flatnonzero(leaf_count == c)
        if sel.size == 0:
            continue
        per_block = 128 // c
        j = np.arange(sel.size)
        new_first[sel] = base + (j // per_block) * 128 + (j % per_block) * c
        base += -(-sel.size // per_block) * 128
    total = max(base, 1)
    if total >= (1 << COUNT_SHIFT):
        return None
    links[leaf_node, leaf_child] = ~(new_first
                                     | (leaf_count << COUNT_SHIFT)).astype(
                                         np.int64).astype(np.int32)

    # One gather/scatter for all triangle records (ragged arange trick).
    csum = np.zeros(leaf_count.shape[0] + 1, np.int64)
    np.cumsum(leaf_count, out=csum[1:])
    ntri = int(csum[-1])
    within = np.arange(ntri) - np.repeat(csum[:-1], leaf_count)
    src = np.repeat(leaf_first, leaf_count) + within
    dst = np.repeat(new_first, leaf_count) + within
    woop2 = np.zeros((total, woop.shape[1]), np.float32)
    tri_index2 = np.full(total, -1, np.int32)
    woop2[dst] = woop[src]
    tri_index2[dst] = tri_index[src]
    # Slot 12 of each Woop record carries the ORIGINAL triangle id
    # (bit-pattern), so the kernel emits final ids directly and no
    # hit-row remap gather is needed downstream.
    woop16 = np.zeros((woop2.shape[0], 16), np.float32)
    woop16[:, :woop2.shape[1]] = woop2
    woop16[:, 12] = tri_index2.view(np.float32)
    # Slot 14 (free once counts are folded into the links) encodes the
    # traversal-order hint: split axis = argmax child-center separation,
    # bit 2 = "child0 is on the lower side".  The kernel orders children
    # by packet direction sign vs this hint — no float min-reduction of
    # entry distances is needed (kepler_dynamic_fetch.cu:304-308 compares
    # per-lane c0min/c1min instead; a packet only has one shared cursor).
    c0 = np.stack([(nodes[:, 0] + nodes[:, 1]),
                   (nodes[:, 2] + nodes[:, 3]),
                   (nodes[:, 8] + nodes[:, 9])], axis=1)
    c1 = np.stack([(nodes[:, 4] + nodes[:, 5]),
                   (nodes[:, 6] + nodes[:, 7]),
                   (nodes[:, 10] + nodes[:, 11])], axis=1)
    sep = c1 - c0
    axis = np.argmax(np.abs(sep), axis=1).astype(np.int32)
    c0_lower = (np.take_along_axis(sep, axis[:, None], 1)[:, 0]
                >= 0).astype(np.int32)
    hint = (axis | (c0_lower << 2)).astype(np.int32)
    links[:, 2] = hint
    nodes[:, 12:16] = links.view(np.float32)

    def transpose3(rows: np.ndarray, width: int = 16) -> np.ndarray:
        n = rows.shape[0]
        padded = np.zeros((max(n, 1), width), rows.dtype)
        padded[:n, :rows.shape[1]] = rows[:, :width]
        nb = -(-padded.shape[0] // 128)
        full = np.zeros((nb * 128, width), rows.dtype)
        full[:padded.shape[0]] = padded
        return np.ascontiguousarray(
            full.reshape(nb, 128, width).transpose(0, 2, 1))

    if bf16_nodes:
        if nodes.shape[0] >= (1 << COUNT_SHIFT):
            return None  # inner links must fit the 24-bit field
        u16 = np.zeros((nodes.shape[0], 12), np.uint16)
        lo_slots = [0, 2, 4, 6, 8, 10]
        hi_slots = [1, 3, 5, 7, 9, 11]
        u16[:, lo_slots] = _bf16_round_dir(nodes[:, lo_slots], up=False)
        u16[:, hi_slots] = _bf16_round_dir(nodes[:, hi_slots], up=True)
        l0, l1 = links[:, 0], links[:, 1]
        l0s = (np.where(l0 < 0, l0 & np.int32(~0x70000000), l0)
               | (hint << 28))
        i32 = np.zeros((nodes.shape[0], 8), np.int32)
        i32[:, 0:6] = (u16[:, 0::2].astype(np.uint32)
                       | (u16[:, 1::2].astype(np.uint32) << 16)
                       ).view(np.int32)
        i32[:, 6] = l0s
        i32[:, 7] = l1
        nodes_t = transpose3(i32, 8)
    else:
        nodes_t = transpose3(nodes)
    return nodes_t, transpose3(woop16)


def pack_tables4(quad) -> tuple[np.ndarray, np.ndarray] | None:
    """Transposed kernel tables for a QuadBVH (bvh/collapse.py):
    nodes4 (NB, 32, 128) f32 — node q's record at [q//128, :, q%128],
    slots 0-23 the four children's bounds, 24-27 links (int32 bits),
    28 the order-axis hint; woop like pack_tables2 with leaf runs
    re-packed contiguously (count <= MAX_LEAF4 = 16 per leaf, never
    crossing a 128-lane block).  None if packing limits are exceeded."""
    nodes = np.array(np.asarray(quad.nodes), np.float32, copy=True)
    links = np.ascontiguousarray(nodes[:, 24:28]).view(np.int32).copy()
    woop = np.asarray(quad.tri_woop, np.float32)
    tri_index = np.asarray(quad.tri_index, np.int32)
    if woop.shape[0] >= (1 << COUNT_SHIFT):
        return None
    if nodes.shape[0] >= (1 << COUNT_SHIFT):
        return None

    leaf_node, leaf_child = np.where((links < 0))
    enc = ~links[leaf_node, leaf_child]
    leaf_first = (enc & FIRST_MASK).astype(np.int64)
    leaf_count = ((enc >> COUNT_SHIFT) & 0xFF).astype(np.int64)
    # A leaf run must fit one 128-lane block (it may not cross blocks),
    # and (first | count<<24) must stay below 2^31 for the ~ encoding.
    max_leaf = int(leaf_count.max(initial=0))
    if max_leaf > 127:
        return None

    new_first = np.zeros(leaf_count.shape[0], np.int64)
    base = 0
    for c in range(1, max_leaf + 1):
        sel = np.flatnonzero(leaf_count == c)
        if sel.size == 0:
            continue
        per_block = 128 // c
        j = np.arange(sel.size)
        new_first[sel] = base + (j // per_block) * 128 + (j % per_block) * c
        base += -(-sel.size // per_block) * 128
    total = max(base, 1)
    if total >= (1 << COUNT_SHIFT):
        return None
    links[leaf_node, leaf_child] = ~(
        new_first | (leaf_count << COUNT_SHIFT)).astype(np.int64).astype(
            np.int32)

    csum = np.zeros(leaf_count.shape[0] + 1, np.int64)
    np.cumsum(leaf_count, out=csum[1:])
    ntri = int(csum[-1])
    within = np.arange(ntri) - np.repeat(csum[:-1], leaf_count)
    src = np.repeat(leaf_first, leaf_count) + within
    dst = np.repeat(new_first, leaf_count) + within
    woop2 = np.zeros((total, woop.shape[1]), np.float32)
    tri_index2 = np.full(total, -1, np.int32)
    woop2[dst] = woop[src]
    tri_index2[dst] = tri_index[src]
    woop16 = np.zeros((woop2.shape[0], 16), np.float32)
    woop16[:, :woop2.shape[1]] = woop2
    woop16[:, 12] = tri_index2.view(np.float32)

    nodes[:, 24:28] = links.view(np.float32)

    def transpose3(rows: np.ndarray, width: int) -> np.ndarray:
        n = rows.shape[0]
        padded = np.zeros((max(n, 1), width), rows.dtype)
        padded[:n, :rows.shape[1]] = rows[:, :width]
        nb = -(-padded.shape[0] // 128)
        full = np.zeros((nb * 128, width), rows.dtype)
        full[:padded.shape[0]] = padded
        return np.ascontiguousarray(
            full.reshape(nb, 128, width).transpose(0, 2, 1))

    return transpose3(nodes, 32), transpose3(woop16, 16)


def tables2_fit_vmem(flat: FlatBVH) -> bool:
    nodes_b = int(np.asarray(flat.nodes).shape[0]) * 64
    woop_b = int(np.asarray(flat.tri_woop).shape[0]) * 64
    return nodes_b + woop_b <= VMEM_TABLE_BUDGET


def choose_node_format(flat: FlatBVH) -> tuple[str, bool]:
    """(residency, bf16_nodes) policy: prefer residency upgrades first,
    f32 nodes second (bf16 costs ~6 extra scalar decode ops per step,
    so it is only chosen when it moves a table into VMEM or shrinks a
    streamed transfer): vmem-f32 > vmem-bf16 > mixed-f32 > mixed-bf16 >
    hbm-bf16."""
    n_nodes = int(np.asarray(flat.nodes).shape[0])
    woop_b = int(np.asarray(flat.tri_woop).shape[0]) * 64
    if n_nodes * 64 + woop_b <= VMEM_TABLE_BUDGET:
        return "vmem", False
    if n_nodes * 32 + woop_b <= VMEM_TABLE_BUDGET:
        return "vmem", True
    if n_nodes * 64 <= VMEM_TABLE_BUDGET:
        return "mixed", False
    if n_nodes * 32 <= VMEM_TABLE_BUDGET:
        return "mixed", True
    # Fully streamed: bf16 decode costs more than the halved (latency-
    # bound) per-record DMA saves — measured dragon 4.32 vs 4.80 and
    # hairball 2.43 vs 2.48 Mray/s (round 4).  Stay f32.
    return "hbm", False


def tables2_residency(flat: FlatBVH, bf16_nodes: bool = False) -> str:
    """Auto table placement: "vmem" (both resident), "mixed" (nodes
    resident, triangles DMA-streamed — node fetches are the traversal
    critical path, triangle blocks prefetch behind the leaf queue), or
    "hbm" (both streamed)."""
    node_rec = 32 if bf16_nodes else 64
    nodes_b = int(np.asarray(flat.nodes).shape[0]) * node_rec
    woop_b = int(np.asarray(flat.tri_woop).shape[0]) * 64
    if nodes_b + woop_b <= VMEM_TABLE_BUDGET:
        return "vmem"
    if nodes_b <= VMEM_TABLE_BUDGET:
        return "mixed"
    return "hbm"


def _residency_flags(hbm) -> tuple[bool, bool]:
    """(nodes_hbm, tris_hbm) from a residency mode (str/bool)."""
    if isinstance(hbm, str):
        return {"vmem": (False, False), "mixed": (False, True),
                "hbm": (True, True)}[hbm]
    return (bool(hbm), bool(hbm))


def _flat_to_rows(x, S):
    """Relayout (1, S*128) -> (S, 128) via static lane slices + sublane
    concat (Mosaic rejects the equivalent reshape as an unsupported shape
    cast; whole-vreg slices + concat lower to register moves)."""
    return jnp.concatenate(
        [x[:, 128 * s:128 * (s + 1)] for s in range(S)], axis=0)


def _fetch_col_block(table_ref, idx):
    """Record `idx` from a transposed (NB,16,128) table, lane-rotated so
    the record is lane 0: one dynamic-sublane block fetch + one rotate."""
    blk = table_ref[idx // 128]  # (16,128)
    return pltpu.roll(blk, -(idx % 128), axis=1)


def _fetch_col(table_ref, idx):
    """Record `idx` as a (16,1) column."""
    return _fetch_col_block(table_ref, idx)[:, 0:1]


def _kernel2(any_hit: bool, hbm_nodes: bool, hbm_tris: bool, want_uv: bool,
             mxu: bool, count_iters: bool, K: int, S: int, U: int, C: int,
             nodes_ref, woop_ref, rays_ref,
             *rest):
    # Ray components live in ONE fused input block (1, K*8*S, 128) and
    # hits in ONE fused output block (1, K*n_out*S, 128): one DMA each
    # per grid step instead of 10 — separate component arrays measured
    # ~67 us/group of serialized small-DMA latency (78% of knob's wall).
    n_out = 4 if want_uv else 2
    bf16n = nodes_ref.dtype == jnp.int32 and nodes_ref.shape[1] == 8
    # 4-wide MBVH node records (pack_tables4 / bvh.collapse): 32-slot
    # f32 records, 4 child slabs per fetch, stored-order traversal with
    # direction-sign reversal.  Same queue/stack/DMA machinery as the
    # binary path; only the node unit differs.
    w4 = nodes_ref.shape[1] == 32
    # Up to 4 leaf enqueues + 3 stack pushes per step (vs 2/1 binary).
    qmargin = 4 if w4 else 2

    def rc(k, c):
        base = (k * 8 + c) * S
        return rays_ref[0, base:base + S, :]

    if mxu:
        rmat_ref, *rest = rest
    else:
        rmat_ref = None
    iters_ref = None
    hits_ref, *rest = rest
    if count_iters:
        iters_ref, *rest = rest
    (stack_ref, queue_ref, ctx_ref, dsign_ref, node_scr, tri_scr,
     nsem, tsem) = rest
    sdepth = stack_ref.shape[1]

    def hslot(k, c):
        base = (k * n_out + c) * S
        return slice(base, base + S)
    # Precompute idir/ood per packet into VMEM scratch.  Nothing vector
    # lives across loop iterations: the while state is 6 scalars per
    # packet; every step loads what it needs from refs.  (Keeping K
    # packets' ray context in registers spills: 14 vregs x 8 packets vs
    # 64 physical vregs.)
    for k in range(K):
        dx, dy, dz = rc(k, 3), rc(k, 4), rc(k, 5)

        def rcp_dir(d):
            safe = jnp.where(jnp.abs(d) > OOEPS, d,
                             jnp.where(d >= 0, OOEPS, -OOEPS))
            return 1.0 / safe

        idirx, idiry, idirz = rcp_dir(dx), rcp_dir(dy), rcp_dir(dz)
        ctx_ref[k, 0] = idirx
        ctx_ref[k, 1] = idiry
        ctx_ref[k, 2] = idirz
        ctx_ref[k, 3] = rc(k, 0) * idirx
        ctx_ref[k, 4] = rc(k, 1) * idiry
        ctx_ref[k, 5] = rc(k, 2) * idirz

        tmax = rc(k, 7)
        hits_ref[0, hslot(k, 0), :] = jax.lax.bitcast_convert_type(
            jnp.full(tmax.shape, -1, jnp.int32), jnp.float32)
        hits_ref[0, hslot(k, 1), :] = tmax
        if want_uv:
            hits_ref[0, hslot(k, 2), :] = jnp.zeros(tmax.shape, jnp.float32)
            hits_ref[0, hslot(k, 3), :] = jnp.zeros(tmax.shape, jnp.float32)

        # Packet direction-sign bits (near-first ordering key): bit a set
        # iff the packet's mean direction is positive along axis a.
        dsign_ref[k, 0] = ((jnp.sum(dx) >= 0).astype(jnp.int32)
                           | ((jnp.sum(dy) >= 0).astype(jnp.int32) << 1)
                           | ((jnp.sum(dz) >= 0).astype(jnp.int32) << 2))

    def start(k):
        return jax.lax.select(jnp.any(rc(k, 7) >= 0.0),
                              jnp.int32(0), SENT)

    # Prefetch-descriptor helpers (HBM mode).  Both are pure functions of
    # the carried state so the DMA issued at the end of one iteration and
    # the wait at the start of the next describe the same transfer.
    def node_fetch_idx(node):
        return jnp.where(node == SENT, 0, node)

    def tri_fetch_idx(k, j, tcurs_k, tends_k, qh, qt):
        # Next triangle position for cursor j: its own cursor if mid-run,
        # else the first triangle of the queue entry it would refill from
        # (entries are claimed in cursor order — the refill below must
        # mirror this prefix logic exactly), else 0.
        nbefore = jnp.int32(0)
        for i in range(j):
            nbefore = nbefore + ((tcurs_k[i] >= tends_k[i])
                                 & (qh + nbefore < qt)).astype(jnp.int32)
        mypos = qh + nbefore
        enc = queue_ref[k, mypos % QUEUE_DEPTH]
        nxt_first = (~enc) & FIRST_MASK
        return jnp.where(tcurs_k[j] < tends_k[j], tcurs_k[j],
                         jnp.where(mypos < qt, nxt_first, 0))

    def node_copy(k, node):
        return pltpu.make_async_copy(
            nodes_ref.at[node_fetch_idx(node) // 128],
            node_scr.at[k], nsem.at[k])

    def tri_copy(k, j, ti):
        return pltpu.make_async_copy(
            woop_ref.at[ti // 128], tri_scr.at[k, j], tsem.at[k, j])

    for k in range(K):
        if hbm_nodes:
            node_copy(k, start(k)).start()
        if hbm_tris:
            for j in range(C):
                tri_copy(k, j, jnp.int32(0)).start()

    # Per-packet scalar state: node (current INNER node or SENT), sp,
    # C tcur/tend triangle cursors (flat-indexed k*C+j), qh/qt (leaf
    # ring-queue bounds).
    def cond(state):
        nodes, sps, tcurs, tends, qhs, qts = state[:6]
        alive = None
        for k in range(K):
            a = (nodes[k] != SENT) | (qhs[k] < qts[k])
            for j in range(C):
                a = a | (tcurs[k * C + j] < tends[k * C + j])
            alive = a if alive is None else (alive | a)
        return alive

    def body(state):
        nodes, sps, tcurs, tends, qhs, qts = state[:6]
        o_nodes, o_sps, o_tcurs, o_tends, o_qhs, o_qts = \
            [], [], [], [], [], []
        for k in range(K):
            node, sp = nodes[k], sps[k]
            tcur_k = [tcurs[k * C + j] for j in range(C)]
            tend_k = [tends[k * C + j] for j in range(C)]
            qh, qt = qhs[k], qts[k]

            # The prefetched triangle positions (must mirror the refill
            # decision below exactly; computed from pre-refill state).
            tpos_k = [tri_fetch_idx(k, j, tcur_k, tend_k, qh, qt)
                      for j in range(C)]

            # Padding rays carry tmax=-1, so hit_t starts at -1 and both
            # the slab far-clamp and the t<hit_t test self-mask them; no
            # separate `valid` vector is needed anywhere.
            tmin = rc(k, 6)
            hit_t = hits_ref[0, hslot(k, 1), :]
            hit_tri = jax.lax.bitcast_convert_type(
                hits_ref[0, hslot(k, 0), :], jnp.int32)
            if any_hit:
                # Per-RAY vote retirement (the reference's per-lane
                # anyHit abort, kepler_dynamic_fetch.cu:376-381): a ray
                # that already holds a hit contributes NOTHING to the
                # child votes below, so packet unions shrink as rays
                # hit and a fully-hit packet drains naturally.  The
                # reported hit_t is untouched; only the far-clamp
                # domain collapses.  (This replaced a per-packet
                # all-hit retirement vote that essentially never fired
                # on real AO batches — a packet retires only when ALL
                # ~2048 rays hit — while charging an any-reduce plus
                # selects every iteration.)
                vote_t = jnp.where(hit_tri >= 0,
                                   jnp.float32(-np.inf), hit_t)
            else:
                vote_t = hit_t
            if want_uv:
                hit_u = hits_ref[0, hslot(k, 2), :]
                hit_v = hits_ref[0, hslot(k, 3), :]

            # ---------------- leaf refill (masked) ----------------
            # Runs FIRST so the triangle prefetch issued last iteration
            # (which peeked at its claim position) matches the cursor.
            # Cursors claim queue entries in cursor order.
            nref = jnp.int32(0)
            for j in range(C):
                want = tcur_k[j] >= tend_k[j]
                can = want & (qh + nref < qt)
                enc = queue_ref[k, (qh + nref) % QUEUE_DEPTH]
                dec = ~enc
                lfirst = dec & FIRST_MASK
                lcount = (dec >> COUNT_SHIFT) & 0xFF
                tcur_k[j] = jnp.where(can, lfirst, tcur_k[j])
                tend_k[j] = jnp.where(can, lfirst + lcount, tend_k[j])
                nref = nref + can.astype(jnp.int32)
            qh = qh + nref

            # ---------------- node unit (masked) ----------------
            # Backpressure: stall traversal if the leaf queue could
            # overflow (each step enqueues at most qmargin).
            live = (node != SENT) & (qt - qh < QUEUE_DEPTH - qmargin)
            nd = node_fetch_idx(node)
            if hbm_nodes:
                node_copy(k, node).wait()
                nblk = node_scr[k]                       # (16,128)
            else:
                nblk = nodes_ref[nd // 128]
            col = pltpu.roll(nblk, -(nd % 128), axis=1)[:, 0:1]
            idirx, idiry, idirz = ctx_ref[k, 0], ctx_ref[k, 1], ctx_ref[k, 2]
            oodx, oody, oodz = ctx_ref[k, 3], ctx_ref[k, 4], ctx_ref[k, 5]

            def span(lox, hix, loy, hiy, loz, hiz):
                tx0 = lox * idirx - oodx
                tx1 = hix * idirx - oodx
                ty0 = loy * idiry - oody
                ty1 = hiy * idiry - oody
                tz0 = loz * idirz - oodz
                tz1 = hiz * idirz - oodz
                near = jnp.maximum(
                    jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                    jnp.maximum(jnp.minimum(tz0, tz1), tmin))
                far = jnp.minimum(
                    jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                    jnp.minimum(jnp.maximum(tz0, tz1), vote_t))
                return near, far

            if w4:
                # --- 4-wide node step (MBVH4, pack_tables4 layout) ---
                crep = jnp.repeat(col, S, axis=0)        # (32*S,1)
                icol = jax.lax.bitcast_convert_type(col, jnp.int32)
                lnk = [icol[24, 0], icol[25, 0], icol[26, 0], icol[27, 0]]
                enc = icol[28, 0]  # children-ascending axis

                def b(i):
                    return crep[S * i:S * (i + 1)]       # (S,1)

                anyj = []
                for j in range(4):
                    cjmin, cjmax = span(b(6 * j), b(6 * j + 1),
                                        b(6 * j + 2), b(6 * j + 3),
                                        b(6 * j + 4), b(6 * j + 5))
                    anyj.append(live & jnp.any(cjmax >= cjmin))
                # Visit order: slots forward when the packet direction is
                # positive along the stored axis (children are packed
                # ascending by center), reversed otherwise.  Empty slots
                # carry NaN boxes, so their votes are always False (NaN
                # fails the far >= near compare).
                rev = ((dsign_ref[k, 0] >> enc) & 1) == 0
                ol = [jnp.where(rev, lnk[3 - p], lnk[p]) for p in range(4)]
                oh = [jnp.where(rev, anyj[3 - p], anyj[p])
                      for p in range(4)]
                olf = [x < 0 for x in ol]

                # Hit leaf children enter the FIFO ring queue near-to-far
                # (unconditional dead-slot writes as in the binary path).
                qoff = jnp.int32(0)
                for p in range(4):
                    enq = oh[p] & olf[p]
                    queue_ref[k, (qt + qoff) % QUEUE_DEPTH] = ol[p]
                    qoff = qoff + enq.astype(jnp.int32)
                qt = qt + qoff

                # Hit INNER children: the nearest continues; the rest are
                # stacked far-first so the nearest remaining pops first.
                ih = [oh[p] & ~olf[p] for p in range(4)]
                a1 = ih[0]
                a2 = a1 | ih[1]
                a3 = a2 | ih[2]
                soff = jnp.int32(0)
                for p, pu in ((3, ih[3] & a3), (2, ih[2] & a2),
                              (1, ih[1] & a1)):
                    stack_ref[k, jnp.minimum(sp + soff, sdepth - 1)] = ol[p]
                    soff = soff + pu.astype(jnp.int32)
                sp = sp + soff
                first = jnp.where(ih[0], ol[0],
                                  jnp.where(ih[1], ol[1],
                                            jnp.where(ih[2], ol[2], ol[3])))
                go_first = a3 | ih[3]
                need_pop = live & ~go_first
                can_pop = need_pop & (sp > 0)
                sp_after = sp - can_pop.astype(jnp.int32)
                popped = stack_ref[k, jnp.clip(sp_after, 0, sdepth - 1)]
                node = jnp.where(
                    live,
                    jnp.where(go_first, first,
                              jnp.where(can_pop, popped, SENT)),
                    node)
                sp = sp_after
            elif bf16n:
                # int32-carried bf16 record (8,1): slots 0-5 hold bound
                # pairs, 6-7 the links.  Widening a bf16 bit pattern to
                # f32 is `pattern << 16` — so the low-half bounds are
                # just `slot << 16` and the high-half bounds
                # `slot & 0xFFFF0000`, bitcast.  Everything before the
                # bitcast stays integer-typed (a float-typed table would
                # canonicalize link words aliasing NaN patterns).
                c6 = col[0:6]
                f_even = jax.lax.bitcast_convert_type(
                    c6 << 16, jnp.float32)            # bounds 0,2,..,10
                f_odd = jax.lax.bitcast_convert_type(
                    c6 & jnp.int32(-65536), jnp.float32)  # 1,3,..,11
                crep = jnp.repeat(jnp.concatenate([f_even, f_odd], axis=0),
                                  S, axis=0)          # (12*S,1)
                l0raw = col[6, 0]
                link1 = col[7, 0]
                enc = (l0raw >> 28) & 7
                link0 = jnp.where(l0raw < 0, l0raw | 0x70000000,
                                  l0raw & 0x0FFFFFFF)

                def b(i):
                    r = (i % 2) * 6 + i // 2
                    return crep[S * r:S * (r + 1)]   # (S,1)
            else:
                crep = jnp.repeat(col, S, axis=0)        # (16*S,1)
                icol = jax.lax.bitcast_convert_type(col, jnp.int32)
                link0 = icol[12, 0]
                link1 = icol[13, 0]
                enc = icol[14, 0]

                def b(i):
                    return crep[S * i:S * (i + 1)]       # (S,1)

            if not w4:
                c0min, c0max = span(b(0), b(1), b(2), b(3), b(8), b(9))
                c1min, c1max = span(b(4), b(5), b(6), b(7), b(10), b(11))

                # Child order from the stored split-axis hint vs the
                # packet's direction sign — known as soon as the record
                # is fetched, so the only reductions on the decision
                # chain are two independent boolean ANY votes (vs two
                # float min-reductions plus a compare).
                c0low = (enc >> 2) & 1
                dirpos = (dsign_ref[k, 0] >> (enc & 3)) & 1
                swap = (dirpos ^ c0low) != 0
                lnk_a = jnp.where(swap, link1, link0)
                lnk_b = jnp.where(swap, link0, link1)
                any0 = live & jnp.any(c0max >= c0min)
                any1 = live & jnp.any(c1max >= c1min)
                hit_a = jnp.where(swap, any1, any0)
                hit_b = jnp.where(swap, any0, any1)
                first = jnp.where(hit_a, lnk_a, lnk_b)
                second = lnk_b
                hit_first = hit_a | hit_b
                hit_second = hit_a & hit_b
                first_leaf = first < 0
                second_leaf = second < 0

                # Leaves go to the ring queue.  Writes are UNCONDITIONAL
                # into dead slots (>= qt is above the live ring, >= sp
                # above the live stack), so no read-modify-write: a
                # non-enqueued value lands in a slot the cursor never
                # exposes, and when only the second child enqueues,
                # w1 == w0 overwrites the dead first.
                enq_a = hit_first & first_leaf
                enq_b = hit_second & second_leaf
                w0 = qt % QUEUE_DEPTH
                queue_ref[k, w0] = first
                w1 = (qt + enq_a.astype(jnp.int32)) % QUEUE_DEPTH
                queue_ref[k, w1] = second
                qt = qt + enq_a.astype(jnp.int32) + enq_b.astype(jnp.int32)

                # Inner second child goes to the stack (dead-slot trick).
                push = hit_second & ~second_leaf
                stack_ref[k, jnp.minimum(sp, sdepth - 1)] = second
                sp = sp + push.astype(jnp.int32)

                # Next node: inner first child, else pop (stack holds
                # only inner nodes), else SENT.
                go_first = hit_first & ~first_leaf
                need_pop = live & ~go_first
                can_pop = need_pop & (sp > 0)
                sp_after = sp - can_pop.astype(jnp.int32)
                popped = stack_ref[k, jnp.clip(sp_after, 0, sdepth - 1)]
                node = jnp.where(
                    live,
                    jnp.where(go_first, first,
                              jnp.where(can_pop, popped, SENT)),
                    node)
                sp = sp_after

            # ---------------- triangle units (masked) ----------------
            # One fetch+rotate serves all U units of a cursor: a leaf's
            # triangles are lane-adjacent (pack_tables2 alignment), so
            # unit u reads the static lane u of the rotated block.  C
            # cursors drain C queue entries concurrently.
            # NOTE (measured, v5e): do NOT narrow any of these to (S,1)
            # or (1,1) "scalars" — a vector op costs per-VREG, so (S,1)
            # issues exactly like (S,128) and the re-broadcasts when
            # mixing widths double the cost (47.6ms vs 23.9ms on bunny).
            ox, oy, oz = rc(k, 0), rc(k, 1), rc(k, 2)
            dx, dy, dz = rc(k, 3), rc(k, 4), rc(k, 5)
            for j in range(C):
              tpos = tpos_k[j]
              tcur, tend = tcur_k[j], tend_k[j]
              if hbm_tris:
                tri_copy(k, j, tpos).wait()
                tblk0 = tri_scr[k, j]
              else:
                tblk0 = woop_ref[tpos // 128]
              wblk = pltpu.roll(tblk0, -(tpos % 128), axis=1)
              if mxu:
                # --- MXU triangle unit: all U candidates in one matmul.
                # L (6U,10) from the transposed candidate records; rmat
                # rows = [ox,oy,oz,1,dx,dy,dz,tmin,tmax,0] (host-built,
                # flat ray order); columns 7-9 of L are zero so the
                # tmin/tmax carrier rows never contribute.
                wT = jnp.transpose(wblk[:, 0:U])          # (U,16)
                z3 = jnp.zeros((U, 3), jnp.float32)
                z4 = jnp.zeros((U, 4), jnp.float32)
                z6 = jnp.zeros((U, 6), jnp.float32)

                def lo(c):  # origin-side row block: [c0..c2, c3, 0x6]
                    return jnp.concatenate(
                        [c[:, 0:3], c[:, 3:4], z6], axis=1)

                def ld(c):  # direction-side row block: [0x4, c0..c2, 0x3]
                    return jnp.concatenate([z4, c[:, 0:3], z3], axis=1)

                w_z = wT[:, 0:4]
                w_x = wT[:, 4:8]
                w_y = wT[:, 8:12]
                L = jnp.concatenate([
                    lo(jnp.concatenate([-w_z[:, 0:3], w_z[:, 3:4]], axis=1)),
                    ld(w_z), lo(w_x), ld(w_x), lo(w_y), ld(w_y)], axis=0)
                rmat = rmat_ref[0, k]                     # (10, S*128)
                O = jax.lax.dot_general(
                    L, rmat, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision="float32")                  # (6U, S*128)
                ozt, dzt = O[0:U], O[U:2 * U]
                oxt, dxt = O[2 * U:3 * U], O[3 * U:4 * U]
                oyt, dyt = O[4 * U:5 * U], O[5 * U:6 * U]
                t = ozt / dzt
                uu_ = oxt + t * dxt
                vv_ = oyt + t * dyt
                tminf = rmat[7:8]
                tmaxf = rmat[8:9]
                have = (jax.lax.broadcasted_iota(jnp.int32, (U, 1), 0)
                        < (tend - tcur))
                # Candidate gate uses tmax (not the shrinking hit_t):
                # conservative — worse candidates lose the min anyway and
                # the merge re-checks against hit_t.
                okc = (have & (t > tminf) & (t < tmaxf)
                       & (uu_ >= 0.0) & (vv_ >= 0.0) & (uu_ + vv_ <= 1.0))
                tsel = jnp.where(okc, t, jnp.float32(np.inf))
                tb = jnp.min(tsel, axis=0, keepdims=True)  # (1, S*128)
                eq = tsel == tb
                tid_col = jax.lax.bitcast_convert_type(
                    wT[:, 12:13], jnp.int32)               # (U,1)
                idb = jnp.max(jnp.where(eq, tid_col, -1), axis=0,
                              keepdims=True)
                tb2 = _flat_to_rows(tb, S)
                idb2 = _flat_to_rows(idb, S)
                upd = tb2 < hit_t
                if any_hit:
                    upd = upd & (hit_tri < 0)
                hit_t = jnp.where(upd, tb2, hit_t)
                hit_tri = jnp.where(upd, idb2, hit_tri)
                if want_uv:
                    # Tie-break consistently: on exact t ties `eq` marks
                    # several candidates; u/v must come from the SAME
                    # candidate the id selection picked (max tri id).
                    eq_id = eq & (tid_col == idb)
                    ub = _flat_to_rows(jnp.max(
                        jnp.where(eq_id, uu_, -jnp.inf), axis=0,
                        keepdims=True), S)
                    vb = _flat_to_rows(jnp.max(
                        jnp.where(eq_id, vv_, -jnp.inf), axis=0,
                        keepdims=True), S)
                    hit_u = jnp.where(upd, ub, hit_u)
                    hit_v = jnp.where(upd, vb, hit_v)
              else:
                for uu in range(U):
                    have = (tcur + uu) < tend
                    wrep = jnp.repeat(wblk[:, uu:uu + 1], S, axis=0)  # (16*S,1)

                    def c(i):
                        return wrep[S * i:S * (i + 1)]

                    oz_t = c(3) - ox * c(0) - oy * c(1) - oz * c(2)
                    dz_t = dx * c(0) + dy * c(1) + dz * c(2)
                    t = oz_t / dz_t
                    ox_t = c(7) + ox * c(4) + oy * c(5) + oz * c(6)
                    dx_t = dx * c(4) + dy * c(5) + dz * c(6)
                    u = ox_t + t * dx_t
                    oy_t = c(11) + ox * c(8) + oy * c(9) + oz * c(10)
                    dy_t = dx * c(8) + dy * c(9) + dz * c(10)
                    v = oy_t + t * dy_t

                    if any_hit:
                        ok = hit_tri < 0
                    else:
                        ok = jnp.bool_(True)
                    ok = (ok & have & (t > tmin) & (t < hit_t)
                          & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0))
                    tid = jax.lax.bitcast_convert_type(
                        wrep, jnp.int32)[12 * S:13 * S]  # (S,1) orig tri id
                    hit_t = jnp.where(ok, t, hit_t)
                    hit_tri = jnp.where(ok, tid, hit_tri)
                    if want_uv:
                        hit_u = jnp.where(ok, u, hit_u)
                        hit_v = jnp.where(ok, v, hit_v)
              # Advance the cursor past the drained slots (an exhausted,
              # unrefilled cursor stays put).
              tcur_k[j] = jnp.where(tcur < tend,
                                    jnp.minimum(tcur + U, tend), tcur)

            hits_ref[0, hslot(k, 1), :] = hit_t
            hits_ref[0, hslot(k, 0), :] = jax.lax.bitcast_convert_type(
                hit_tri, jnp.float32)
            if want_uv:
                hits_ref[0, hslot(k, 2), :] = hit_u
                hits_ref[0, hslot(k, 3), :] = hit_v

            if hbm_nodes:
                node_copy(k, node).start()
            if hbm_tris:
                for j in range(C):
                    tri_copy(k, j, tri_fetch_idx(k, j, tcur_k, tend_k,
                                                 qh, qt)).start()

            o_nodes.append(node)
            o_sps.append(sp)
            o_tcurs.extend(tcur_k)
            o_tends.extend(tend_k)
            o_qhs.append(qh)
            o_qts.append(qt)
        out = (tuple(o_nodes), tuple(o_sps), tuple(o_tcurs),
               tuple(o_tends), tuple(o_qhs), tuple(o_qts))
        if count_iters:
            out = out + (state[6] + 1,)
        return out

    zeros = tuple(jnp.int32(0) for _ in range(K))
    zeros_c = tuple(jnp.int32(0) for _ in range(K * C))
    init = (tuple(start(k) for k in range(K)), zeros, zeros_c, zeros_c,
            zeros, zeros)
    if count_iters:
        init = init + (jnp.int32(0),)
    final = jax.lax.while_loop(cond, body, init)
    if count_iters:
        iters_ref[0] = jnp.full((8, 128), final[6], jnp.int32)
    if hbm_nodes or hbm_tris:
        nodes_f, _, tcurs_f, tends_f, qhs_f, qts_f = final[:6]
        for k in range(K):
            if hbm_nodes:
                node_copy(k, nodes_f[k]).wait()
            if hbm_tris:
                tc = [tcurs_f[k * C + j] for j in range(C)]
                te = [tends_f[k * C + j] for j in range(C)]
                for j in range(C):
                    tri_copy(k, j, tri_fetch_idx(k, j, tc, te,
                                                 qhs_f[k], qts_f[k])).wait()


@partial(jax.jit, static_argnames=("any_hit", "hbm", "interpret",
                                   "want_uv", "K", "S", "U", "mxu", "C",
                                   "count_iters"))
def _trace2_jit(nodes3, woop3, rays: Rays, any_hit: bool, hbm,
                interpret: bool, want_uv: bool, K: int, S: int, U: int,
                mxu: bool = False, C: int = 1, count_iters: bool = False):
    hbm_nodes, hbm_tris = _residency_flags(hbm)
    n = rays.origin.shape[0]
    block = K * S * 128
    t = max(1, -(-n // block))
    pad = t * block - n

    def prep(x, fill):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, jnp.float32)])
        return x.reshape(t, K, S, 128)

    rays8 = [
        prep(rays.origin[:, 0], 0.0), prep(rays.origin[:, 1], 0.0),
        prep(rays.origin[:, 2], 0.0),
        prep(rays.dirn[:, 0], 1.0), prep(rays.dirn[:, 1], 0.0),
        prep(rays.dirn[:, 2], 0.0),
        prep(rays.tmin, 0.0), prep(rays.tmax, -1.0),
    ]
    # ONE fused ray input (t, K*8*S, 128): separate per-component arrays
    # cost 8 serialized ~6.7us block DMAs per grid step (measured 67-78
    # us/group of pure overhead — 78% of knob primary's wall time).
    fused = jnp.stack(rays8, axis=2).reshape(t, K * 8 * S, 128)
    extra = []
    extra_specs = []
    if mxu:
        # Ray-component matrix for the MXU triangle unit, flat ray order:
        # rows [ox,oy,oz,1,dx,dy,dz,tmin,tmax,0].  Rows 7-9 multiply zero
        # columns of L; 7/8 double as the tmin/tmax carriers the flat
        # epilogue reads directly (no in-kernel relayout).
        flat8 = [r.reshape(t, K, S * 128) for r in rays8]
        ones = jnp.ones_like(flat8[0])
        zeros = jnp.zeros_like(flat8[0])
        rmat = jnp.stack(
            [flat8[0], flat8[1], flat8[2], ones,
             flat8[3], flat8[4], flat8[5],
             flat8[6], flat8[7], zeros], axis=2)  # (t, K, 10, S*128)
        extra = [rmat]
        extra_specs = [pl.BlockSpec((1, K, 10, S * 128),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)]
    ray_spec = pl.BlockSpec((1, K * 8 * S, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    node_spec = pl.BlockSpec(
        memory_space=pltpu.ANY if hbm_nodes else pltpu.VMEM)
    woop_spec = pl.BlockSpec(
        memory_space=pltpu.ANY if hbm_tris else pltpu.VMEM)
    n_out = 4 if want_uv else 2
    # ONE fused hit output (t, K*n_out*S, 128) f32; tri rows carry the
    # int32 ids bit-cast (same small-DMA rationale as the input).
    out_shape = [jax.ShapeDtypeStruct((t, K * n_out * S, 128), jnp.float32)]
    out_specs = [pl.BlockSpec((1, K * n_out * S, 128), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)]
    if count_iters:
        # Per-grid-step while-loop iteration count (profiling aid; the
        # reference's analog is its per-launch grid/occupancy prints).
        out_shape.append(jax.ShapeDtypeStruct((t, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        partial(_kernel2, any_hit, hbm_nodes, hbm_tris, want_uv, mxu,
                count_iters, K, S, U, C),
        grid=(t,),
        in_specs=[node_spec, woop_spec, ray_spec] + extra_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        # 4-wide records (32 slots): up to 3 pushes per step instead of
        # 1, but tree depth halves — 128 entries is conservative.
        scratch_shapes=[pltpu.SMEM((K, 128 if nodes3.shape[1] == 32
                                    else STACK_DEPTH), jnp.int32),
                        pltpu.SMEM((K, QUEUE_DEPTH), jnp.int32),
                        pltpu.VMEM((K, 6, S, 128), jnp.float32),
                        pltpu.SMEM((K, 1), jnp.int32),
                        pltpu.VMEM((K, nodes3.shape[1], 128), nodes3.dtype),
                        pltpu.VMEM((K, C, 16, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((K,)),
                        pltpu.SemaphoreType.DMA((K, C))],
        interpret=interpret,
    )(nodes3, woop3, fused, *extra)

    iters = None
    if count_iters:
        hits_f, iters_out = outs
        iters = iters_out[:, 0, 0]
    else:
        (hits_f,) = outs
    hv = hits_f.reshape(t, K, n_out, S, 128)
    hit_tri = jax.lax.bitcast_convert_type(hv[:, :, 0], jnp.int32)
    hit_t = hv[:, :, 1]
    if want_uv:
        u = hv[:, :, 2].reshape(-1)[:n]
        v = hv[:, :, 3].reshape(-1)[:n]
    else:
        u = v = jnp.zeros((n,), jnp.float32)
    hits = Hits(tri=hit_tri.reshape(-1)[:n], t=hit_t.reshape(-1)[:n],
                u=u, v=v)
    return (hits, iters) if count_iters else hits


def trace_packet2(flat: FlatBVH, rays: Rays, any_hit: bool = False,
                  tables=None, hbm: bool | None = None,
                  interpret: bool = False, tile: int | None = None,
                  k: int | None = None, u: int | None = None,
                  want_uv: bool = True, mxu: bool | None = None,
                  c: int | None = None,
                  bf16_nodes: bool | None = None,
                  count_iters: bool = False) -> Hits:
    """Trace rays with the branch-free interleaved-packet kernel.

    tables: optional pre-packed (nodes3, woop3) from prepare_tables2
    (device-resident) to skip per-call packing.
    hbm: table residency — "vmem" (both VMEM-resident), "mixed" (nodes
    resident, triangle blocks DMA-streamed), "hbm" (both streamed,
    per-packet double-buffered); bools mean "vmem"/"hbm"; default
    auto-selects by table sizes (tables2_residency).
    tile/k/u: packet size, interleave width, triangle units (defaults
    from TPU_RT_TILE2 / TPU_RT_K / TPU_RT_U env).
    mxu: matmul triangle unit (default TPU_RT_MXU env, OFF — measured
    slower): whole-leaf candidate groups via one (6U,10)@(10,tile)
    matmul per packet per iteration; U defaults to MAX_LEAF so one
    iteration drains a leaf.  MXU dot products are f32-class but not
    bit-identical to the scalar oracle's op order — hit ids can differ
    for edge-grazing rays.
    c: parallel leaf cursors per packet (default TPU_RT_C env).
    bf16_nodes: 32-byte bf16 node records (conservative outward-rounded
    bounds; hit results identical).  Default: the choose_node_format
    policy when tables are packed here, else inferred from the given
    tables' dtype.
    count_iters: also return the per-grid-step while-loop iteration
    counts — returns (hits, iters[t]) instead of hits (profiling; the
    suite roofline model uses it).
    """
    if tables is None:
        if bf16_nodes is None:
            auto_res, bf16_nodes = choose_node_format(flat)
            if hbm is None:
                hbm = auto_res
        tables = prepare_tables2(flat, bf16_nodes=bf16_nodes)
        if tables is None:
            raise ValueError("scene exceeds packet2 packing limits")
    nodes3, woop3 = tables
    if hbm is None:
        hbm = tables2_residency(flat,
                                bf16_nodes=nodes3.dtype == jnp.int32)
    if isinstance(hbm, bool):
        hbm = "hbm" if hbm else "vmem"
    streaming = hbm != "vmem"
    if tile is None:
        # Streamed residencies amortize per-record DMA latency better
        # with wider packets and a shorter interleave (dragon hbm sweep,
        # round 3: tile=4096/K=2 is +18% over 2048/4).
        tile = 4096 if streaming else TILE
    assert tile % 128 == 0
    if k is None:
        k = 2 if streaming else K
    if mxu is None:
        mxu = MXU
    if u is None:
        u = MAX_LEAF if mxu else U
    return _trace2_jit(nodes3, woop3, rays, any_hit, hbm, interpret, want_uv,
                       k, tile // 128, u, mxu,
                       C if c is None else c, count_iters)


def prepare_tables2(flat: FlatBVH, bf16_nodes: bool = False):
    """Device-resident kernel tables (nodes3, woop3) or None if the scene
    exceeds packing limits."""
    packed = pack_tables2(flat, bf16_nodes=bf16_nodes)
    if packed is None:
        return None
    return tuple(jnp.asarray(a) for a in packed)


# U for the 4-wide kernel: quad leaves hold up to MAX_LEAF4 = 16 refs
# (vs ~3 for binary SBVH leaves), so the round-2 "U>3 loses" result
# (which assumed 3-ref leaves) inverts — U = the leaf width measured
# best (16 for 16-wide leaves, 32 for the 32-wide big-scene collapse:
# dragon 5.7 -> 7.5, hairball 1.6 -> 2.25 Mray/s).
U4 = int(os.environ.get("TPU_RT_U4", 16))
# Interleave/tile for the 4-wide kernel: K=1/tile=2048 measured best
# across every scene and residency (bunny 27.5 -> 40.5, knob ao 16.4 ->
# 23.5, dragon 3.25 -> 7.5 with U32, hairball 1.14 -> 2.25) — the wide
# step carries enough vector ILP (4 spans + 16-32 tri units) that the
# round-3 K=2 latency-overlap law for the binary kernel inverts; K>=2
# doubles per-iteration issue and spills.
K4 = int(os.environ.get("TPU_RT_K4", 1))
TILE4 = int(os.environ.get("TPU_RT_TILE4", 2048))


def prepare_tables4(quad):
    """Device-resident 4-wide kernel tables (nodes4, woop4) or None."""
    packed = pack_tables4(quad)
    if packed is None:
        return None
    return tuple(jnp.asarray(a) for a in packed)


def trace_packet4(quad, rays: Rays, any_hit: bool = False,
                  tables=None, hbm: str | bool | None = None,
                  interpret: bool = False, tile: int | None = None,
                  k: int | None = None, u: int | None = None,
                  want_uv: bool = True, c: int | None = None,
                  count_iters: bool = False) -> Hits:
    """Trace rays with the 4-wide (MBVH4) packet kernel variant.

    quad: a bvh.collapse.QuadBVH (collapse4 of the binary FlatBVH).
    Same machinery as trace_packet2 — the node unit fetches one 32-slot
    record, slab-tests four children, and traverses in stored order with
    direction-sign reversal; leaves hold up to 16 contiguous triangles.
    """
    if tables is None:
        tables = prepare_tables4(quad)
        if tables is None:
            raise ValueError("scene exceeds packet4 packing limits")
    nodes4, woop4 = tables
    if hbm is None:
        nodes_b = int(nodes4.size) * 4
        woop_b = int(woop4.size) * 4
        if nodes_b + woop_b <= VMEM_TABLE_BUDGET:
            hbm = "vmem"
        elif nodes_b <= VMEM_TABLE_BUDGET:
            hbm = "mixed"
        else:
            hbm = "hbm"
    if isinstance(hbm, bool):
        hbm = "hbm" if hbm else "vmem"
    if tile is None:
        tile = TILE4
    assert tile % 128 == 0
    if k is None:
        k = K4
    if u is None:
        u = U4
    return _trace2_jit(nodes4, woop4, rays, any_hit, hbm, interpret,
                       want_uv, k, tile // 128, u, False,
                       C if c is None else c, count_iters)
