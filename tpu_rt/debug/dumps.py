"""Bitwise golden-dump utilities for kernel/hardware verification.

The reference's verification mechanism (SURVEY.md section 4) dumps rays, BVH
nodes and Woop triangles as IEEE-754 hex words, one per line, via its
fetch_* kernels (reference src/rt/cuda/CudaTracer.cc:519-637 writing
triangle_{x,y,z,w}.txt; fetch_ray.cu / fetch_node.cu / fetch_tri.cu), plus
binary ray snapshots (RayBuffer::dumpRayBuffer -> AORay%02d.dump) and text
results (dumpRayResult -> RayResult%02d.dump, "id t" lines,
RayBuffer.cc:89-223).  These are the formats RTL/hardware bring-up diffs
against; tpu_rt reproduces them from the FlatBVH arrays.
"""

from __future__ import annotations

import os

import numpy as np

from tpu_rt.core.math import float_to_bits
from tpu_rt.core.types import FlatBVH, Hits, Rays


def dump_hex_words(path: str, values: np.ndarray) -> None:
    """One 8-digit uppercase-hex IEEE word per line (the reference's
    printf("%08X\\n", floatToBits(v)) format)."""
    bits = float_to_bits(np.asarray(values, np.float32).reshape(-1))
    with open(path, "w") as f:
        for w in bits:
            f.write(f"{int(w):08X}\n")


def load_hex_words(path: str) -> np.ndarray:
    """Inverse of dump_hex_words -> f32 array."""
    with open(path) as f:
        bits = np.array([int(line, 16) for line in f if line.strip()], np.uint32)
    return bits.view(np.float32)


def dump_bvh_nodes(flat: FlatBVH, directory: str = ".", prefix: str = "node") -> list[str]:
    """Per-lane node dumps: node_{n0x,n0y,...}.txt in the reference's
    fetch_node layout — one file per float4 lane of the node row (the
    reference's n0xy/n1xy/nz/tmp split, fetch_node.cu)."""
    nodes = np.asarray(flat.nodes, np.float32)
    groups = {
        "n0xy": nodes[:, 0:4],   # c0.lo.x, c0.hi.x, c0.lo.y, c0.hi.y
        "n1xy": nodes[:, 4:8],
        "nz": nodes[:, 8:12],
        "links": nodes[:, 12:16],
    }
    written = []
    os.makedirs(directory, exist_ok=True)
    for name, block in groups.items():
        for lane, suffix in enumerate("xyzw"):
            path = os.path.join(directory, f"{prefix}_{name}_{suffix}.txt")
            dump_hex_words(path, block[:, lane])
            written.append(path)
    return written


def dump_woop_triangles(flat: FlatBVH, directory: str = ".") -> list[str]:
    """triangle_{x,y,z,w}.txt — every Woop row's float4 lanes in fetch order
    (v00, v11, v22 per triangle), matching the reference's default-on dump
    (CudaTracer.cc:519-637)."""
    woop = np.asarray(flat.tri_woop, np.float32).reshape(-1, 3, 4)  # [R,3(v00/v11/v22),4]
    os.makedirs(directory, exist_ok=True)
    written = []
    for lane, suffix in enumerate("xyzw"):
        path = os.path.join(directory, f"triangle_{suffix}.txt")
        dump_hex_words(path, woop[:, :, lane])
        written.append(path)
    return written


def dump_rays(rays: Rays, path: str) -> None:
    """Binary ray snapshot: float32 records (ox,oy,oz,tmin,dx,dy,dz,tmax) —
    the reference's 32-byte Ray struct stream (dumpRayBuffer,
    RayBuffer.cc:89-150)."""
    o = np.asarray(rays.origin, np.float32)
    d = np.asarray(rays.dirn, np.float32)
    tmin = np.asarray(rays.tmin, np.float32)[:, None]
    tmax = np.asarray(rays.tmax, np.float32)[:, None]
    rec = np.concatenate([o, tmin, d, tmax], axis=1).astype("<f4")
    rec.tofile(path)


def load_rays(path: str) -> Rays:
    rec = np.fromfile(path, dtype="<f4").reshape(-1, 8)
    import jax.numpy as jnp

    return Rays(
        origin=jnp.asarray(rec[:, 0:3]),
        dirn=jnp.asarray(rec[:, 4:7]),
        tmin=jnp.asarray(rec[:, 3]),
        tmax=jnp.asarray(rec[:, 7]),
    )


def dump_ray_results(hits: Hits, path: str) -> None:
    """Text results "id t" per line (dumpRayResult, RayBuffer.cc:180-223)."""
    tri = np.asarray(hits.tri)
    t = np.asarray(hits.t, np.float32)
    with open(path, "w") as f:
        for i in range(tri.shape[0]):
            f.write(f"{int(tri[i])} {float(t[i]):g}\n")
