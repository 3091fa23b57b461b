"""Image reconstruction / shading from trace results.

Vectorized equivalent of reconstructKernel + countHitsKernel
(src/rt/cuda/RendererKernels.cu:60-162), including the reference's quirks,
kept deliberately (SURVEY.md section 7 "quirks"):

- background color (0.2, 0.4, 0.8, 1.0),
- AO: miss = white, blocked = (0,0,0,1) — black despite the comment in the
  reference claiming white — and primary-miss pixels get the background,
- Diffuse: per-sample shaded color averaged, then modulated by the *primary*
  hit's material color.

Returns float RGBA (the differentiable path) — pack with
tpu_rt.core.math.to_abgr for the u8 image.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

BG_COLOR = np.array([0.2, 0.4, 0.8, 1.0], np.float32)


@partial(jax.jit, static_argnames=("ray_type", "num_rays_per_primary", "num_pixels"))
def reconstruct_image(
    primary_slot_to_id: jnp.ndarray,  # [P] i32
    primary_tri: jnp.ndarray,         # [P] i32 primary hit ids
    batch_id_to_slot: jnp.ndarray,    # [P*S] i32 (or [P] for primary)
    batch_tri: jnp.ndarray,           # [B] i32 batch hit ids
    tri_shaded: jnp.ndarray,          # [T,4] f32 precomputed shaded colors
    tri_material: jnp.ndarray,        # [T,4] f32 material colors
    ray_type: str,                    # "primary" | "ao" | "diffuse"
    num_rays_per_primary: int,
    num_pixels: int,
):
    """Returns [num_pixels, 4] f32 RGBA image (pixel index = primary ray id)."""
    p = primary_tri.shape[0]
    s = num_rays_per_primary
    is_primary = ray_type == "primary"
    is_ao = ray_type == "ao"
    is_diffuse = ray_type == "diffuse"
    assert is_primary or is_ao or is_diffuse, ray_type

    primary_id = primary_slot_to_id.astype(jnp.int32)

    if tri_shaded.shape[0] == 0:
        # Empty scene: every ray misses; pad the color tables so the gathers
        # below stay well-formed (the miss mask routes around the values).
        tri_shaded = jnp.zeros((1, 4), jnp.float32)
        tri_material = jnp.zeros((1, 4), jnp.float32)

    if is_primary:
        # One batch ray per primary, addressed by primary *id*
        # (RendererKernels.cu:73: batchSlots = batchIDToSlot + primaryID).
        slots = batch_id_to_slot[primary_id][:, None]  # [P,1]
    else:
        base = jnp.arange(p, dtype=jnp.int32)[:, None] * s + jnp.arange(s, dtype=jnp.int32)[None, :]
        slots = batch_id_to_slot[base]  # [P,S]

    tri = batch_tri[slots]  # [P,S]
    miss = tri == -1
    tri_c = jnp.clip(tri, 0, tri_shaded.shape[0] - 1)

    bg = jnp.asarray(BG_COLOR)
    white = jnp.ones(4, jnp.float32)
    black_a1 = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)

    miss_color = bg if is_primary else white
    if is_ao:
        hit_color = jnp.broadcast_to(black_a1[None, None, :], tri.shape + (4,))
    else:
        hit_color = tri_shaded[tri_c]
    color = jnp.where(miss[..., None], miss_color[None, None, :], hit_color)
    color = jnp.mean(color, axis=1)  # [P,4]

    primary_miss = primary_tri == -1
    if is_ao:
        color = jnp.where(primary_miss[:, None], bg[None, :], color)
    if is_diffuse:
        ptri_c = jnp.clip(primary_tri, 0, tri_material.shape[0] - 1)
        modulate = jnp.where(primary_miss[:, None], bg[None, :], tri_material[ptri_c])
        color = color * modulate

    image = jnp.zeros((num_pixels, 4), jnp.float32).at[primary_id].set(color)
    return image


@jax.jit
def count_hits(tri: jnp.ndarray) -> jnp.ndarray:
    """Number of rays that hit anything (countHitsKernel,
    RendererKernels.cu:112-162) — sizes the secondary-ray denominator."""
    return jnp.sum((tri >= 0).astype(jnp.int32))
