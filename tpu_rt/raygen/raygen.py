"""Host-side ray generation orchestration with batching.

Equivalent of the reference's RayGen class (src/rt/ray/RayGen.cc): owns the
max-batch budget and the cursor-based batching of secondary generations
(RayGen.cc:124-142) so AO at numSamples x W x H fits device memory.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpu_rt.core.types import Hits, Rays
from tpu_rt.raygen.generators import gen_ao_rays, gen_primary_rays, gen_shadow_rays
from tpu_rt.scene.pixel_table import PixelTable


class RayGen:
    def __init__(self, max_rays_per_batch: int = 1 << 21):
        # Renderer constructs the reference RayGen with 1<<21 (Renderer.cc:46).
        self.max_rays_per_batch = int(max_rays_per_batch)
        self.pixel_table = PixelTable()
        self._cursor = 0

    # -- primary -------------------------------------------------------------

    def primary(self, camera, width: int, height: int):
        """Morton-ordered primary rays for the camera (RayGen.cc:50-73).
        Returns (Rays, slot_to_id, id_to_slot)."""
        self.pixel_table.set_size(width, height)
        i2p = self.pixel_table.index_to_pixel_device()
        origin = jnp.asarray(np.asarray(camera.position, np.float32))
        m = jnp.asarray(camera.nscreen_to_world(width, height))
        return gen_primary_rays(i2p, origin, m, width, height, jnp.float32(camera.far))

    # -- secondary batching --------------------------------------------------

    def _batching(self, num_input: int, num_samples: int, new_batch: bool):
        """Cursor over input rays, <= max_batch output rays per call
        (RayGen.cc:124-142).  Returns (lo, hi) or None when exhausted."""
        if new_batch:
            self._cursor = 0
        if self._cursor >= num_input:
            return None
        lo = self._cursor
        span = max(1, self.max_rays_per_batch // max(1, num_samples))
        hi = min(num_input, lo + span)
        self._cursor = hi
        return lo, hi

    def ao(
        self,
        in_rays: Rays,
        in_hits: Hits,
        tri_normal,
        num_samples: int,
        max_dist,
        new_batch: bool,
        seed: int = 0,
    ):
        """Generate the next AO batch, or None when the input is exhausted.
        Returns (Rays, slot_to_id, id_to_slot, input_range)."""
        num_input = int(in_rays.origin.shape[0])
        rng = self._batching(num_input, num_samples, new_batch)
        if rng is None:
            return None
        lo, hi = rng
        rays, s2i, i2s = gen_ao_rays(
            in_rays.origin[lo:hi],
            in_rays.dirn[lo:hi],
            in_hits.t[lo:hi],
            in_hits.tri[lo:hi],
            jnp.asarray(np.asarray(tri_normal, np.float32)),
            num_samples,
            jnp.float32(max_dist),
            jnp.uint32(seed),
            task_offset=lo,
        )
        return rays, s2i, i2s, (lo, hi)

    def shadow(
        self,
        in_rays: Rays,
        in_hits: Hits,
        num_samples: int,
        light_position,
        light_radius,
        new_batch: bool,
        seed: int = 0,
    ):
        num_input = int(in_rays.origin.shape[0])
        rng = self._batching(num_input, num_samples, new_batch)
        if rng is None:
            return None
        lo, hi = rng
        rays, s2i, i2s = gen_shadow_rays(
            in_rays.origin[lo:hi],
            in_rays.dirn[lo:hi],
            in_hits.t[lo:hi],
            in_hits.tri[lo:hi],
            num_samples,
            jnp.asarray(np.asarray(light_position, np.float32)),
            jnp.float32(light_radius),
            jnp.uint32(seed),
            task_offset=lo,
        )
        return rays, s2i, i2s, (lo, hi)
