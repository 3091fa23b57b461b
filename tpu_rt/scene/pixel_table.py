"""Morton pixel swizzle table (reference src/rt/ray/PixelTable.cc).

Gives primary rays spatial coherence without sorting: primary ray i targets
pixel ``index_to_pixel[i]``.  The LUT math lives in
tpu_rt.core.math.pixel_morton_luts; this wrapper caches per-resolution tables
and exposes device copies.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpu_rt.core.math import pixel_morton_luts


class PixelTable:
    def __init__(self):
        self._size = (0, 0)
        self.index_to_pixel: np.ndarray | None = None
        self.pixel_to_index: np.ndarray | None = None
        self._dev: jnp.ndarray | None = None

    def set_size(self, width: int, height: int) -> None:
        if (width, height) == self._size:
            return
        self._size = (width, height)
        self.index_to_pixel, self.pixel_to_index = pixel_morton_luts(width, height)
        self._dev = None

    @property
    def size(self):
        return self._size

    def index_to_pixel_device(self) -> jnp.ndarray:
        if self._dev is None:
            self._dev = jnp.asarray(self.index_to_pixel, jnp.int32)
        return self._dev
