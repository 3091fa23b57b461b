from tpu_rt.raygen.generators import (
    gen_primary_rays,
    gen_ao_rays,
    gen_shadow_rays,
)
from tpu_rt.raygen.raygen import RayGen

__all__ = ["gen_primary_rays", "gen_ao_rays", "gen_shadow_rays", "RayGen"]
