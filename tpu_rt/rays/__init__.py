from tpu_rt.rays.buffer import RayBuffer, ray_morton_keys_device, morton_sort_device

__all__ = ["RayBuffer", "ray_morton_keys_device", "morton_sort_device"]
