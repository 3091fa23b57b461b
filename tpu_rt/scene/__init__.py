from tpu_rt.scene.objio import Mesh, Material, import_wavefront_mesh, export_wavefront_mesh
from tpu_rt.scene.scene import Scene
from tpu_rt.scene.camera import Camera
from tpu_rt.scene.pixel_table import PixelTable
from tpu_rt.scene import procedural

__all__ = [
    "Mesh",
    "Material",
    "import_wavefront_mesh",
    "export_wavefront_mesh",
    "Scene",
    "Camera",
    "PixelTable",
    "procedural",
]
