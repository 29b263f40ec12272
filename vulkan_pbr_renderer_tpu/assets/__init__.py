from . import procedural, scene  # noqa: F401
from .scene import MaterialDesc, MeshPart, Scene, build_scene  # noqa: F401
