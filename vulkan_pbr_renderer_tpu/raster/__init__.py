from . import setup, xla_raster  # noqa: F401
from .setup import TriSetup, setup_triangles, transform_to_clip  # noqa: F401
