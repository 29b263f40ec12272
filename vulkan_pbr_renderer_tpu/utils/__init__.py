from . import color, image, math3d, noise  # noqa: F401
