from . import renderer  # noqa: F401
from .renderer import CameraState, FrameState, Renderer, make_camera, render_frame  # noqa: F401
