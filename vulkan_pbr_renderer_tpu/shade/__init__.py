from . import gbuffer  # noqa: F401
