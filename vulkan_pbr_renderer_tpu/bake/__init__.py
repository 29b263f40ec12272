from . import cache, ibl  # noqa: F401
