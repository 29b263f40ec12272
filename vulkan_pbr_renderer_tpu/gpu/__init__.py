from . import device, sampling  # noqa: F401
