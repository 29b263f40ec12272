"""Device management — the TPU replacement for GPU_Init/GPU_Deinit.

The reference's GPU_Init (gpu_vulkan.c:945-1140) creates a Vulkan
instance/device/queue and six samplers; on TPU the runtime is jax itself, so
this module is thin: backend detection, interpret-mode policy for Pallas
kernels (CPU testing), and mesh construction for the multi-chip path.
"""

from __future__ import annotations

import jax
import numpy as np


def backend() -> str:
    return jax.default_backend()


def is_tpu() -> bool:
    return backend() == "tpu"


def pallas_interpret() -> bool:
    """Pallas kernels run in interpret mode off-TPU (CPU test suite)."""
    return not is_tpu()


def make_mesh(axis_sizes: dict[str, int] | None = None, devices=None) -> jax.sharding.Mesh:
    """Build a device mesh; default is all devices on one 'sp' axis
    (framebuffer-row sharding; SURVEY.md §2.2 parallelism inventory)."""
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = {"sp": len(devices)}
    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    arr = np.array(devices[: int(np.prod(shape))]).reshape(shape)
    return jax.sharding.Mesh(arr, names)
