"""Device management — the TPU replacement for GPU_Init/GPU_Deinit.

The reference's GPU_Init (gpu_vulkan.c:945-1140) creates a Vulkan
instance/device/queue and six samplers; on TPU the runtime is jax itself, so
this module is thin: backend detection, interpret-mode policy for Pallas
kernels (CPU testing), and mesh construction for the multi-chip path.
"""

from __future__ import annotations

import jax
import numpy as np


def init_devices(retries: int = 3, delay_s: float = 2.0):
    """First device contact with retry on transient runtime-init failures
    (SURVEY §5 failure-detection plan: the TPU tunnel / plugin can fail
    transiently at startup the way Vulkan device creation can; the reference
    only ever asserts, gpu_vulkan.c:387-392 — we retry then surface).
    Returns jax.devices().  Used by the headless/preview entry points; safe
    to call again once initialized (jax caches the backend)."""
    import time

    last = None
    for attempt in range(retries):
        try:
            return jax.devices()
        except RuntimeError as e:  # backend init failures surface as RuntimeError
            last = e
            if attempt + 1 < retries:
                time.sleep(delay_s * (attempt + 1))
    raise RuntimeError(
        f"device init failed after {retries} attempts: {last}"
    ) from last


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
