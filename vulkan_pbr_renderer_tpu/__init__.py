"""vulkan_pbr_renderer_tpu — a TPU-native deferred PBR renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
uuwee/Vulkan-PBR-Renderer (a Vulkan 1.3 deferred PBR renderer with dynamic
voxel-grid GI, sun shadow mapping, split-sum IBL, TAA, physically-based bloom
and ACES tonemapping).  Nothing here is a port: the Vulkan render graph,
descriptor sets and GLSL passes are replaced by a single jit-compiled frame
function over jax Arrays, with Pallas kernels for the rasterizer hot path.

Layer map (mirrors SURVEY.md §1, reference file pointers in the docstrings):

  utils/     L0  — math, noise, color, image metrics (replaces HandmadeMath + Fire)
  gpu/       L2  — device/resource/sampling runtime (replaces src/gpu/gpu_vulkan.c)
  raster/    L3' — visibility-buffer tile rasterizer (replaces fixed-function raster)
  shade/     L3' — BRDF library + lighting/TAA/bloom/tonemap passes (replaces *.glsl)
  bake/      L3' — one-time IBL precompute (replaces gen_*.glsl compute passes)
  assets/    L4  — glTF/FBX/DDS/HDR/TGA loaders + procedural scenes (replaces asset_import.cpp)
  app/       L4  — renderer orchestration, camera, headless CLI (replaces main.cpp/render.cpp)
  parallel/  —   multi-chip sharding of the frame (new capability; reference is single-GPU)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Geometry math (vertex transforms, matrix inverses) must run at true f32:
# TPU "default" matmul precision decomposes f32 matmuls into bf16 passes,
# which quantizes clip-space positions into garbage depth.  The renderer has
# no large matmuls where bf16 would pay, so force full precision globally.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the full frame takes minutes to compile and
# every fresh process recompiles it; the on-disk cache makes repeat runs of
# unchanged code near-instant (measured 95 s -> 5.4 s through the TPU
# tunnel).  Opt out with VPR_COMPILATION_CACHE=0 or point it elsewhere with
# VPR_COMPILATION_CACHE=<dir>.
_cache = _os.environ.get("VPR_COMPILATION_CACHE", "")
if _cache != "0":
    if _cache in ("", "1"):
        _cache = _os.path.expanduser("~/.cache/vulkan_pbr_renderer_tpu/jax")
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except (OSError, AttributeError):  # read-only fs / older jax: best-effort
        pass
