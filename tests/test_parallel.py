"""Multi-chip sharded frame step on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vulkan_pbr_renderer_tpu.app.renderer import init_frame_state, make_camera
from vulkan_pbr_renderer_tpu.assets import build_scene, suntemple, procedural
from vulkan_pbr_renderer_tpu.bake import ibl
from vulkan_pbr_renderer_tpu.config import RenderConfig
from vulkan_pbr_renderer_tpu.gpu import sampling
from vulkan_pbr_renderer_tpu.parallel import sharding


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_frame_matches_shape_and_is_finite():
    cfg = RenderConfig(
        width=128, height=256, shadow_map_size=128, lightgrid_size=16,
        lightgrid_extent=10.0, prefiltered_env_size=16, prefiltered_env_min_size=8,
        prefilter_samples=64, brdf_lut_size=16, brdf_lut_samples=64,
        irradiance_size=8, irradiance_samples=32, bloom_pass_count=3,
        gi_screen_trace_steps=4, gi_diffuse_steps=4, gi_specular_steps=4,
        light_shaft_steps=4,
    )
    mesh = sharding.make_mesh(8, dp=2)
    scene = build_scene(suntemple.build_parts(0.15), suntemple.materials(),
                        texture_size=16)
    env = jnp.asarray(procedural.make_sky_cubemap(16))
    atlas = sampling.build_cube_mip_atlas(env)
    pre = ibl.bake_prefiltered_env(atlas, 16, 16, 8, 64)
    lut = ibl.bake_brdf_lut(16, 64)
    state = init_frame_state(cfg)

    cams = [make_camera((0.0, -20.0 + i, 3.0), (0.0, 0.0, 3.0), cfg) for i in range(2)]
    cam_batch = tuple(
        jnp.stack([getattr(c, f) for c in cams])
        for f in ("clip_from_world", "clip_from_view", "world_from_clip",
                  "view_from_clip", "view_from_world", "world_from_view", "position")
    )
    step = sharding.sharded_frame_fn(scene, cfg, mesh, raster_backend="xla")
    out = step(cam_batch, state.lightgrid, state.prev_pyramid,
               jnp.asarray([35.0, 80.0], jnp.float32), pre, lut)
    assert out.shape == (2, cfg.height, cfg.width, 3)
    assert bool(jnp.isfinite(out).all())
    o = np.asarray(out)
    # the two dp frames use different cameras -> different images
    assert np.abs(o[0] - o[1]).mean() > 1e-4
    # row-shard seams: adjacent rows across shard boundaries stay continuous
    # (stochastic GI varies per row; bound the seam by typical row-to-row delta)
    rows = cfg.height // mesh.shape["sp"]
    seam = np.abs(o[:, rows - 1] - o[:, rows]).mean()
    typical = np.mean([np.abs(o[:, r] - o[:, r + 1]).mean() for r in range(8, 56)])
    assert seam < typical * 5 + 0.05, (seam, typical)
