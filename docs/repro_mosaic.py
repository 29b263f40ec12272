"""Bisect the TPU-only Mosaic fault at the 480x272 SCALE config (VERDICT r3 #2).

Known facts (PERF_NOTES r3 wave 14): tests/test_goldens_scale.py's MID config
(480x272, shadow 256..512, lightgrid 32) kills the TPU worker with the pallas
raster backend; bench scale (1920x1088, shadow 2048, grid 128) and the default
headless 480x272 run fine; the CPU suite runs Pallas in interpret mode so CI
can't see it.

Usage:  python docs/repro_mosaic.py key:v,key:v [pass]
  pass = frame (default: full render_frame) | raster (main raster only) |
         sun (sun-depth raster only)
Each invocation is ONE process so a worker crash is attributable to the
printed config.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse(v):
    for conv in (int, float):
        try:
            return conv(v)
        except ValueError:
            pass
    return {"True": True, "False": False}.get(v, v)


def main():
    import jax
    import jax.numpy as jnp

    from vulkan_pbr_renderer_tpu.app.renderer import Renderer, make_camera
    from vulkan_pbr_renderer_tpu.assets import build_scene, suntemple
    from vulkan_pbr_renderer_tpu.config import RenderConfig

    kw = {}
    if len(sys.argv) > 1 and sys.argv[1] != "-":
        kw = {k: parse(v) for k, v in
              (s.split(":") for s in sys.argv[1].split(",") if s)}
    which = sys.argv[2] if len(sys.argv) > 2 else "frame"
    backend = kw.pop("backend", "pallas")

    base = dict(
        width=480, height=272, shadow_map_size=256, lightgrid_size=32,
        lightgrid_extent=20.0, prefiltered_env_size=32,
        prefiltered_env_min_size=8, prefilter_samples=256, brdf_lut_size=32,
        brdf_lut_samples=256, irradiance_size=8, irradiance_samples=32,
        bloom_pass_count=5, gi_screen_trace_steps=8, gi_diffuse_steps=8,
        gi_specular_steps=8, light_shaft_steps=8,
    )
    base.update(kw)
    cfg = RenderConfig(**base)
    detail = float(os.environ.get("REPRO_DETAIL", "0.4"))
    scene = build_scene(suntemple.build_parts(detail), suntemple.materials(),
                        texture_size=64)
    print(f"# cfg: {cfg.width}x{cfg.height} shadow={cfg.shadow_map_size} "
          f"grid={cfg.lightgrid_size} tris={scene.num_tris} pass={which} "
          f"backend={backend}",
          flush=True)

    if which == "frame":
        r = Renderer(cfg, scene, use_cache=False, raster_backend=backend)
        cam = make_camera(*suntemple.camera_path(0.3), cfg)
        img = None
        for _ in range(2):
            img = r.render(cam, sun_angle=(35.0, 80.0))
        print("# OK frame:", jnp.asarray(img).mean(), flush=True)
        return

    from vulkan_pbr_renderer_tpu.app import renderer as rmod
    from vulkan_pbr_renderer_tpu.shade import shadow

    cam = make_camera(*suntemple.camera_path(0.3), cfg)
    if which == "raster":
        h, w = cfg.height, cfg.width
        mat = jnp.asarray(cam.clip_from_world)
        cull = "back"
    else:  # sun-depth raster at shadow_map_size^2
        h = w = cfg.shadow_map_size
        mat, _ = shadow.sun_matrices(35.0, 80.0, cfg.sun_half_size)
        cull = "none"

    @jax.jit
    def run(mat):
        _, depth, tri, ovf = rmod._rasterize(
            scene, mat, w, h, cull=cull, backend=backend, cfg=cfg)
        return depth.mean(), tri.max(), ovf

    out = run(mat)
    jax.block_until_ready(out)
    print("# OK", which, [float(x) for x in out[:2]],
          [int(x) for x in out[2]], flush=True)


if __name__ == "__main__":
    main()
