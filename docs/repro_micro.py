"""Micro-repros for the shadow-512 TPU worker crash (VERDICT r4 #2).

The full-frame bisect (docs/repro_mosaic.py) narrowed the fault to the
enable_shadows path at shadow_map_size=512, 480x272, with BOTH raster
backends (so NOT a Mosaic/pallas fault).  Each case here jits one small
sub-program in its own process so the worker crash attributes to it and the
compile stays seconds, not minutes.

Usage: python docs/repro_micro.py CASE [shadow_size]
Cases: sun_cond   — sun-depth raster (xla backend) under lax.cond
       sun_plain  — same raster, no cond
       pcf        — split4x4 pack + sample_pcf4_window_split at 480x272
       pcf_taps4  — 2x2 pack + 4 one-row taps
       lighting   — full lighting pass alone (no raster/voxelize)
"""

import sys

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vulkan_pbr_renderer_tpu.app.renderer import make_camera
    from vulkan_pbr_renderer_tpu.assets import build_scene, suntemple
    from vulkan_pbr_renderer_tpu.config import RenderConfig
    from vulkan_pbr_renderer_tpu.gpu import sampling
    from vulkan_pbr_renderer_tpu.shade import shadow

    case = sys.argv[1]
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    H, W = 272, 480
    cfg = RenderConfig(width=W, height=H, shadow_map_size=S, lightgrid_size=32,
                       lightgrid_extent=20.0)
    print(f"# case={case} S={S} {W}x{H}", flush=True)

    if case in ("sun_cond", "sun_plain"):
        scene = build_scene(suntemple.build_parts(0.4), suntemple.materials(),
                            texture_size=64)
        from vulkan_pbr_renderer_tpu.app import renderer as rmod
        mat, _ = shadow.sun_matrices(35.0, 80.0, cfg.sun_half_size)

        @jax.jit
        def run(mat, changed, prev):
            def draw(_):
                _, sd, _, _ = rmod._rasterize(
                    scene, mat, S, S, cull="none", backend="xla", cfg=cfg)
                return jnp.where(jnp.isinf(sd), 1.0, sd)

            if case == "sun_cond":
                sd = jax.lax.cond(changed, draw, lambda p: p, prev)
            else:
                sd = draw(prev)
            return sd.mean()

        prev = jnp.ones((S, S), jnp.float32)
        for changed in (True, False, True):
            out = run(mat, jnp.asarray(changed), prev)
            print(f"# OK {case} changed={changed}: {float(out):.5f}", flush=True)
        return

    key = jax.random.PRNGKey(0)
    depth = jax.random.uniform(key, (S, S), jnp.float32)
    wp = jnp.linspace(-20.0, 20.0, H * W * 3).reshape(H, W, 3)
    nrm = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 1))
    n1 = jax.random.uniform(jax.random.PRNGKey(1), (H, W))
    n2 = jax.random.uniform(jax.random.PRNGKey(2), (H, W))
    mat, _ = shadow.sun_matrices(35.0, 80.0, cfg.sun_half_size)

    if case in ("pcf", "pcf_taps4"):
        @jax.jit
        def run(depth, wp):
            if case == "pcf":
                wd = sampling.pack_depth_window_u16_4x4_split(depth)
            else:
                wd = sampling.pack_depth_window_u16(depth)
            vis = shadow.sun_visibility(depth, mat, wp, nrm, n1, n2,
                                        wdepth=wd)
            return vis.mean()

        for k in range(3):
            print(f"# OK {case} rep{k}: {float(run(depth, wp + k * 1e-3)):.5f}",
                  flush=True)
        return

    if case in ("vox_plain", "vox_cond", "vox_chain"):
        from vulkan_pbr_renderer_tpu.shade import gi
        scene = build_scene(suntemple.build_parts(0.4), suntemple.materials(),
                            texture_size=64)
        from vulkan_pbr_renderer_tpu.app import renderer as rmod
        sun_from_world, sun_dir = shadow.sun_matrices(35.0, 80.0,
                                                      cfg.sun_half_size)
        nsamp = gi.voxelize_sample_capacity(scene, 32, cfg.lightgrid_scale)
        print(f"# nsamp={nsamp}", flush=True)

        @jax.jit
        def run(changed, prev_sd, prev_grid):
            def draw(_):
                _, sd, _, _ = rmod._rasterize(
                    scene, sun_from_world, S, S, cull="none", backend="xla",
                    cfg=cfg)
                return jnp.where(jnp.isinf(sd), 1.0, sd)

            if case == "vox_chain":
                sd = jax.lax.cond(changed, draw, lambda p: p, prev_sd)
            else:
                sd = prev_sd

            def vox(_):
                return gi.decode_voxel_grid(gi.voxelize_scene(
                    scene, 32, cfg.lightgrid_scale, sd, sun_from_world,
                    sun_dir, 5.0 * jnp.asarray(cfg.sun_color),
                    total_samples=nsamp))

            if case == "vox_plain":
                grid = vox(None)
            else:
                grid = jax.lax.cond(changed, vox, lambda g: g, prev_grid)
            return grid.mean() + sd.mean()

        prev_sd = depth
        prev_grid = jnp.zeros((32, 32, 32, 4), jnp.float32)
        for changed in (True, False, True):
            out = run(jnp.asarray(changed), prev_sd, prev_grid)
            print(f"# OK {case} changed={changed}: {float(out):.5f}",
                  flush=True)
        return

    raise SystemExit(f"unknown case {case}")


if __name__ == "__main__":
    main()
