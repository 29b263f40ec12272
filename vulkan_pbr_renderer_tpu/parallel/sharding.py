"""Multi-chip frame execution via jax.sharding + shard_map.

The reference is strictly single-GPU (SURVEY.md §2.2 parallelism inventory:
one Vulkan queue, no multi-device code).  This module is the new capability:
the frame is laid out over a 2-D device mesh

  dp — data parallel over independent frames (camera-path batches: offline
       rendering / bench sweeps are embarrassingly parallel)
  sp — "spatial parallel": framebuffer rows sharded across chips

Inside one frame (per dp slice), each sp shard:
  1. rasterizes its rows of the sun shadow map; all_gather -> full map
     (every shard needs arbitrary shadow lookups)
  2. voxelizes a 1/sp slice of the GI surface samples; the partial radiance
     grids combine with an elementwise pmax (matching the scatter-max write)
  3. sweeps the (replicated, 16 MiB) lightgrid locally — cheaper than
     communicating it
  4. rasterizes + G-buffers + lights its own rows (the heavy per-pixel work;
     the GI screen-space trace reads the all_gathered full depth)
  5. all_gathers the HDR rows; TAA/bloom/tonemap run replicated (their
     cost is a few % of the frame; sharding them needs halo exchanges —
     future work)

Collectives ride ICI (all_gather/pmax over 'sp').  Temporal state is carried
replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderConfig
from ..raster import setup as rsetup
from ..raster import visibility, xla_raster
from ..shade import bloom as bloom_mod
from ..shade import gbuffer as gb
from ..shade import gi, lighting, shadow
from ..utils import color as colorlib


def make_mesh(n_devices=None, dp=1):
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % dp == 0, "dp must divide device count"
    arr = np.array(devices[:n]).reshape(dp, n // dp)
    return Mesh(arr, ("dp", "sp"))


def _rasterize_rows(scene, mat, width, full_height, rows, y_origin, cull, backend, cfg):
    clip = rsetup.transform_to_clip(scene.positions, mat)
    tri_clip = clip[scene.indices]
    # NOTE: setup maps NDC to pixels with the FULL viewport height; the shard
    # then rasterizes only its [y_origin, y_origin+rows) slice
    s = rsetup.setup_triangles(tri_clip, width, full_height, cull=cull)
    if backend == "pallas":
        d, t = visibility.rasterize_vis_tiled(
            s, width, rows, tile_capacity=cfg.tile_capacity,
            y_origin=y_origin,
        )
    else:
        d, t = xla_raster.rasterize_vis(s, width, rows, y_origin=y_origin)
    return s, d, t


def sharded_frame_fn(scene, cfg: RenderConfig, mesh: Mesh, raster_backend="xla"):
    """Builds the jitted sharded step.

    step(cams_batch [dp-sharded pytree], state-lite, sun_angle,
         prefiltered_env, brdf_lut) -> final images [dp, H, W, 3].
    """
    sp = mesh.shape["sp"]
    # reduced-res GI/shaft upsampling would clamp at shard edges and seam;
    # with the work already spread over chips, run those passes at full res
    cfg = cfg.replace(gi_res_divisor=1, shaft_res_divisor=1)
    h, w = cfg.height, cfg.width
    assert h % (sp * 32) == 0, "height must be divisible by sp*tile_h"
    rows = h // sp

    def per_frame(cam_tuple, lightgrid, prev_pyramid, sun_angle, pre_env, lut):
        """Runs inside shard_map for one dp slice; sp = row sharding."""
        (cfw, cfv, wfc, vfc, vfw, wfv, cam_pos) = cam_tuple
        sp_idx = jax.lax.axis_index("sp")
        y0 = sp_idx * rows

        sun_from_world, sun_dir = shadow.sun_matrices(
            sun_angle[0], sun_angle[1], cfg.sun_half_size
        )

        # 1. sun depth: shard shadow-map rows, gather
        sm = cfg.shadow_map_size
        sm_rows = sm // sp
        _, sd_rows, _ = _rasterize_rows(
            scene, sun_from_world, sm, sm, sm_rows, sp_idx * sm_rows, "none",
            raster_backend, cfg,
        )
        sd_rows = jnp.where(jnp.isinf(sd_rows), 1.0, sd_rows)
        sun_depth = jax.lax.all_gather(sd_rows, "sp", axis=0, tiled=True)

        # 2. voxelize a slice of the samples; combine with pmax
        if cfg.enable_gi:
            part = gi.voxelize_scene(
                scene, cfg.lightgrid_size, cfg.lightgrid_scale, sun_depth,
                sun_from_world, sun_dir,
                cfg.voxelize_sun_emission_scale * jnp.asarray(cfg.sun_color),
                total_samples=(1 << 18) // sp,
                sample_offset=sp_idx,
            )
            grid = jax.lax.pmax(part, "sp")
            # 3. sweep locally (replicated math)
            grid = gi.sweep_lightgrid(grid, 2, cfg.skylight,
                                      cfg.sweep_move_ratio, cfg.sweep_blend)
        else:
            grid = lightgrid

        # 4. raster + gbuffer + lighting for my rows
        s, depth, tri = _rasterize_rows(
            scene, cfw, w, h, rows, y0, "back", raster_backend, cfg
        )
        gbuf = gb.gbuffer_pass(
            scene, s, jnp.where(jnp.isinf(depth), 1.0, depth), tri, cfw, cfw,
            cfg.alpha_test_threshold, row_offset=y0,
        )
        depth_full = jax.lax.all_gather(gbuf.depth, "sp", axis=0, tiled=True)

        glob = lighting.Globals(
            clip_from_world=cfw, clip_from_view=cfv, world_from_clip=wfc,
            view_from_clip=vfc, view_from_world=vfw, world_from_view=wfv,
            sun_from_world=sun_from_world, old_clip_from_world=cfw,
            sun_direction=sun_dir, camera_pos=cam_pos,
            frame_idx_mod_59=jnp.float32(0.0),
            taa_jitter=jnp.zeros(2), taa_jitter_prev=jnp.zeros(2),
        )
        res = lighting.LightingResources(
            sun_depth=sun_depth, lightgrid=grid, prefiltered_env=pre_env,
            brdf_lut=lut, prev_frame_atlas=prev_pyramid,
        )
        hdr_rows = lighting.lighting_pass(
            gbuf, glob, res, cfg, row_offset=y0, full_height=h,
            depth_full=depth_full,
        )

        # 5. gather HDR; replicated post stack
        hdr = jax.lax.all_gather(hdr_rows, "sp", axis=0, tiled=True)
        if cfg.enable_bloom:
            hdr, _ = bloom_mod.bloom_with_pyramid(
                hdr, cfg.bloom_pass_count, cfg.bloom_strength
            )
        return colorlib.gamma_encode(colorlib.aces_approx(cfg.exposure * hdr))

    def step(cams, lightgrid, prev_pyramid, sun_angle, pre_env, lut):
        """cams: pytree of [dp, ...] camera matrices."""

        def shard_fn(cams_l, lightgrid_l, pyramid_l, sun_l, pre_l, lut_l):
            out = per_frame(
                tuple(x[0] for x in cams_l), lightgrid_l, pyramid_l,
                sun_l, pre_l, lut_l,
            )
            return out[None]

        return jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P("dp"), P(), P(), P(), P(), P()),
            out_specs=P("dp"),
            check_vma=False,
        )(cams, lightgrid, prev_pyramid, sun_angle, pre_env, lut)

    return jax.jit(step)
