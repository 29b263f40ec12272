"""The renderer: owns resources and the single jitted frame function.

This is the TPU replacement for InitRenderer + BuildRenderCommands + the
GPU_Graph machinery (render.cpp:654-873, 954-1196; gpu_vulkan.c graphs).  The
whole 9-pass frame is ONE jit-compiled function over device arrays — XLA's
dataflow replaces GPU_InsertBarriers, buffer donation replaces the ping-pong
render targets, and `lax.cond` replaces the CPU-side re-voxelize condition
(render.cpp:1024).

Frame pass order (matches render.cpp:954-1196):
  1 sun depth  2 voxelize(cond)  3 lightgrid sweep  4 geometry  5 lighting
  6 TAA resolve  7 bloom down  8 bloom up  9 tonemap
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..gpu import sampling
from ..raster import setup as rsetup
from ..raster import xla_raster
from ..shade import bloom as bloom_mod
from ..shade import gbuffer as gb
from ..shade import gi, lighting, shadow, taa
from ..utils import color as colorlib
from ..utils import math3d as m3
from ..utils import noise as noiselib
from ..bake import cache as bake_cache
from ..bake import ibl


class FrameState(NamedTuple):
    """Temporal state carried (donated) across frames — the TPU analogue of
    the reference's ping-pong RTs + persistent lightgrid (render.cpp:680-697)."""

    lightgrid: jnp.ndarray          # [D,D,D,4]
    sun_depth: jnp.ndarray          # [S,S] cached sun shadow map (the scene is
                                    # static, so it only changes with the sun —
                                    # same reasoning as the reference's
                                    # re-voxelize condition, render.cpp:1024)
    taa_history: jnp.ndarray        # [H,W,3] prev TAA output
    velocity_prev: jnp.ndarray      # [H,W,2]
    prev_pyramid: jnp.ndarray       # [H/2,Wa,3] prev bloom downscale atlas
    clip_from_world_prev: jnp.ndarray  # [4,4]
    sun_angle_prev: jnp.ndarray     # [2]
    frame_idx: jnp.ndarray          # i32 scalar
    raster_overflow: jnp.ndarray    # i32[2] running max of [max_tile_segment,
                                    # total_pairs] across frames — nonzero
                                    # excess over (tile_capacity,
                                    # pair_capacity) means dropped triangles;
                                    # host checks via Renderer.check_overflow
    gi_cache: jnp.ndarray           # [2,Hg,Wg,3] temporal fast-GI cache
                                    # (ambient, specular) for the
                                    # cfg.gi_temporal_div column interleave;
                                    # zeros((2,1,1,3)) when inactive


class CameraState(NamedTuple):
    """Host-computed camera matrices for one frame (camera.h:102-120)."""

    clip_from_world: jnp.ndarray
    clip_from_view: jnp.ndarray
    world_from_clip: jnp.ndarray
    view_from_clip: jnp.ndarray
    view_from_world: jnp.ndarray
    world_from_view: jnp.ndarray
    position: jnp.ndarray           # [3]


def make_camera(position, target, cfg: RenderConfig, up=(0.0, 0.0, 1.0)) -> CameraState:
    view_from_world = m3.look_at(position, target, up)
    clip_from_view = m3.perspective_lh_zo(
        np.deg2rad(cfg.fov_y_deg), cfg.aspect, cfg.z_near, cfg.z_far
    )
    clip_from_world = clip_from_view @ view_from_world
    return CameraState(
        clip_from_world=clip_from_world,
        clip_from_view=clip_from_view,
        world_from_clip=m3.inverse(clip_from_world),
        view_from_clip=m3.inverse(clip_from_view),
        view_from_world=view_from_world,
        world_from_view=m3.inverse(view_from_world),
        position=jnp.asarray(position, jnp.float32),
    )


def init_frame_state(cfg: RenderConfig) -> FrameState:
    d = cfg.lightgrid_size
    h, w = cfg.height, cfg.width
    ph, pw = h // 2, w // 2
    offs, pwa = sampling.mip_offsets(ph, pw, cfg.bloom_pass_count)
    return FrameState(
        lightgrid=jnp.zeros((d, d, d, 4), jnp.float32),
        sun_depth=jnp.ones((cfg.shadow_map_size,) * 2, jnp.float32),
        taa_history=jnp.zeros((h, w, 3), jnp.float32),
        velocity_prev=jnp.zeros((h, w, 2), jnp.float32),
        prev_pyramid=jnp.zeros((ph, pwa, 3), jnp.bfloat16),
        clip_from_world_prev=jnp.eye(4, dtype=jnp.float32),
        sun_angle_prev=jnp.full((2,), jnp.inf, jnp.float32),
        frame_idx=jnp.int32(0),
        raster_overflow=jnp.zeros((2,), jnp.int32),
        gi_cache=(jnp.zeros((2, h // cfg.gi_res_divisor,
                             w // cfg.gi_res_divisor, 3), jnp.float32)
                  if lighting.gi_temporal_active(cfg)
                  else jnp.zeros((2, 1, 1, 3), jnp.float32)),
    )


def _rasterize(scene, mat, width, height, jitter=None, cull="back", backend="xla",
               cfg=None):
    """Raster the scene: returns (TriSetup, depth, tri_id, overflow i32[2]).

    overflow = [max_tile_segment, total_pairs] from binning (zeros on the
    XLA path, which has no capacity limits)."""
    # Transform the STATIC per-triangle position rows (scene.tri_attr[:, :9]
    # == positions[indices], bit-identical) instead of transforming vertices
    # and gathering by index: the [T*3] vertex gather cost ~10 ms/frame at
    # 638k tris (round-2 hlo_stats fusion.1901); the extra transform FLOPs
    # (3x vertices) are noise on the MXU.
    tri_pos = scene.tri_attr[:, :9].reshape(-1, 3, 3)
    tri_clip = rsetup.transform_to_clip(tri_pos, mat, jitter)
    s = rsetup.setup_triangles(tri_clip, width, height, cull=cull)
    if backend == "pallas":
        if cfg is None or cfg.raster_kernel == "folded":
            from ..raster import visibility_v2

            kw = {}
            if cfg is not None:
                kw = dict(tile=cfg.folded_tile, chunk=cfg.tri_chunk,
                          pair_capacity=cfg.pair_capacity_factor * scene.num_tris,
                          hiz=cfg.raster_hiz)
            depth, tri, ovf = visibility_v2.rasterize_vis_folded(
                s, width, height, return_overflow=True, **kw)
        else:
            from ..raster import visibility

            kw = {}
            if cfg is not None:
                kw = dict(tile_h=cfg.tile_h, tile_w=cfg.tile_w,
                          tile_capacity=cfg.tile_capacity, chunk=cfg.tri_chunk,
                          pair_capacity=cfg.pair_capacity_factor * scene.num_tris)
            depth, tri, ovf = visibility.rasterize_vis_tiled(
                s, width, height, return_overflow=True, **kw)
    else:
        depth, tri = xla_raster.rasterize_vis(s, width, height)
        ovf = jnp.zeros((2,), jnp.int32)
    return s, depth, tri, ovf


class FrameInputs(NamedTuple):
    """Per-frame derived scalars/matrices, shared by the single-chip frame and
    the sharded frame (parallel/sharding.py) so the two paths cannot drift."""

    jitter: jnp.ndarray
    jitter_prev: jnp.ndarray
    sun_from_world: jnp.ndarray
    sun_dir: jnp.ndarray
    old_clip_from_world: jnp.ndarray
    sun_changed: jnp.ndarray


def frame_inputs(state: FrameState, cam: CameraState, sun_angle, cfg) -> FrameInputs:
    fidx_f = state.frame_idx.astype(jnp.float32)
    sun_from_world, sun_dir = shadow.sun_matrices(
        sun_angle[0], sun_angle[1], cfg.sun_half_size
    )
    return FrameInputs(
        jitter=noiselib.taa_jitter(fidx_f, cfg.width, cfg.height),
        jitter_prev=noiselib.taa_jitter(jnp.maximum(fidx_f - 1.0, 0.0),
                                        cfg.width, cfg.height),
        sun_from_world=sun_from_world,
        sun_dir=sun_dir,
        old_clip_from_world=jnp.where(
            state.frame_idx == 0, cam.clip_from_world, state.clip_from_world_prev
        ),
        # the scene is static: re-raster shadow map / re-voxelize only when the
        # sun moved (the reference's condition, render.cpp:1024)
        sun_changed=(state.frame_idx == 0)
        | jnp.any(sun_angle != state.sun_angle_prev),
    )


def sweep_rotated(lightgrid, frame_idx, cfg):
    """Pass 3: lightgrid sweep, axis rotating per frame (render.cpp:1064-1069).

    Under the temporal GI interleave with cfg.gi_temporal_sweep="cycle" the
    axis holds for each 2-frame refresh cycle (see config.py rationale)."""
    if cfg.gi_temporal_sweep == "cycle" and lighting.gi_temporal_active(cfg):
        axis = (frame_idx // cfg.gi_temporal_div) % 3
    else:
        axis = frame_idx % 3
    return jax.lax.switch(
        axis,
        [
            lambda g: gi.sweep_lightgrid(g, 2, cfg.skylight, cfg.sweep_move_ratio, cfg.sweep_blend),
            lambda g: gi.sweep_lightgrid(g, 1, cfg.skylight, cfg.sweep_move_ratio, cfg.sweep_blend),
            lambda g: gi.sweep_lightgrid(g, 0, cfg.skylight, cfg.sweep_move_ratio, cfg.sweep_blend),
        ],
        lightgrid,
    )


def build_globals(cam: CameraState, fi: FrameInputs, frame_idx) -> "lighting.Globals":
    """Per-frame uniform block for the lighting pass (render.h:122-136)."""
    return lighting.Globals(
        clip_from_world=cam.clip_from_world,
        clip_from_view=cam.clip_from_view,
        world_from_clip=cam.world_from_clip,
        view_from_clip=cam.view_from_clip,
        view_from_world=cam.view_from_world,
        world_from_view=cam.world_from_view,
        sun_from_world=fi.sun_from_world,
        old_clip_from_world=fi.old_clip_from_world,
        sun_direction=fi.sun_dir,
        camera_pos=cam.position,
        frame_idx_mod_59=(frame_idx % 59).astype(jnp.float32),
        taa_jitter=fi.jitter,
        taa_jitter_prev=fi.jitter_prev,
    )


def post_stack(hdr, depth, velocity, state: FrameState, cfg):
    """Passes 6-9: TAA resolve, bloom down/up, tonemap (render.cpp:1129-1196).

    Returns (final srgb image, taa_out, bloom pyramid atlas)."""
    if cfg.enable_taa:
        with jax.named_scope("p6_taa"):
            history = jnp.where(state.frame_idx == 0, hdr, state.taa_history)
            taa_out = taa.taa_resolve(
                hdr, depth, velocity, state.velocity_prev, history,
                cfg.taa_blend, cfg.taa_velocity_rejection,
                catmull_history=cfg.taa_catmull_history,
                full_rgb_catmull=cfg.taa_full_rgb_catmull,
            )
    else:
        taa_out = hdr
    if cfg.enable_bloom:
        with jax.named_scope("p78_bloom"):
            bloom_out, downs = bloom_mod.bloom_with_pyramid(
                taa_out, cfg.bloom_pass_count, cfg.bloom_strength
            )
            # bf16 STORAGE (the reference's RGBA16F RTs, render.cpp:693-697):
            # halves the prev-frame atlas the GI screen terms gather from
            # next frame; the chain arithmetic itself stays f32 for the
            # sharded exactness contract (bloom.py rationale)
            pyramid = sampling.pack_mip_atlas(downs).astype(jnp.bfloat16)
    else:
        bloom_out = taa_out
        pyramid = state.prev_pyramid
    with jax.named_scope("p9_tonemap"):
        final = colorlib.gamma_encode(colorlib.aces_approx(cfg.exposure * bloom_out))
    return final, taa_out, pyramid


@functools.partial(
    jax.jit, static_argnames=("cfg", "raster_backend"),
    # VPR_NO_DONATE=1: crash-bisect control (docs/repro_mosaic.py) — buffer
    # donation changes XLA's aliasing/layout assignment, a candidate trigger
    # for the scale-config worker fault
    donate_argnames=(() if os.environ.get("VPR_NO_DONATE") == "1"
                     else ("state",)))
def render_frame(
    scene,
    state: FrameState,
    cam: CameraState,
    sun_angle,               # [2] degrees (params.sun_angle, render.h:207)
    prefiltered_env,         # [6,S,Wa,3]
    brdf_lut,                # [L,L,2]
    cfg: RenderConfig,
    raster_backend: str = "xla",
):
    """One full frame.  Returns (new_state, final_srgb_image [H,W,3])."""
    h, w = cfg.height, cfg.width
    frame_idx = state.frame_idx

    fi = frame_inputs(state, cam, sun_angle, cfg)
    jitter = fi.jitter
    sun_from_world, sun_dir = fi.sun_from_world, fi.sun_dir
    old_clip_from_world = fi.old_clip_from_world

    # ---- pass 1: sun depth (render.cpp:999-1020) -------------------------
    sun_changed = fi.sun_changed
    if cfg.enable_shadows:
        def draw_sun(_):
            _, sd, _, ovf = _rasterize(
                scene, sun_from_world, cfg.shadow_map_size, cfg.shadow_map_size,
                cull="none", backend=raster_backend, cfg=cfg,
            )
            return jnp.where(jnp.isinf(sd), 1.0, sd), ovf

        with jax.named_scope("p1_sun_depth"):
            sun_depth, sun_ovf = jax.lax.cond(
                sun_changed, draw_sun,
                lambda s: (s, jnp.zeros((2,), jnp.int32)), state.sun_depth)
    else:
        sun_depth = state.sun_depth
        sun_ovf = jnp.zeros((2,), jnp.int32)

    # ---- pass 2: voxelize (cond; render.cpp:1022-1057) -------------------
    if cfg.enable_gi:
        revox = sun_changed

        def do_voxelize(grid):
            return gi.decode_voxel_grid(gi.voxelize_scene(
                scene, cfg.lightgrid_size, cfg.lightgrid_scale, sun_depth,
                sun_from_world, sun_dir,
                cfg.voxelize_sun_emission_scale * jnp.asarray(cfg.sun_color),
                total_samples=cfg.voxelize_samples or (1 << 20),
            ))

        with jax.named_scope("p2_voxelize"):
            lightgrid = jax.lax.cond(revox, do_voxelize, lambda g: g, state.lightgrid)

        # ---- pass 3: sweep, axis rotates per frame (render.cpp:1064-1069)
        with jax.named_scope("p3_sweep"):
            lightgrid = sweep_rotated(lightgrid, frame_idx, cfg)
    else:
        lightgrid = state.lightgrid

    # ---- pass 4: geometry -> G-buffer (render.cpp:1074-1115) -------------
    with jax.named_scope("p4_raster"):
        s, depth, tri, main_ovf = _rasterize(
            scene, cam.clip_from_world, w, h, jitter=jitter, cull="back",
            backend=raster_backend, cfg=cfg,
        )
    with jax.named_scope("p4_gbuffer"):
        gbuf = gb.gbuffer_pass(
            scene, s, jnp.where(jnp.isinf(depth), 1.0, depth), tri,
            cam.clip_from_world, old_clip_from_world, cfg.alpha_test_threshold,
            world_from_clip=cam.world_from_clip, jitter=jitter,
            material_filter=cfg.material_filter,
            frame_idx_mod_59=(frame_idx % 59).astype(jnp.float32),
        )

    # ---- pass 5: lighting ------------------------------------------------
    glob = build_globals(cam, fi, frame_idx)
    res = lighting.LightingResources(
        sun_depth=sun_depth,
        lightgrid=lightgrid,
        prefiltered_env=prefiltered_env,
        brdf_lut=brdf_lut,
        prev_frame_atlas=state.prev_pyramid,
    )
    with jax.named_scope("p5_lighting"):
        gi_cache = state.gi_cache
        if cfg.visualize_lightgrid:
            hdr = lighting.visualize_lightgrid_pass(glob, res, cfg, w, h)
        elif lighting.gi_temporal_active(cfg):
            hdr, gi_cache = lighting.lighting_pass(
                gbuf, glob, res, cfg, gi_cache=state.gi_cache,
                frame_idx=frame_idx)
        else:
            hdr = lighting.lighting_pass(gbuf, glob, res, cfg)

    # ---- passes 6-9: TAA, bloom, tonemap ---------------------------------
    final, taa_out, pyramid = post_stack(hdr, gbuf.depth, gbuf.velocity, state, cfg)

    new_state = FrameState(
        lightgrid=lightgrid,
        sun_depth=sun_depth,
        taa_history=taa_out,
        velocity_prev=gbuf.velocity,
        prev_pyramid=pyramid,
        clip_from_world_prev=cam.clip_from_world,
        sun_angle_prev=jnp.asarray(sun_angle, jnp.float32),
        frame_idx=frame_idx + 1,
        raster_overflow=jnp.maximum(
            state.raster_overflow, jnp.maximum(sun_ovf, main_ovf)
        ),
        gi_cache=gi_cache,
    )
    return new_state, final


@functools.partial(
    jax.jit, static_argnames=("cfg", "raster_backend"),
    donate_argnames=(() if os.environ.get("VPR_NO_DONATE") == "1"
                     else ("state",)))
def render_frame_packed(scene, state, cam_sun, prefiltered_env, brdf_lut,
                        cfg, raster_backend="xla"):
    """render_frame with the per-frame fresh host inputs (6 camera matrices
    + position + sun angle) packed into ONE [101] f32 vector.

    The tunnel charges ~25 ms latency per host->device transfer; the
    interactive path (Renderer.render, one camera per call) was paying 8 of
    them per frame — ~190 ms of the preview tick above the render itself
    (docs/preview_bench.py, PERF_NOTES r5 wave 5).  Bit-exact: the unpack
    is reshape-only, and the nested render_frame jit inlines."""
    mats = [cam_sun[i * 16:(i + 1) * 16].reshape(4, 4) for i in range(6)]
    cam = CameraState(*mats, cam_sun[96:99])
    return render_frame(scene, state, cam, cam_sun[99:101],
                        prefiltered_env, brdf_lut, cfg, raster_backend)


class Renderer:
    """Host-side orchestration: bake IBL once, then step frames.

    Mirrors main.cpp: init (window/GPU/renderer/assets) then the frame loop.
    """

    def __init__(self, cfg: RenderConfig, scene, env_faces=None, use_cache=True,
                 raster_backend="auto"):
        if cfg.enable_gi and cfg.voxelize_samples == 0:
            # right-size the static voxelize sample stream for this scene
            # (bit-identical results for any capacity >= the true count)
            cfg = cfg.replace(voxelize_samples=gi.voxelize_sample_capacity(
                scene, cfg.lightgrid_size, cfg.lightgrid_scale))
        self.cfg = cfg
        self.scene = scene
        if raster_backend == "auto":
            raster_backend = "xla" if scene.num_tris <= 4096 else "pallas"
        self.raster_backend = raster_backend

        if env_faces is None:
            from ..assets import procedural

            env_faces = procedural.make_sky_cubemap(128)
        env = jnp.asarray(env_faces, jnp.float32)
        env_atlas = sampling.build_cube_mip_atlas(env)
        self.env_base = env.shape[1]

        # Baked even when IBL is disabled: the sky fallback always samples the
        # prefiltered env atlas.  The irradiance map is deliberately NOT baked
        # here — the reference also leaves it unused (lighting_pass.glsl:689-691
        # is commented out); bake/ibl.bake_irradiance exists for parity and is
        # covered by tests/test_bake.py.
        self.prefiltered_env_raw = bake_cache.cached_bake(
            "prefiltered_env",
            lambda: ibl.bake_prefiltered_env(
                env_atlas, self.env_base, cfg.prefiltered_env_size,
                cfg.prefiltered_env_min_size, cfg.prefilter_samples,
            ),
            env, cfg.prefiltered_env_size, cfg.prefilter_samples,
            enabled=use_cache,
        )
        # window-packed f16 view: 1-row static-level / 2-row dynamic-LOD
        # cubemap samples in the lighting pass (sampling.py rationale)
        self.prefiltered_env = sampling.pack_cube_mip_atlas_window(
            self.prefiltered_env_raw, cfg.prefiltered_env_size
        )
        self.brdf_lut = bake_cache.cached_bake(
            "brdf_lut",
            lambda: ibl.bake_brdf_lut(cfg.brdf_lut_size, cfg.brdf_lut_samples),
            cfg.brdf_lut_size, cfg.brdf_lut_samples,
            enabled=use_cache,
        )
        self.state = init_frame_state(cfg)

    def render(self, cam: CameraState, sun_angle=(50.0, 30.0)):
        """Render one frame; updates temporal state. Returns [H,W,3] float.

        Setting `renderer.state = None` resets the temporal state (TAA
        history, lightgrid, cached sun map) before the next frame — the
        per-camera-point reset the bench's SSIM section relies on.

        The camera + sun ride ONE packed [101] vector: the per-frame fresh
        host arrays are otherwise 8 separate host->device transfers, and the
        tunnel charges ~25 ms per host call — docs/preview_bench.py measured
        the interactive tick paying ~190 ms above the render itself before
        this (PERF_NOTES r5 wave 5).  Scene/state/bake buffers are already
        device-resident, so they transfer nothing."""
        if self.state is None:
            self.state = init_frame_state(self.cfg)
        packed = np.concatenate(
            [np.asarray(leaf, np.float32).ravel()
             for leaf in (*cam, sun_angle)])
        self.state, img = render_frame_packed(
            self.scene, self.state, jnp.asarray(packed),
            self.prefiltered_env, self.brdf_lut, self.cfg, self.raster_backend,
        )
        return img

    def check_overflow(self, strict=False):
        """Verify no frame so far exceeded raster bin capacities (which would
        silently drop triangles — ADVICE.md r1 high).  Host-sync: fetches one
        tiny scalar pair, so call after a batch of frames, not per frame
        (the tunnel costs ~25 ms per host call).  Returns (ok, message)."""
        if self.raster_backend != "pallas":
            return True, "xla raster path has no capacity limits"
        max_seg, total = (int(x) for x in np.asarray(self.state.raster_overflow))
        pair_cap = self.cfg.pair_capacity_factor * self.scene.num_tris
        msgs = []
        # the folded (v2) kernel processes segments of any depth; only the v1
        # rowblock kernel has a per-tile capacity
        if self.cfg.raster_kernel == "rowblock" and max_seg > self.cfg.tile_capacity:
            msgs.append(
                f"tile segment {max_seg} > tile_capacity {self.cfg.tile_capacity}"
            )
        if total > pair_cap:
            msgs.append(f"pair count {total} > pair_capacity {pair_cap}")
        if msgs:
            msg = "raster bin overflow (triangles dropped): " + "; ".join(msgs) + (
                " — raise cfg.tile_capacity / cfg.pair_capacity_factor and re-render"
            )
            if strict:
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg)
            return False, msg
        return True, f"ok (max segment {max_seg}, pairs {total})"
