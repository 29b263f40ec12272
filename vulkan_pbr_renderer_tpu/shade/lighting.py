"""The deferred lighting pass — port of lighting_pass.glsl:432-716.

Per pixel: reconstruct positions from depth, cosine-hemisphere bent normal,
4-tap PCF sun shadow, volumetric light shafts, Cook-Torrance sun lighting,
hybrid-traced diffuse + specular GI weighted by the split-sum BRDF LUT,
emissive, and the sky fallback.  Everything is dense [H,W,...] tensor math —
the TPU replacement for the reference's 16-resource fullscreen fragment pass
(render.cpp:1117-1127).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..gpu import sampling
from ..utils import color as colorlib
from ..utils import math3d as m3
from ..utils import noise as noiselib
from . import brdf, gi, shadow


class Globals(NamedTuple):
    """Per-frame uniforms — mirrors RendererGlobalsBuffer (render.h:122-136)."""

    clip_from_world: jnp.ndarray
    clip_from_view: jnp.ndarray
    world_from_clip: jnp.ndarray
    view_from_clip: jnp.ndarray
    view_from_world: jnp.ndarray
    world_from_view: jnp.ndarray
    sun_from_world: jnp.ndarray
    old_clip_from_world: jnp.ndarray
    sun_direction: jnp.ndarray     # [3]
    camera_pos: jnp.ndarray        # [3]
    frame_idx_mod_59: jnp.ndarray  # scalar f32
    taa_jitter: jnp.ndarray        # [2] ndc
    taa_jitter_prev: jnp.ndarray   # [2]


class LightingResources(NamedTuple):
    """Textures read by the lighting pass (render.cpp:829-871 bindings)."""

    sun_depth: jnp.ndarray            # [S,S]
    lightgrid: jnp.ndarray            # [D,D,D,4]
    prefiltered_env: jnp.ndarray      # [6,S,Wa,12] WINDOW-packed cube mip
                                      # atlas (pack_cube_mip_atlas_window,
                                      # f16): static-level samples = 1 gather
                                      # row, dynamic-LOD = 2
    brdf_lut: jnp.ndarray             # [L,L,2]
    prev_frame_atlas: jnp.ndarray     # [H/2,Wa,3] prev frame's bloom downscale
                                      # pyramid (render.cpp:862 binds it as
                                      # PREV_FRAME_RESULT in the lighting pass)


def reconstruct_positions(depth, world_from_clip, view_from_clip,
                          row_offset=0, full_height=None, stride=1):
    """depth [H,W] -> (p_world [H,W,3], p_view [H,W,3]) via inverse projection
    (lighting_pass.glsl:444-451).  For row-sharded frames, depth holds rows
    [row_offset, row_offset+H) of a full_height-tall framebuffer.  For
    stride>1, depth holds the [::stride,::stride] subsample of a
    (full_height, W*stride) framebuffer and positions are reconstructed at the
    subsampled pixels' original centers (exactly p_world[::stride,::stride])."""
    h, w = depth.shape
    fh = full_height or h * stride
    fw = w * stride
    u = (jnp.arange(w, dtype=jnp.float32)[None, :] * stride + 0.5) / fw
    v = (jnp.arange(h, dtype=jnp.float32)[:, None] * stride + row_offset + 0.5) / fh
    ndc = jnp.stack(
        [
            jnp.broadcast_to(u * 2.0 - 1.0, (h, w)),
            jnp.broadcast_to(v * 2.0 - 1.0, (h, w)),
            depth,
        ],
        -1,
    )
    pw = m3.transform_points(world_from_clip, ndc)
    p_world = pw[..., :3] / pw[..., 3:4]
    pv = m3.transform_points(view_from_clip, ndc)
    p_view = pv[..., :3] / pv[..., 3:4]
    return p_world, p_view


def bent_normal_cosine(n, noise_1, noise_3):
    """Random cosine-hemisphere direction about N (lighting_pass.glsl:551-585)."""
    some_vector = m3.normalize(jnp.array([0.7128864983, 0.8217892113, 0.948912748]))
    tangent = m3.normalize(jnp.cross(jnp.broadcast_to(some_vector, n.shape), n))
    bitangent = jnp.cross(n, tangent)
    pitch = jnp.arccos(jnp.sqrt(jnp.clip(1.0 - noise_1, 0.0, 1.0)))
    yaw = 2.0 * jnp.pi * noise_3
    sp = jnp.sin(pitch)
    local = jnp.stack([sp * jnp.cos(yaw), sp * jnp.sin(yaw), jnp.cos(pitch)], -1)
    return (
        tangent * local[..., 0:1] + bitangent * local[..., 1:2] + n * local[..., 2:3]
    )



def _down(x, k):
    """Subsample [H,W,...] by k (top-left of each k x k block)."""
    return x if k == 1 else x[::k, ::k]


def _up(x, h, w):
    """Bilinear upsample [h/k,w/k,...] back to [h,w,...] — dense 2x phase
    interleaves (jax.image.resize lowers to gathers on TPU); repeated for
    power-of-two divisors."""
    from .bloom import _up2

    while x.shape[0] * 2 <= h and x.shape[1] * 2 <= w:
        x = _up2(x if x.ndim == 3 else x[..., None])
    x = x if x.ndim == 3 else x[..., None]
    if x.shape[:2] != (h, w):
        x = jax.image.resize(x, (h, w) + x.shape[2:], method="linear")
    return x


def gi_temporal_active(cfg):
    """True when the temporal GI interleave (cfg.gi_temporal_div) can run:
    fast march mode (or reference mode with the gi_temporal_reference
    opt-in), matching diffuse/specular GI resolution, and an even number of
    half-res columns to split.  app.renderer.init_frame_state sizes
    FrameState.gi_cache by this, and render_frame plumbs the cache through
    lighting_pass when it holds."""
    kg = cfg.gi_res_divisor
    mode_ok = ((cfg.gi_mode == "fast" and cfg.gi_fast_march)
               or (cfg.gi_mode == "reference" and cfg.gi_temporal_reference))
    return (cfg.gi_temporal_div >= 2 and cfg.enable_gi and mode_ok
            and (cfg.gi_res_divisor_diffuse or kg) == kg
            and cfg.height % kg == 0 and cfg.width % kg == 0
            and (cfg.width // kg) % 2 == 0
            and (cfg.gi_temporal_pattern != "checker"
                 or (cfg.height // kg) % 2 == 0))


def lighting_pass(
    g,                      # GBuffer
    glob: Globals,
    res: LightingResources,
    cfg: RenderConfig,
    row_offset=0,
    full_height=None,
    depth_full=None,
    gi_cache=None,
    frame_idx=None,
):
    """Returns the HDR lighting result [H,W,3] — or (hdr, new_gi_cache) when
    gi_cache is passed (the cfg.gi_temporal_div interleave; single-chip only).

    For the row-sharded multi-chip path, pass row_offset/full_height and a
    gathered full-screen depth (depth_full) so the GI screen-space trace can
    march outside the shard's rows.

    Temporal interleave (gi_cache is not None, requires gi_temporal_active):
    the two gather-bound march_resolve calls (ambient + specular — together
    the largest block of the frame) run on alternating half-res COLUMNS
    (parity = frame_idx % 2) and merge into the persistent [2,Hg,Wg,3] cache;
    shading consumes the cache, so the untouched half is one frame stale —
    statically it converges in 2 frames, in motion TAA integrates it exactly
    like the march's own per-frame noise dither."""
    h, w = g.depth.shape
    fh = full_height or h
    base_color = g.base_color
    n = g.normal
    roughness = g.orm[..., 1]
    metallic = g.orm[..., 2]
    emissive = g.emissive * cfg.emissive_scale

    p_world, p_view = reconstruct_positions(
        g.depth, glob.world_from_clip, glob.view_from_clip, row_offset, fh
    )

    px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w)) + 0.5
    py = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.float32)[:, None] + row_offset, (h, w)
    ) + 0.5
    f59 = glob.frame_idx_mod_59
    noise_1 = noiselib.frame_noise(px, py, f59)
    noise_2 = noiselib.frame_noise(px, py, f59, offset=(90.0, 20.0))
    noise_3 = noiselib.frame_noise(px, py, f59, offset=(522.0, 55.0))

    sun_emission = cfg.sun_emission_scale * jnp.asarray(cfg.sun_color, jnp.float32)

    v = m3.normalize(glob.camera_pos - p_world)
    v_dot_n = jnp.maximum(m3.dot(v, n), 0.0)

    outgoing = jnp.zeros((h, w, 3), jnp.float32)

    # Subsampled inputs for the reduced-res GI / shaft passes.  The naive
    # [::k,::k] strided slices each lowered to a ~1.6 GB/s XLA gather (6 of
    # them = 41 ms/frame, round-2 hlo_stats); instead everything analytic is
    # recomputed at the subsampled pixel coords (noise, positions from depth,
    # v from position) and the rest (depth, normal, roughness) rides ONE
    # packed 5-channel gather.
    need_sub = (cfg.enable_gi and cfg.gi_res_divisor > 1) or (
        cfg.enable_light_shafts and cfg.enable_shadows
        and cfg.shaft_res_divisor > 1
    )
    packed_gnr = (
        jnp.concatenate([g.depth[..., None], n, roughness[..., None]], -1)
        if need_sub else None
    )

    def sub_inputs(k, f59_=None):
        """(n, roughness, p_world, p_view, noise_1/2/3) at the [::k,::k] grid,
        exactly equal to subsampling the full-res arrays.  f59_ overrides the
        noise frame index (the GI block's cfg.gi_temporal_noise="cycle"
        schedule); None = the frame's own f59."""
        if f59_ is None:
            f59_ = f59
        if k == 1:
            if f59_ is f59:
                return n, roughness, p_world, p_view, (noise_1, noise_2, noise_3)
            return n, roughness, p_world, p_view, (
                noiselib.frame_noise(px, py, f59_),
                noiselib.frame_noise(px, py, f59_, offset=(90.0, 20.0)),
                noiselib.frame_noise(px, py, f59_, offset=(522.0, 55.0)),
            )
        sub = _down(packed_gnr, k)
        depth_d = sub[..., 0]
        nd = sub[..., 1:4]
        roughd = sub[..., 4]
        pwd, pvd = reconstruct_positions(
            depth_d, glob.world_from_clip, glob.view_from_clip,
            row_offset, fh, stride=k,
        )
        hd, wd = depth_d.shape
        pxd = (jnp.arange(wd, dtype=jnp.float32)[None, :] * k + 0.5)
        pyd = (jnp.arange(hd, dtype=jnp.float32)[:, None] * k
               + row_offset + 0.5)
        pxd = jnp.broadcast_to(pxd, (hd, wd))
        pyd = jnp.broadcast_to(pyd, (hd, wd))
        noises = (
            noiselib.frame_noise(pxd, pyd, f59_),
            noiselib.frame_noise(pxd, pyd, f59_, offset=(90.0, 20.0)),
            noiselib.frame_noise(pxd, pyd, f59_, offset=(522.0, 55.0)),
        )
        return nd, roughd, pwd, pvd, noises

    # --- sun shadow + direct light (glsl:592-679) -------------------------
    if not cfg.enable_shadows:
        wdepth = None
        vis = jnp.ones((h, w), jnp.float32)
    else:
        if cfg.pcf_mode == "split4x4":
            wdepth_pcf = sampling.pack_depth_window_u16_4x4_split(res.sun_depth)
        else:
            wdepth_pcf = sampling.pack_depth_window_u16(res.sun_depth)
        # the march-mode shaft sampler needs the single-table 2x2 pack
        wdepth = (wdepth_pcf if not isinstance(wdepth_pcf, tuple)
                  else sampling.pack_depth_window_u16(res.sun_depth)
                  if cfg.light_shaft_mode == "march" else None)
        vis = shadow.sun_visibility(
            res.sun_depth, glob.sun_from_world, p_world, n, noise_1, noise_2,
            cfg.shadow_normal_offset, wdepth=wdepth_pcf,
        )

    l = -glob.sun_direction
    direct = brdf.cook_torrance_direct(
        n, v, jnp.broadcast_to(l, n.shape), base_color, roughness, metallic,
        cfg.f0_dielectric,
    )
    outgoing = outgoing + vis[..., None] * direct * sun_emission

    # --- volumetric light shafts (glsl:620-651) ---------------------------
    if cfg.enable_light_shafts and cfg.enable_shadows:
        ks_ = cfg.shaft_res_divisor
        n_s, _, pw_s, _, noises_s = sub_inputs(ks_)
        if cfg.light_shaft_mode == "polar":
            shafts = shadow.light_shafts_polar(
                res.sun_depth, glob.sun_from_world, glob.camera_pos,
                pw_s, n_s, noises_s[0],
                sun_emission, cfg.light_shaft_intensity,
                cfg.shadow_normal_offset,
                max_steps=cfg.light_shaft_steps * 3,
                n_theta=cfg.shaft_polar_thetas,
                n_r=cfg.light_shaft_steps * 3,
            )
        else:
            shafts = shadow.light_shafts(
                res.sun_depth, glob.sun_from_world, glob.camera_pos,
                pw_s, n_s, noises_s[0],
                sun_emission, cfg.light_shaft_intensity,
                cfg.shadow_normal_offset, max_steps=cfg.light_shaft_steps * 3,
                wdepth=wdepth,
            )
        outgoing = outgoing + _up(shafts, h, w)

    # --- split-sum weights (glsl:681) -------------------------------------
    f0 = brdf.f0_from_metallic(base_color, metallic, cfg.f0_dielectric)
    lut_uv = jnp.stack([v_dot_n, jnp.maximum(roughness, 0.05)], -1)
    # f16 window rows: the LUT holds [0,1] split-sum weights; halves the
    # 2M-row full-res fetch's bytes (3.75 ms/frame f32 in the wave-8 profile)
    wlut = sampling.window_pack(res.brdf_lut, 2, 2, dtype=jnp.float16)
    scale_bias = sampling.sample_bilinear_window(
        wlut, res.brdf_lut.shape[0], res.brdf_lut.shape[1], lut_uv, 2
    )
    fresnel_scale = scale_bias[..., 0:1]
    fresnel_bias = scale_bias[..., 1:2]

    # --- GI (glsl:683-702) ------------------------------------------------
    if cfg.enable_gi:
        kg = cfg.gi_res_divisor
        # u8 tone-compressed pack: 32-byte rows from a VMEM-promotable table
        # (gi.pack_grid_u8 rationale); the blockage skips read the 16-byte
        # alpha-only u16 pack instead (~2x the gather rate, round 3)
        wgrid = gi.pack_grid_u8(res.lightgrid)
        walpha = gi.pack_grid_alpha_u16(res.lightgrid)
        trace_depth = depth_full if depth_full is not None else g.depth
        # interleave noise schedule (config.gi_temporal_noise): "cycle"
        # advances the GI noise once per 2-frame refresh cycle (frame_idx|1 —
        # the cycle completes at odd frames carrying THAT frame's noise
        # instance), so the cache never holds two decorrelated instances
        f59_gi = None
        if (gi_cache is not None and cfg.gi_temporal_noise == "cycle"):
            f59_gi = (((frame_idx | 1) + cfg.gi_noise_offset) % 59).astype(
                jnp.float32)
        elif cfg.gi_noise_offset:
            # measurement control (config.gi_noise_offset): decorrelate the
            # GI dither from a matched run while everything else stays byte-
            # identical — the SSIM noise-floor experiment
            f59_gi = jnp.mod(f59 + jnp.float32(cfg.gi_noise_offset), 59.0)
        nd, roughd, pwd, pvd, (n1d, n2d, n3d) = sub_inputs(kg, f59_gi)
        vd = m3.normalize(glob.camera_pos - pwd)
        bent = bent_normal_cosine(nd, n1d, n3d)

        interleave = gi_cache is not None
        if interleave:
            assert gi_temporal_active(cfg)
            par = (frame_idx % 2).astype(jnp.int32)
            checker = cfg.gi_temporal_pattern == "checker"
            # EMA blend of refreshed lanes into the cache (see config):
            # the first 2 frames replace unconditionally (cold cache)
            ema = jnp.where(frame_idx < 2, 0.0,
                            jnp.float32(cfg.gi_temporal_ema))

            def _rows(x):
                # split into (even-row, odd-row) planes [Hg/2, Wg, ...]
                return x[0::2], x[1::2]

            def _cols(x, p):
                # the columns of parity p, contiguous: roll by a TRACED
                # shift then stride (a static slice of a dynamic
                # rotation — both lower cheaply)
                return jnp.roll(x, -p, axis=1)[:, ::2]

            def _half(x):
                # the parity-selected half of the GI lanes.  columns:
                # x[:, par::2].  checker: even rows take parity `par`
                # columns, odd rows the opposite — the stale lanes then
                # form the highest-frequency spatial pattern, which the
                # bilinear upsample + TAA average away
                if not checker:
                    return _cols(x, par)
                ev, od = _rows(x)
                ev, od = _cols(ev, par), _cols(od, 1 - par)
                return jnp.stack([ev, od], 1).reshape(
                    x.shape[0], x.shape[1] // 2, *x.shape[2:])

            def _set_cols(slot, half_val, p):
                cr = jnp.roll(slot, -p, axis=1)
                fresh = cr[:, ::2] * ema + half_val * (1.0 - ema)
                cr = cr.at[:, ::2].set(fresh)
                w_in = cfg.gi_temporal_infill
                if w_in > 0.0:
                    # stale lane at halved index k sits between fresh k and
                    # k+1 (edge-clamped): blend toward their average —
                    # spatial half-texel error instead of temporal staleness
                    nb = 0.5 * (fresh
                                + jnp.concatenate([fresh[:, 1:],
                                                   fresh[:, -1:]], 1))
                    cr = cr.at[:, 1::2].set(cr[:, 1::2] * (1.0 - w_in)
                                            + nb * w_in)
                return jnp.roll(cr, p, axis=1)

            def _merge(slot, half_val):
                # blend the freshly-traced lanes back into the cache
                # slot at their parity positions
                if not checker:
                    return _set_cols(slot, half_val, par)
                sev, sod = _rows(slot)
                hev, hod = _rows(half_val)
                sev = _set_cols(sev, hev, par)
                sod = _set_cols(sod, hod, 1 - par)
                return jnp.stack([sev, sod], 1).reshape(slot.shape)

        fast_kw = dict(
            skip_steps=cfg.gi_fast_skip_steps,
            open_thresh=cfg.gi_fast_open_thresh,
            n_samples=cfg.gi_fast_samples,
            sample_spread=cfg.gi_fast_sample_spread,
            alpha_grid=walpha,
        )
        dist_mip = cfg.gi_fast_probe_dist_mip
        if (cfg.gi_mode == "fast" and cfg.gi_fast_screen_probe
                and cfg.gi_fast_screen_mode != "trace"):
            if dist_mip > 0.0:
                # window pack of the WHOLE prev pyramid atlas: march probes
                # resolve at a distance-scaled level (the reference's
                # textureLod(PREV_FRAME_RESULT, uv, min(step*5, 5)),
                # glsl:377 — far resolves are a soft wide average)
                plh, plw = fh // 2, w // 2
                wprev = sampling.window_pack(
                    res.prev_frame_atlas.astype(jnp.float32), 2, 2,
                    dtype=jnp.float16,
                )
            else:
                # reduced-res prev-frame level for the screen probe: one
                # bilinear window row per probe (gi.screen_probe rationale);
                # level 0 = half res (sharper reflections), 1 = quarter res
                lv = cfg.gi_fast_probe_level
                offs, _ = sampling.mip_offsets(fh // 2, w // 2,
                                               cfg.bloom_pass_count)
                plh, plw = fh // (2 << lv), w // (2 << lv)
                prev_lvl = res.prev_frame_atlas[:plh, offs[lv]:offs[lv] + plw]
                wprev = sampling.window_pack(prev_lvl, 2, 2,
                                             dtype=jnp.float16)
            probe_mip_kw = (
                dict(prev_levels=cfg.bloom_pass_count, dist_mip=dist_mip)
                if dist_mip > 0.0 else {}
            )

            def probe(ro_open, ss_intensity, ro0=None):
                if cfg.gi_fast_probe_points > 1 and ro0 is not None:
                    return gi.screen_probe_multi(
                        ro0, ro_open, cfg.lightgrid_scale,
                        glob.clip_from_world, trace_depth, wprev, (plh, plw),
                        ss_intensity, z_margin=cfg.gi_fast_probe_margin,
                        k_points=cfg.gi_fast_probe_points, **probe_mip_kw,
                    )
                return gi.screen_probe(
                    ro_open, cfg.lightgrid_scale, glob.clip_from_world,
                    trace_depth, wprev, (plh, plw), ss_intensity,
                    z_margin=cfg.gi_fast_probe_margin,
                )
        else:
            probe = None
        voxel_step = 2.0 / cfg.lightgrid_size
        ro0_grid = pwd * cfg.lightgrid_scale
        if cfg.gi_mode == "fast" and cfg.gi_fast_march:
            # march-structured path (gi.sample_radiance_march): noise-dithered
            # alpha march + EMA rgb reconstruction, and the screen term as
            # INTERIOR probes of the [surface, first-open] segment — the only
            # region the reference's screen trace covers (its dist_to_travel
            # is |to_open|, gi.py sample_radiance_with_screen_trace phase B)
            # min-of-2x2 half-res depth: a reduce-window lowers ~free where
            # the [::2,::2] strided slice lowered to a 6 ms/frame gather
            # (hlo_stats r3); min is CONSERVATIVE for the probes' "behind
            # visible geometry" test (never fakes a hit a full-res ray
            # would miss... it can only move the surface nearer)
            th_, tw_ = trace_depth.shape

            def _min_depth(kdp):
                if kdp == 1:
                    return trace_depth
                if th_ % kdp == 0 and tw_ % kdp == 0:
                    return jax.lax.reduce_window(
                        trace_depth, jnp.float32(jnp.inf), jax.lax.min,
                        (kdp, kdp), (kdp, kdp), "valid",
                    )
                return trace_depth[::kdp, ::kdp]

            depth_half = _min_depth(cfg.gi_fast_probe_depth_div)
            if cfg.gi_fast_screen_mode == "trace":
                kdt = cfg.gi_trace_depth_div
                if kdt > 1 and cfg.gi_trace_depth_mode == "plain":
                    # unbiased position quantization (vs min's one-texel
                    # silhouette dilation -> false resolves); the strided
                    # slice is a one-time ~6 ms gather, repaid ~25x by the
                    # smaller table's gather rate (config.gi_trace_depth_mode)
                    trace_tbl = trace_depth[::kdt, ::kdt]
                else:
                    trace_tbl = _min_depth(kdt)
            if cfg.gi_fast_screen_probe and cfg.gi_fast_screen_mode == "hiz":
                # one min-depth pyramid shared by the diffuse + specular
                # traces (and, sharded, identical on every shard — built from
                # the gathered full depth, so parity is trivially exact)
                hiz, hiz_offs = gi.build_hiz_atlas(depth_half,
                                                   cfg.gi_hiz_levels)

            if cfg.gi_fast_fog_march:
                fgrid = gi.pack_grid_f16_nearest(res.lightgrid)

            def march_resolve(pw, rd_unit, hit_steps, step_scale,
                              ss_intensity, noise, foggyness=0.5, pv=None):
                if cfg.gi_fast_fog_march:
                    rgb, ro_open, ro_stop, hitm, _ = gi.sample_radiance_fog(
                        fgrid, pw, rd_unit, cfg.lightgrid_scale,
                        skip_steps=cfg.gi_fast_skip_steps,
                        open_thresh=cfg.gi_fast_open_thresh,
                        march_steps=hit_steps, step_scale=step_scale,
                        noise=noise, foggyness=foggyness,
                        trilinear_grid=(wgrid if cfg.gi_fast_fog_trilinear
                                        else None),
                        jitter_scale=cfg.gi_fast_jitter_scale,
                        unroll=cfg.gi_fog_unroll,
                        early_exit=cfg.gi_early_exit,
                    )
                else:
                    rgb, ro_open, ro_stop, hitm, _ = gi.sample_radiance_march(
                        wgrid, walpha, pw, rd_unit, cfg.lightgrid_scale,
                        skip_steps=cfg.gi_fast_skip_steps,
                        open_thresh=cfg.gi_fast_open_thresh,
                        hit_steps=hit_steps, step_scale=step_scale,
                        noise=noise, rgb_samples=cfg.gi_fast_samples,
                    )
                if cfg.gi_fast_screen_probe and \
                        cfg.gi_fast_screen_mode == "trace":
                    # faithful bounded port of the reference's linear screen
                    # trace (gi.screen_trace_linear) — same tables as the
                    # parity path: nearest full-res depth, u16 alpha
                    # solidity, prev-frame mip atlas with the textureLod
                    # distance mip (lighting_pass.glsl:301-397)
                    open_vs = m3.transform_points(
                        glob.view_from_world, ro_open / cfg.lightgrid_scale
                    )[..., :3]
                    v_cam = m3.normalize(glob.camera_pos - pw)
                    fb_pos = (pw * cfg.lightgrid_scale
                              + 2.5 * v_cam * voxel_step)
                    fb = gi.grid_sample(wgrid, fb_pos)
                    fb_rgb = colorlib.tone_compress_sqrt(fb[..., :3])
                    trace_kw = dict(
                        steps=cfg.gi_trace_steps,
                        rounds=cfg.gi_trace_rounds,
                        steps2=cfg.gi_trace_steps2,
                        solid_taps=cfg.gi_trace_solid_taps,
                        unroll=cfg.gi_trace_unroll,
                    )
                    if cfg.gi_trace_impl != "v1":
                        trace_kw["early_exit"] = cfg.gi_early_exit
                    if cfg.gi_trace_impl == "v1":
                        status, res_uv, res_slen = gi.screen_trace_linear_v1(
                            trace_tbl, walpha, pv, open_vs, fb_rgb,
                            glob.clip_from_view, glob.view_from_clip,
                            glob.world_from_view, cfg.lightgrid_scale, noise,
                            **trace_kw,
                        )
                    else:
                        status, res_uv, res_slen = gi.screen_trace_linear(
                            trace_tbl, walpha, pv, open_vs,
                            glob.clip_from_view,
                            glob.world_from_view, cfg.lightgrid_scale, noise,
                            **trace_kw,
                        )
                    lod = jnp.minimum(res_slen * 5.0, 5.0)
                    prev = sampling.sample_mip_atlas(
                        res.prev_frame_atlas, fh // 2, w // 2, res_uv, lod,
                        levels=cfg.bloom_pass_count,
                    )[..., :3]
                    rgb = jnp.where((status == 1)[..., None], fb_rgb, rgb)
                    rgb = jnp.where((status == 3)[..., None],
                                    prev * ss_intensity, rgb)
                elif cfg.gi_fast_screen_probe:
                    if cfg.gi_fast_probe_to_stop:
                        # probe the full [surface, march stop] segment — for
                        # specular rays the interesting on-screen target (the
                        # reflected wall/lamp) is usually PAST first-open
                        ro_open = ro_stop
                    if cfg.gi_fast_screen_mode == "hiz":
                        res_m, ss_rgb = gi.screen_trace_hiz(
                            pw * cfg.lightgrid_scale, ro_open,
                            cfg.lightgrid_scale, glob.clip_from_world,
                            hiz, hiz_offs, depth_half.shape, wprev,
                            (plh, plw), ss_intensity, alpha_grid=walpha,
                            iters=cfg.gi_hiz_iters,
                            thickness=cfg.gi_hiz_thickness,
                            z_bias=cfg.gi_hiz_bias,
                            solid_thresh=cfg.gi_hiz_solid,
                            zview_nf=(cfg.z_near, cfg.z_far),
                        )
                    else:
                        ro_probe_end = ro_open
                        if cfg.gi_fast_probe_overshoot > 0.0:
                            # the reference trace travels |to_open| in units
                            # of a step normalized by |to_open.xy| (glsl:302,
                            # 308): its 3D range is |to_open|/|to_open.xy| x
                            # the open distance — view-aligned rays sweep far
                            # past first-open and resolve distant geometry
                            seg_g = ro_open - pw * cfg.lightgrid_scale
                            dvs = m3.transform_dirs(glob.view_from_world,
                                                    seg_g)
                            ov = jnp.linalg.norm(dvs, axis=-1) / jnp.maximum(
                                jnp.linalg.norm(dvs[..., :2], axis=-1), 1e-6)
                            ov = jnp.minimum(ov, cfg.gi_fast_probe_overshoot)
                            ro_probe_end = (pw * cfg.lightgrid_scale
                                            + seg_g * ov[..., None])
                        res_m, ss_rgb, off_m = gi.screen_probe_multi(
                            pw * cfg.lightgrid_scale, ro_probe_end,
                            cfg.lightgrid_scale, glob.clip_from_world,
                            (trace_depth if cfg.gi_fast_probe_fullres_depth
                             else depth_half),
                            wprev, (plh, plw), ss_intensity,
                            z_margin=cfg.gi_fast_probe_margin,
                            k_points=cfg.gi_fast_probe_points,
                            want_offscreen=True,
                            spacing_gamma=cfg.gi_fast_probe_gamma,
                            spacing_growth=cfg.gi_fast_probe_growth,
                            point_jitter=cfg.gi_fast_probe_jitter,
                            solid_taps=cfg.gi_fast_probe_solid_taps,
                            alpha_grid=walpha,
                            world_from_clip=glob.world_from_clip,
                            noise=noise, **probe_mip_kw,
                        )
                        if cfg.gi_fast_edge_fallback:
                            # trace left the screen before any hit: the
                            # reference samples the lightgrid 2.5 voxels
                            # toward the camera, tone-compressed, and stops
                            # (glsl:324-331) — without this the screen-edge
                            # pixels keep the fog result the reference never
                            # computes there
                            v_cam = m3.normalize(glob.camera_pos - pw)
                            fb_pos = (pw * cfg.lightgrid_scale
                                      + v_cam * (2.5 * 2.0
                                                 / cfg.lightgrid_size))
                            fb = gi.grid_sample(wgrid, fb_pos)[..., :3]
                            fb = colorlib.tone_compress_sqrt(fb)
                            rgb = jnp.where(off_m[..., None], fb, rgb)
                    rgb = jnp.where(res_m[..., None], ss_rgb, rgb)
                return rgb

            kdif = cfg.gi_res_divisor_diffuse or kg
            if kdif != kg:
                nd_d, _, pwd_d, pvd_d, (n1dd, _, n3dd) = sub_inputs(kdif,
                                                                    f59_gi)
                bent_d = bent_normal_cosine(nd_d, n1dd, n3dd)
            else:
                pwd_d, pvd_d, bent_d, n3dd = pwd, pvd, bent, n3d
            if interleave and cfg.gi_temporal_scope != "spec":
                amb_h = march_resolve(
                    _half(pwd_d), _half(bent_d), cfg.gi_fast_hit_steps,
                    cfg.gi_fast_hit_step_scale, cfg.gi_diffuse_ss_intensity,
                    _half(n3dd), foggyness=cfg.gi_diffuse_foggyness,
                    pv=_half(pvd_d),
                )
                cache_amb = _merge(gi_cache[0], amb_h)
                ambient = cache_amb
            else:
                if interleave:
                    cache_amb = gi_cache[0]  # spec-only scope: slot unused
                ambient = march_resolve(
                    pwd_d, bent_d, cfg.gi_fast_hit_steps,
                    cfg.gi_fast_hit_step_scale, cfg.gi_diffuse_ss_intensity,
                    n3dd, foggyness=cfg.gi_diffuse_foggyness, pv=pvd_d,
                )
        elif cfg.gi_mode == "fast":
            ambient, ro_open = gi.sample_radiance_fast(
                wgrid, pwd, bent, cfg.lightgrid_scale, **fast_kw
            )
            if probe is not None:
                if cfg.gi_fast_diffuse_hit_steps > 0:
                    ro_p, hit_m = gi.march_to_hit(
                        walpha, ro_open,
                        bent * (voxel_step * cfg.gi_diffuse_step_scale),
                        cfg.gi_fast_diffuse_hit_steps,
                    )
                else:
                    ro_p, hit_m = ro_open, True
                hit, ss_rgb = probe(ro_p, cfg.gi_diffuse_ss_intensity,
                                    ro0=ro0_grid)
                hit = hit & hit_m
                ambient = jnp.where(hit[..., None], ss_rgb, ambient)
        else:
            def ref_resolve(pw_, pv_, vd_, dir_, n3_, steps, step_scale,
                            fog, intensity):
                return gi.sample_radiance_with_screen_trace(
                    wgrid, trace_depth, res.prev_frame_atlas,
                    glob.view_from_world, glob.clip_from_view,
                    glob.view_from_clip, glob.world_from_view,
                    vd_,
                    jnp.concatenate([pv_, jnp.ones_like(pv_[..., :1])], -1),
                    pw_, dir_, cfg.lightgrid_scale, steps, step_scale, n3_,
                    fog, intensity,
                    max_ss_steps=cfg.gi_screen_trace_steps,
                    prev_base=(fh // 2, w // 2),
                    prev_levels=cfg.bloom_pass_count,
                    alpha_grid=walpha, early_exit=cfg.gi_early_exit,
                )

            if interleave and cfg.gi_temporal_scope != "spec":
                # opt-in (cfg.gi_temporal_reference): halves the full parity
                # march's cost with the same TAA-integrated staleness class
                # as the fast path; bench/eval reference legs keep div=1 so
                # the SSIM yardstick stays exact
                amb_h = ref_resolve(
                    _half(pwd), _half(pvd), _half(vd), _half(bent),
                    _half(n3d), cfg.gi_diffuse_steps,
                    cfg.gi_diffuse_step_scale, cfg.gi_diffuse_foggyness,
                    cfg.gi_diffuse_ss_intensity)
                cache_amb = _merge(gi_cache[0], amb_h)
                ambient = cache_amb
            else:
                if interleave:
                    cache_amb = gi_cache[0]  # spec-only scope: slot unused
                ambient = ref_resolve(
                    pwd, pvd, vd, bent, n3d, cfg.gi_diffuse_steps,
                    cfg.gi_diffuse_step_scale, cfg.gi_diffuse_foggyness,
                    cfg.gi_diffuse_ss_intensity)
        ks = brdf.fresnel_schlick(v_dot_n, f0)
        kd = (1.0 - ks) * (1.0 - metallic[..., None])
        outgoing = outgoing + kd * _up(ambient, h, w) * base_color

        r = m3.reflect(-vd, nd)
        r = m3.normalize(
            r + 0.6 * roughd[..., None]
            * (jnp.stack([n1d, n2d, n3d], -1) - 0.5)
        )
        r2 = roughd * roughd
        r = r + (nd - r) * (r2 * r2)[..., None]   # bias toward N (glsl:697)
        spec_fog = roughd if cfg.gi_specular_foggyness_is_roughness else 0.9
        if cfg.gi_mode == "fast" and cfg.gi_fast_march:
            if interleave:
                spec_h = march_resolve(
                    _half(pwd), _half(r), cfg.gi_fast_hit_steps_spec,
                    cfg.gi_fast_hit_step_scale_spec,
                    cfg.gi_specular_ss_intensity, _half(n3d),
                    foggyness=(_half(spec_fog) if jnp.ndim(spec_fog)
                               else spec_fog),
                    pv=_half(pvd),
                )
                cache_spec = _merge(gi_cache[1], spec_h)
                spec = cache_spec
            else:
                spec = march_resolve(
                    pwd, r, cfg.gi_fast_hit_steps_spec,
                    cfg.gi_fast_hit_step_scale_spec,
                    cfg.gi_specular_ss_intensity,
                    n3d, foggyness=spec_fog, pv=pvd,
                )
        elif cfg.gi_mode == "fast":
            spec, ro_open_s = gi.sample_radiance_fast(
                wgrid, pwd, r, cfg.lightgrid_scale, dist_voxels=4.0, **fast_kw
            )
            if probe is not None:
                if cfg.gi_fast_spec_hit_steps > 0:
                    ro_ps, hit_ms = gi.march_to_hit(
                        walpha, ro_open_s,
                        r * (voxel_step * cfg.gi_specular_step_scale),
                        cfg.gi_fast_spec_hit_steps,
                    )
                else:
                    ro_ps, hit_ms = ro_open_s, True
                hit_s, ss_rgb_s = probe(ro_ps, cfg.gi_specular_ss_intensity,
                                        ro0=ro0_grid)
                hit_s = hit_s & hit_ms
                spec = jnp.where(hit_s[..., None], ss_rgb_s, spec)
        else:
            if interleave:
                spec_h = ref_resolve(
                    _half(pwd), _half(pvd), _half(vd), _half(r),
                    _half(n3d), cfg.gi_specular_steps,
                    cfg.gi_specular_step_scale,
                    _half(spec_fog) if jnp.ndim(spec_fog) else spec_fog,
                    cfg.gi_specular_ss_intensity)
                cache_spec = _merge(gi_cache[1], spec_h)
                spec = cache_spec
            else:
                spec = ref_resolve(
                    pwd, pvd, vd, r, n3d, cfg.gi_specular_steps,
                    cfg.gi_specular_step_scale, spec_fog,
                    cfg.gi_specular_ss_intensity)
        outgoing = outgoing + _up(spec, h, w) * (f0 * fresnel_scale + fresnel_bias)
    elif cfg.enable_ibl:
        # static split-sum IBL path (the pre-GI pipeline, geometry_pass.glsl:322-346
        # commented reference) — used by the Cerberus config
        env_size = res.prefiltered_env.shape[1]
        irr = sampling.sample_cubemap_level_window(res.prefiltered_env, env_size, n, 4)
        ks = brdf.fresnel_schlick(v_dot_n, f0)
        kd = (1.0 - ks) * (1.0 - metallic[..., None])
        outgoing = outgoing + kd * irr * base_color
        r = m3.reflect(-v, n)
        r2 = roughness * roughness
        r = r + (n - r) * (r2 * r2)[..., None]
        spec = sampling.sample_cubemap_lod_window(res.prefiltered_env, env_size, r, roughness * 4.0)
        outgoing = outgoing + spec * (f0 * fresnel_scale + fresnel_bias)

    outgoing = outgoing + emissive

    # --- sky fallback (glsl:708-710) --------------------------------------
    # Sampled at mip 0 (the roughness-0 prefilter level == the raw env map):
    # the reference draws the skybox geometry with the full-res env texture
    # (render.cpp:1103-1115), so the sky must be crisp, not a blurred mip.
    # Computed at HALF res from analytic pixel-ray directions (no gathers for
    # the inputs) and bilinearly upsampled: at 1080p one 256^2 env texel
    # covers ~7 screen pixels, so half-res sampling loses nothing while
    # halving^2 the 2M-row fetch (11 ms in the round-2 wave-3 profile).
    out_of_bounds = jnp.any(jnp.abs(p_world) > cfg.world_bounds, axis=-1) | ~g.coverage
    env_size = res.prefiltered_env.shape[1]
    # full-res in the row-sharded frame (fh > h): the half-res upsample would
    # edge-clamp at shard boundaries and seam vs the single-chip image —
    # the same reason parallel/sharding.py forces the GI/shaft divisors to 1
    if h % 2 == 0 and w % 2 == 0 and fh == h:
        hu = (jnp.arange(w // 2, dtype=jnp.float32)[None, :] * 2 + 1.0) / w
        hv = (jnp.arange(h // 2, dtype=jnp.float32)[:, None] * 2
              + row_offset + 1.0) / fh
        ndc_far = jnp.stack(
            [
                jnp.broadcast_to(hu * 2.0 - 1.0, (h // 2, w // 2)),
                jnp.broadcast_to(hv * 2.0 - 1.0, (h // 2, w // 2)),
                jnp.full((h // 2, w // 2), 0.5),
            ],
            -1,
        )
        far4 = m3.transform_points(glob.world_from_clip, ndc_far)
        ray = far4[..., :3] / far4[..., 3:4] - glob.camera_pos
        sky_h = sampling.sample_cubemap_level_window(
            res.prefiltered_env, env_size, ray, 0
        )
        sky = _up(sky_h, h, w)
    else:
        sky = sampling.sample_cubemap_level_window(
            res.prefiltered_env, env_size, -v, 0
        )
    outgoing = jnp.where(out_of_bounds[..., None], sky, outgoing)

    out = jnp.maximum(outgoing, 0.0)
    if gi_cache is not None:
        return out, jnp.stack([cache_amb, cache_spec])
    return out


def visualize_lightgrid_pass(glob: Globals, res: LightingResources, cfg, width, height):
    """Debug DDA view of the lightgrid (lighting_pass.glsl:463-491)."""
    h, w = height, width
    u = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w * 2.0 - 1.0
    v = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h * 2.0 - 1.0
    ndc = jnp.stack([jnp.broadcast_to(u, (h, w)), jnp.broadcast_to(v, (h, w)),
                     jnp.zeros((h, w))], -1)
    near4 = m3.transform_points(glob.world_from_clip, ndc)
    near = near4[..., :3] / near4[..., 3:4]

    px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w)) + 0.5
    py = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w)) + 0.5
    noise_1 = noiselib.frame_noise(px, py, glob.frame_idx_mod_59)

    ro = near * cfg.lightgrid_scale
    rd = m3.normalize(near - glob.camera_pos) * (1.0 / cfg.lightgrid_size)
    ro = ro + noise_1[..., None] * rd

    def body(i, carry):
        ro_c, sum4, done = carry
        ro_n = jnp.where(done[..., None], ro_c, ro_c + rd)
        s = gi.grid_sample(res.lightgrid, ro_n)
        hit = (s[..., 3] > 0.3) & ~done
        add = 10.0 * jnp.concatenate([s[..., :3], jnp.ones_like(s[..., :1])], -1)
        sum4 = jnp.where(hit[..., None], add, sum4)
        return ro_n, sum4, done | hit

    sum0 = jnp.zeros((h, w, 4)).at[..., 3].set(1e-5)
    _, sum4, _ = jax.lax.fori_loop(0, 512, body, (ro, sum0, jnp.zeros((h, w), bool)))
    return gi._tone(sum4)
