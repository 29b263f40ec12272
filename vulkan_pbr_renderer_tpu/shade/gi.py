"""Dynamic voxel-grid global illumination.

TPU-native re-design of the reference's three GI stages:

1. **Voxelize** (lightgrid_voxelize.glsl): the reference conservative-rasterizes
   triangles along their dominant axis and imageStores sun-lit radiance into a
   128^3 RGBA grid.  Scatter-raster is a poor fit for TPU; instead we
   **point-sample triangle surfaces** (area-proportional low-discrepancy
   samples) and scatter radiance with jnp scatters — the pass only runs on
   frame 0 / sun changes (render.cpp:1024), so it is off the frame hot path.

2. **Sweep** (lightgrid_sweep.glsl): per-axis bidirectional "moving light"
   propagation.  The per-voxel update is a first-order linear recurrence
   L[i] = a[i]*L[i-1] + b[i], so the 128-step sequential loop becomes a
   log-depth `jax.lax.associative_scan` over the grid axis — the SP-analogue
   noted in SURVEY.md §5.

3. **Radiance marches** (lighting_pass.glsl:236-424): bounded masked
   fori_loops over the grid with the hybrid screen-space trace; early breaks
   become per-lane masks (TPU has no divergence).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gpu import sampling
from ..utils import color as colorlib
from ..utils import math3d as m3

# ---------------------------------------------------------------------------
# 2. Lightgrid sweep


def _sweep_linrec(values, occupied, rad, skylight, move_ratio, reverse):
    """One directional sweep: returns (new_values_rgb, final moving light).

    Recurrence per step (empty voxel): L_out = mr*(v + L_in), v' = (1-mr)/mr*L_out;
    occupied voxel: L_out = rad, v' = v.  Seed L = skylight.
    """
    axis = 0  # caller moves the swept axis to the front
    a = jnp.where(occupied[..., None], 0.0, move_ratio)
    b = jnp.where(occupied[..., None], rad, move_ratio * values)

    def combine(f1, f2):
        a1, b1 = f1
        a2, b2 = f2
        return a1 * a2, a2 * b1 + b2

    A, B = jax.lax.associative_scan(combine, (a, b), axis=axis, reverse=reverse)
    L = A * skylight + B  # L[i] after processing voxel i
    new_vals = jnp.where(occupied[..., None], values, (1.0 - move_ratio) / move_ratio * L)
    # boundary: the final moving light is added to the last processed voxel
    if reverse:
        new_vals = new_vals.at[0].add(L[0])
    else:
        new_vals = new_vals.at[-1].add(L[-1])
    return new_vals


def sweep_lightgrid(grid, axis, skylight=(1.0, 1.2, 2.0), move_ratio=0.5, blend=0.35):
    """One frame's sweep along `axis` (0=z,1=y,2=x of the [D,H,W,4] grid).

    Forward then backward scans using the ORIGINAL occupancy/radiance
    (lightgrid_sweep.glsl:25-67), then blend 35% into empty voxels only.
    """
    sky = jnp.asarray(skylight, grid.dtype)
    g = jnp.moveaxis(grid, axis, 0)
    old_rgb = g[..., :3]
    alpha = g[..., 3]
    occupied = alpha > 0.5

    fwd = _sweep_linrec(old_rgb, occupied, old_rgb, sky, move_ratio, reverse=False)
    bwd = _sweep_linrec(fwd, occupied, old_rgb, sky, move_ratio, reverse=True)

    mixed = old_rgb + (bwd - old_rgb) * blend
    new_rgb = jnp.where(occupied[..., None], old_rgb, mixed)
    out = jnp.concatenate([new_rgb, alpha[..., None]], -1)
    return jnp.moveaxis(out, 0, axis)


# ---------------------------------------------------------------------------
# 1. Voxelization by surface point sampling


def voxelize_scene(
    scene,
    grid_size,
    lightgrid_scale,
    sun_depth,
    sun_space_from_world,
    sun_dir,
    sun_emission,
    samples_per_voxel_area=4.0,
    total_samples=1 << 20,
    texture_lod=4.0,
    sample_offset=0,
    shard_idx=None,
    shard_count=1,
):
    """Build the [D,D,D,4] radiance grid from sun-lit surface samples.

    Per-sample radiance matches lightgrid_voxelize.glsl:100-129: emissive +
    shadow * base_color * LdotN * sun_emission, 1-tap PCF with z-bias 0.001,
    alpha = 1.  Point density is proportional to triangle area in voxel units.

    Multi-chip: pass (shard_idx, shard_count) to process only samples
    [shard_idx*S, (shard_idx+1)*S) of the SAME sample stream (S = total/count).
    The per-shard partial grids combine with an elementwise max (scatter-max is
    order-independent), so pmax over shards reproduces the single-chip grid
    EXACTLY — the parity contract tested in tests/test_parallel.py.

    Round 3 gather diet (the r3 baseline profile showed ~136 ms of voxelize
    gathers per sun change): triangle corners/uvs come from the static
    scene.tri_attr rows (dense slices — tri_attr[:, :9] IS positions[indices]
    bit-identically), and all per-sample triangle data is packed into ONE
    [T,19] row so the sample stream does a single 76-byte gather instead of
    eight separate ones.
    """
    tri_attr = scene.tri_attr                       # [T,24]
    p0 = tri_attr[:, 0:3]
    e1 = tri_attr[:, 3:6] - p0
    e2 = tri_attr[:, 6:9] - p0
    n = jnp.cross(e1, e2)
    area = 0.5 * jnp.linalg.norm(n, axis=-1)
    tri_normal = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)

    voxel_size = 2.0 / (grid_size * lightgrid_scale)
    area_vox = area / (voxel_size * voxel_size)
    counts = jnp.ceil(area_vox * samples_per_voxel_area).astype(jnp.int32)
    counts = jnp.clip(counts, 1, total_samples)
    offsets = jnp.cumsum(counts) - counts           # exclusive
    total = offsets[-1] + counts[-1]

    # stream expansion by scatter + cummax (searchsorted costs O(P log N)
    # gathers — see raster/binning.py for the pattern)
    n_tris = counts.shape[0]
    pid = jnp.arange(total_samples, dtype=jnp.int32)
    scat = jnp.where(counts > 0, offsets, total_samples)
    arr = jnp.full((total_samples,), -1, jnp.int32)
    tri_of = jnp.clip(
        jax.lax.cummax(arr.at[scat].max(jnp.arange(n_tris, dtype=jnp.int32))),
        0, n_tris - 1,
    )
    run_start = jnp.maximum(
        jax.lax.cummax(jnp.full((total_samples,), -1, jnp.int32).at[scat].max(offsets)),
        0,
    )
    if shard_count > 1:
        # the cheap int fills above run over the full stream on every shard;
        # the expensive per-sample work below runs on this shard's slice only
        assert total_samples % shard_count == 0
        s_len = total_samples // shard_count
        start = jnp.asarray(shard_idx, jnp.int32) * s_len
        pid = jax.lax.dynamic_slice_in_dim(pid, start, s_len)
        tri_of = jax.lax.dynamic_slice_in_dim(tri_of, start, s_len)
        run_start = jax.lax.dynamic_slice_in_dim(run_start, start, s_len)
    local = pid - run_start
    in_range = pid < total

    # low-discrepancy barycentric points (R2 sequence folded into the triangle)
    phase = jnp.asarray(sample_offset, jnp.float32)
    r = jnp.stack(
        [
            jnp.mod(local.astype(jnp.float32) * 0.7548776662466927 + 0.13 + phase * 0.371, 1.0),
            jnp.mod(local.astype(jnp.float32) * 0.5698402909980532 + 0.29 + phase * 0.613, 1.0),
        ],
        -1,
    )
    flip = (r[:, 0] + r[:, 1]) > 1.0
    r = jnp.where(flip[:, None], 1.0 - r, r)

    # ONE per-sample gather row: p0(3) e1(3) e2(3) uv0(2) duv1(2) duv2(2)
    # normal(3) mat(1) — 19 f32.  (uv cols 18:24 of tri_attr == uvs[indices].)
    uv0 = tri_attr[:, 18:20]
    packrow = jnp.concatenate(
        [
            p0, e1, e2,
            uv0,
            tri_attr[:, 20:22] - uv0,
            tri_attr[:, 22:24] - uv0,
            tri_normal,
            scene.mat_id.astype(jnp.float32)[:, None],
        ],
        axis=1,
    )                                               # [T,19]
    row = packrow[tri_of]                           # [S,19] — THE gather
    pos = row[:, 0:3] + r[:, 0:1] * row[:, 3:6] + r[:, 1:2] * row[:, 6:9]
    uv = row[:, 9:11] + r[:, 0:1] * row[:, 11:13] + r[:, 1:2] * row[:, 13:15]
    sample_normal = row[:, 15:18]
    mat = row[:, 18].astype(jnp.int32)

    lod = jnp.full(pid.shape, texture_lod, jnp.float32)
    texel = sampling.sample_mip_atlas_array_window_nearest(
        scene.tex_packed, mat, uv, lod, 12, scale=scene.tex_scale
    )
    base_color = texel[..., 0:3]
    emissive = texel[..., 9:12]

    # 1-tap shadow with (+1,+1) texel offset and z bias (voxelize glsl:104-110)
    p_sun = m3.transform_points(sun_space_from_world, pos)[..., :3]
    uv_sun = p_sun[..., :2] * 0.5 + 0.5 + 1.0 / sun_depth.shape[0]
    shadow = sampling.sample_depth_compare(sun_depth, uv_sun, p_sun[..., 2] - 0.001)

    l = -sun_dir
    ldotn = jnp.maximum(jnp.sum(sample_normal * l, -1), 0.0)
    radiance = emissive + (shadow * ldotn)[..., None] * base_color * jnp.asarray(
        sun_emission, jnp.float32
    )

    uvw = pos * lightgrid_scale * 0.5 + 0.5
    coord = jnp.floor(uvw * grid_size).astype(jnp.int32)
    inside = jnp.all((coord >= 0) & (coord < grid_size), axis=-1) & in_range
    # grid layout [D(z), H(y), W(x), 4]
    iz, iy, ix = coord[:, 2], coord[:, 1], coord[:, 0]
    flat_idx = jnp.where(inside, (iz * grid_size + iy) * grid_size + ix, 0)
    vals = jnp.concatenate([radiance, jnp.ones_like(radiance[:, :1])], -1)
    vals = jnp.where(inside[:, None], vals, 0.0)

    grid = jnp.zeros((grid_size * grid_size * grid_size, 4), jnp.float32)
    grid = grid.at[flat_idx].max(vals)
    return grid.reshape(grid_size, grid_size, grid_size, 4)


def pack_grid_u8(grid):
    """[D,H,W,4] radiance grid -> 2x2x2-window pack stored uint8 [D,H,W,32].

    rgb is stored per-channel range-compressed, c = sqrt(x/(1+x)) (invertible,
    steps are finer where radiance is darker); alpha is stored raw (the sweep
    only writes 0/1).  Why u8: the f16 window pack of the 128^3 grid was
    134 MB — past XLA's VMEM-promotion size, so every GI trilinear fetch ran
    at ~24 M rows/s from HBM (6 x ~16 ms/frame in the round-2 hlo_stats
    profile); the u8 pack is 67 MB, promotes to VMEM, and decompression is two
    VPU ops.  Quantization error ~2% of radiance at x=1 — invisible in GI."""
    rgb = jnp.maximum(grid[..., :3], 0.0)
    c = jnp.sqrt(rgb / (1.0 + rgb))
    q = jnp.concatenate([c, grid[..., 3:4]], -1)
    q8 = jnp.clip(jnp.round(q * 255.0), 0.0, 254.0).astype(jnp.uint8)
    p = jnp.pad(q8, ((0, 1), (0, 1), (0, 1), (0, 0)), mode="edge")
    d, h, w = grid.shape[:3]
    return jnp.concatenate(
        [
            p[dz : dz + d, dy : dy + h, dx : dx + w]
            for dz in range(2)
            for dy in range(2)
            for dx in range(2)
        ],
        axis=-1,
    )


def pack_grid_alpha_u16(grid):
    """[D,H,W,4] grid -> alpha-only 2x2x2-window pack, uint16 [D,H,W,8].

    The fast-GI blockage skip needs ONLY alpha; its 16-byte u16 rows gather at
    ~165 M rows/s vs the 32-byte u8 rgb pack's flat ~78 (PERF_NOTES row-format
    sweep) — the round-3 GI diet (VERDICT r2 next #2).  Alpha is quantized
    exactly like pack_grid_u8's alpha channel (round*255, clip 254), so the
    skip's open/blocked decisions are bit-identical to sampling the rgb pack.
    """
    a = jnp.clip(jnp.round(grid[..., 3:4] * 255.0), 0.0, 254.0).astype(jnp.uint16)
    p = jnp.pad(a, ((0, 1), (0, 1), (0, 1), (0, 0)), mode="edge")
    d, h, w = grid.shape[:3]
    return jnp.concatenate(
        [
            p[dz : dz + d, dy : dy + h, dx : dx + w]
            for dz in range(2)
            for dy in range(2)
            for dx in range(2)
        ],
        axis=-1,
    )


def _sample_alpha_u16(agrid, ro):
    """Trilinear alpha at grid-NDC ro from a pack_grid_alpha_u16 table."""
    return sampling.sample_trilinear_window(
        agrid, ro * 0.5 + 0.5, 1,
        decode=lambda v: v * (1.0 / 255.0),
    )[..., 0]


def _decode_grid_u8(v):
    """Per-corner decode for pack_grid_u8 rows: u8 -> raw radiance + alpha.
    Runs BEFORE the trilinear lerp — interpolating in the compressed space
    would badly underestimate radiance between bright and dark voxels
    (midpoint of x=0 and x=6 would decode to 0.27 instead of 3.0)."""
    s = v * (1.0 / 255.0)
    c2 = s[..., :3] * s[..., :3]
    rgb = c2 / jnp.maximum(1.0 - c2, 1.0 / 256.0)
    return jnp.concatenate([rgb, s[..., 3:]], -1)


def _gs_uvw(vol, uvw):
    """Trilinear fetch accepting a raw [D,H,W,4] grid or a window-packed
    [D,H,W,32] one (pack_grid_u8 / sampling.window_pack3d — ONE gather row).
    uint8 pack corners are decompressed to raw radiance before the lerp."""
    if vol.shape[-1] == 32:
        decode = _decode_grid_u8 if vol.dtype == jnp.uint8 else None
        return sampling.sample_trilinear_window(vol, uvw, 4, decode=decode)
    return sampling.sample_trilinear_3d(vol, uvw)


def grid_sample(grid, ro_grid):
    """Trilinear lightgrid fetch at grid-NDC position ro (uvw = ro*0.5+0.5)."""
    return _gs_uvw(grid, ro_grid * 0.5 + 0.5)


# ---------------------------------------------------------------------------
# 3. Radiance marches


def _skip_blockage(grid, ro, rd, steps, open_thresh, alpha_grid=None):
    """Advance until the first non-solid voxel (glsl:243-251 / 280-288).

    Returns (ro_after, sum4) where sum4 accumulates (rgb,1) of the first open
    sample; sum4.a stays ~0 if no opening was found.

    With alpha_grid (pack_grid_alpha_u16): the march reads the 16-byte
    alpha-only rows (~2x the gather rate of the rgb pack) and ONE rgb row is
    fetched at the stop position afterwards — the stop position equals the
    first-open sample point (ro freezes on found), and the alpha quantization
    matches the rgb pack exactly, so the result is identical to the rgb-row
    march.
    """
    sum0 = jnp.zeros(ro.shape[:-1] + (4,), ro.dtype).at[..., 3].set(1e-4)
    found0 = jnp.zeros(ro.shape[:-1], bool)

    if alpha_grid is not None:
        def body_a(i, carry):
            ro_c, found = carry
            ro_n = jnp.where(found[..., None], ro_c, ro_c + rd)
            a = _sample_alpha_u16(alpha_grid, ro_n)
            return ro_n, found | (a < open_thresh)

        carry = (ro, found0)
        if steps <= 4:
            for i in range(steps):
                carry = body_a(i, carry)
        else:
            carry = jax.lax.fori_loop(0, steps, body_a, carry)
        ro_f, found = carry
        s = grid_sample(grid, ro_f)
        sum4 = jnp.concatenate(
            [
                jnp.where(found[..., None], s[..., :3], 0.0),
                1e-4 + found[..., None].astype(ro.dtype),
            ],
            -1,
        )
        return ro_f, sum4, found

    def body(i, carry):
        ro_c, sum_c, found = carry
        ro_n = jnp.where(found[..., None], ro_c, ro_c + rd)
        s = grid_sample(grid, ro_n)
        newly = (~found) & (s[..., 3] < open_thresh)
        add = jnp.concatenate([s[..., :3], jnp.ones_like(s[..., 3:])], -1)
        sum_n = sum_c + jnp.where(newly[..., None], add, 0.0)
        return ro_n, sum_n, found | newly

    carry = (ro, sum0, found0)
    if steps <= 4:  # unrolled: skips XLA while-loop overhead on the hot path
        for i in range(steps):
            carry = body(i, carry)
        return carry
    return jax.lax.fori_loop(0, steps, body, carry)


def _voxel_march(grid, ro, rd, sum4, num_steps, foggyness, accumulate_fog):
    """March until hitting a voxel with alpha > 0.3 (glsl:257-265 / 409-418)."""

    def body(i, carry):
        ro_c, sum_c, stopped = carry
        ro_n = jnp.where(stopped[..., None], ro_c, ro_c + rd)
        s = grid_sample(grid, ro_n)
        hit = s[..., 3] > 0.3
        live = ~stopped & ~hit
        add = jnp.concatenate([s[..., :3], jnp.ones_like(s[..., 3:])], -1)
        if accumulate_fog:
            sum_n = jnp.where(live[..., None], sum_c * foggyness + add, sum_c)
        else:
            sum_n = sum_c + jnp.where(live[..., None], add, 0.0)
        return ro_n, sum_n, stopped | hit

    stopped0 = jnp.zeros(ro.shape[:-1], bool)
    _, sum4, _ = jax.lax.fori_loop(0, num_steps, body, (ro, sum4, stopped0))
    return sum4


def _tone(sum4):
    """sum/=w then luminance-sqrt compression (glsl:267-270)."""
    mean = sum4[..., :3] / jnp.maximum(sum4[..., 3:4], 1e-4)
    return colorlib.tone_compress_sqrt(mean)


def sample_radiance_fast(grid, ro_world, rd_unit, lightgrid_scale,
                         dist_voxels=2.5, skip_steps=4, open_thresh=0.3,
                         n_samples=1, sample_spread=3.5, alpha_grid=None):
    """Irradiance-cache GI: the swept lightgrid already holds propagated
    radiance in every empty voxel (sweep_lightgrid), so instead of the
    reference's ~40-step hybrid march we take one tone-compressed trilinear
    sample a couple of voxels along the ray, after a blockage skip matching
    the reference's phase A (4 steps at open threshold 0.3,
    lighting_pass.glsl:280-288 — the round-2 2-step/0.5 variant left thick
    shadowed geometry black where the skip gave up, SSIM 0.85 vs reference).
    ~10x fewer gathers than sample_radiance_with_screen_trace; the TPU-fast
    default (config.gi_mode='fast'); 'reference' keeps the full march."""
    gsize = grid.shape[0]
    voxel_scale = 2.0 / gsize
    rd = rd_unit * voxel_scale
    ro = ro_world * lightgrid_scale

    ro, sum4, found = _skip_blockage(grid, ro, rd, steps=skip_steps,
                                     open_thresh=open_thresh,
                                     alpha_grid=alpha_grid)
    # seed with the first-open voxel's radiance — the march seeds its sum
    # with phase A's sample too (glsl:288 -> 399), and near-emitter voxels
    # carry the warm glow the far samples miss (round-2 A/B diff)
    acc_rgb = sum4[..., :3]
    acc_w = jnp.minimum(sum4[..., 3:4], 1.0)
    trans = 1.0
    for k in range(max(1, n_samples)):
        s = grid_sample(grid, ro + rd * (dist_voxels - 2.0 + k * sample_spread))
        open_k = jnp.clip((0.5 - s[..., 3:4]) * 4.0, 0.0, 1.0)
        acc_rgb = acc_rgb + trans * open_k * s[..., :3]
        acc_w = acc_w + trans * open_k
        trans = trans * open_k     # occluders attenuate farther samples
    rgb = colorlib.tone_compress_sqrt(acc_rgb / jnp.maximum(acc_w, 1e-4))
    blocked = sum4[..., 3:4] < 0.5
    return jnp.where(blocked, 0.0, rgb * jnp.minimum(acc_w, 1.0)), ro


def march_to_hit(alpha_grid, ro, rd, steps, thresh=0.3):
    """March the 16-byte alpha table until alpha > thresh; returns
    (ro_at_hit — frozen on hit, hit mask).

    The round-3 fidelity fix (VERDICT r2 #3): the screen probe was projecting
    the ray's FIRST-OPEN point, which for specular rays crossing open space
    sits a couple of voxels from the surface — not the far geometry the
    reference's hybrid march resolves to (lighting_pass.glsl:315-384).
    Marching the cheap alpha rows to the next BLOCKED voxel gives the probe
    the actual reflected target, which carries the warm emitter reflections
    the pillars were missing (the biggest term of the 0.90-SSIM residual).
    """
    hit0 = jnp.zeros(ro.shape[:-1], bool)

    def body(i, carry):
        ro_c, hit = carry
        ro_n = jnp.where(hit[..., None], ro_c, ro_c + rd)
        a = _sample_alpha_u16(alpha_grid, ro_n)
        return ro_n, hit | (a > thresh)

    carry = (ro, hit0)
    if steps <= 4:
        for i in range(steps):
            carry = body(i, carry)
        return carry
    return jax.lax.fori_loop(0, steps, body, carry)


def screen_probe(open_grid_ndc, lightgrid_scale, clip_from_world, depth_tex,
                 wprev, prev_hw, ss_intensity, z_margin=2e-4):
    """One-probe screen-space bounce for the fast GI path.

    The reference's hybrid trace resolves to the PREVIOUS FRAME's radiance
    where the GI ray crosses visible geometry (lighting_pass.glsl:371-384) —
    that term carries most of the warm bounce light the pure voxel lookup
    misses (measured: fast-vs-reference SSIM 0.85, diff concentrated on
    shadowed surfaces near emitters).  Instead of the 24-step march, project
    the ray's first-open point once: if it lands on-screen BEHIND the visible
    surface, the ray hit that surface — take the prev-frame color there.

    Cost: 2 gather rows per call (nearest depth + one bilinear window row of
    the quarter-res prev pyramid level).  Returns (hit mask [...], rgb).
    Known approximation: a point merely OCCLUDED from the camera (not on the
    ray's path) can false-hit — local color bleeding the reference's
    translucency boost also exhibits in milder form; TAA integrates it.
    """
    from ..utils import math3d as m3

    open_world = open_grid_ndc / lightgrid_scale
    p4 = m3.transform_points(clip_from_world, open_world)
    w = p4[..., 3]
    ndc = p4[..., :3] / jnp.where(jnp.abs(w[..., None]) < 1e-8, 1e-8,
                                  w[..., None])
    uv = ndc[..., :2] * 0.5 + 0.5
    onscreen = (w > 0.0) & jnp.all(jnp.abs(ndc[..., :2]) < 1.0, axis=-1)
    d_scene = sampling.sample_nearest(depth_tex[..., None], uv)[..., 0]
    hit = onscreen & (ndc[..., 2] > d_scene + z_margin) & (d_scene < 1.0)
    prev = sampling.sample_bilinear_window(wprev, prev_hw[0], prev_hw[1],
                                           uv, 3)
    return hit, prev * ss_intensity


def sample_radiance(grid, ro_world, rd_unit, lightgrid_scale, num_steps=12,
                    step_scale=1.0, alpha_grid=None):
    """Pure voxel-space GI march, SampleRadiance (lighting_pass.glsl:236-271)."""
    gsize = grid.shape[0]
    voxel_scale = 2.0 / gsize
    rd = rd_unit * voxel_scale
    ro = ro_world * lightgrid_scale

    ro, sum4, _ = _skip_blockage(grid, ro, rd, steps=12, open_thresh=0.1,
                                 alpha_grid=alpha_grid)
    no_open = sum4[..., 3] < 0.5
    sum4 = _voxel_march(grid, ro, rd * step_scale, sum4, num_steps, 0.0, False)
    out = _tone(sum4)
    return jnp.where(no_open[..., None], 0.0, out)


def sample_radiance_with_screen_trace(
    grid,
    depth_tex,
    prev_frame_atlas,
    view_from_world,
    clip_from_view,
    view_from_clip,
    world_from_view,
    v_dir,
    p0_view,
    ro_world,
    rd_unit,
    lightgrid_scale,
    num_steps,
    step_scale,
    noise_01,
    foggyness,
    ss_intensity,
    max_ss_steps=24,
    prev_base=None,
    prev_levels=None,
    alpha_grid=None,
):
    """Hybrid screen-space + voxel GI march — the port of
    SampleRadianceWithScreenSpaceTrace (lighting_pass.glsl:273-424).

    All per-pixel inputs are [...,k] dense arrays; the reference's early
    returns/breaks become per-lane status flags.  prev_frame_atlas is a mip
    atlas of the previous frame's radiance — the reference binds the
    *bloom downscale pyramid* there (render.cpp:862), i.e. half-res base;
    prev_base=(base_h, base_w) and prev_levels describe the atlas layout.
    """
    gsize = grid.shape[0]
    h, w = depth_tex.shape
    if prev_base is None:
        prev_base = (prev_frame_atlas.shape[0], prev_frame_atlas.shape[0])
    voxel_scale = 2.0 / gsize
    rd = rd_unit * voxel_scale
    ro0 = ro_world * lightgrid_scale

    # -- phase A: skip initial blockage (4 steps, open threshold 0.3)
    ro, sum4, _ = _skip_blockage(grid, ro0, rd, steps=4, open_thresh=0.3,
                                 alpha_grid=alpha_grid)

    # -- phase B: screen-space trace toward the first open point
    open_world = ro / lightgrid_scale
    open_vs = m3.transform_points(view_from_world, open_world)[..., :3]
    p0_vs = p0_view[..., :3]
    to_open = open_vs - p0_vs
    step_len0 = jnp.maximum(p0_vs[..., 2], 1.0) * (1.0 + noise_01) / 100.0
    ss_dir = to_open / jnp.maximum(
        jnp.linalg.norm(to_open[..., :2], axis=-1, keepdims=True), 1e-8
    )
    dist_to_travel = jnp.linalg.norm(to_open, axis=-1)

    # status: 0 = marching, 1 = resolved (result valid), 2 = fall through to voxel march
    st0 = dict(
        pos=p0_vs,
        step=ss_dir * step_len0[..., None],
        slen=step_len0,
        trav=jnp.zeros_like(step_len0),
        status=jnp.zeros(step_len0.shape, jnp.int32),
        result=jnp.zeros(p0_vs.shape[:-1] + (3,), jnp.float32),
    )

    fallback_pos = ro0 + 2.5 * v_dir * voxel_scale
    fb = grid_sample(grid, fallback_pos)
    fb_rgb = colorlib.tone_compress_sqrt(fb[..., :3])

    def ss_body(i, st):
        active = st["status"] == 0
        pos = jnp.where(active[..., None], st["pos"] + st["step"], st["pos"])
        trav = jnp.where(active, st["trav"] + st["slen"], st["trav"])

        ndc4 = m3.transform_points(clip_from_view, pos)
        ndc = ndc4[..., :3] / jnp.where(
            jnp.abs(ndc4[..., 3:4]) < 1e-8, 1e-8, ndc4[..., 3:4]
        )
        offscreen = jnp.any(jnp.abs(ndc[..., :2]) > 1.0, axis=-1) & active
        # off-screen -> fallback lightgrid sample (glsl:322-330)
        status = jnp.where(offscreen, 1, st["status"])
        result = jnp.where(offscreen[..., None], fb_rgb, st["result"])

        step = jnp.where(active[..., None], st["step"] * 1.2, st["step"])
        slen = jnp.where(active, st["slen"] * 1.2, st["slen"])

        uv = ndc[..., :2] * 0.5 + 0.5
        d = sampling.sample_nearest(depth_tex[..., None], uv)[..., 0]
        sp4 = m3.transform_points(
            view_from_clip, jnp.concatenate([ndc[..., :2], d[..., None]], -1)
        )
        surf_vs = sp4[..., :3] / jnp.where(
            jnp.abs(sp4[..., 3:4]) < 1e-8, 1e-8, sp4[..., 3:4]
        )
        hit = (
            (jnp.linalg.norm(surf_vs, axis=-1) < jnp.linalg.norm(pos, axis=-1))
            & active
            & ~offscreen
        )

        # solidity: 3 lightgrid alpha taps between surface and ray pos (glsl:348-356)
        t_start = m3.transform_points(world_from_view, surf_vs)[..., :3] * (
            lightgrid_scale * 0.5
        ) + 0.5
        t_end = m3.transform_points(world_from_view, pos)[..., :3] * (
            lightgrid_scale * 0.5
        ) + 0.5
        noff = noise_01 * 0.2
        asum = 0.0
        for k in (0.2, 0.4, 0.6):
            mixk = t_start + (t_end - t_start) * (noff + k)[..., None]
            if alpha_grid is not None:  # 16B alpha rows, ~2x gather rate
                asum = asum + sampling.sample_trilinear_window(
                    alpha_grid, mixk, 1, decode=lambda v: v * (1.0 / 255.0)
                )[..., 0]
            else:
                asum = asum + _gs_uvw(grid, mixk)[..., 3]
        solid = asum >= 1.5

        # translucent surface: boost the step and keep going (glsl:357-361)
        boost = hit & ~solid
        bf = (2.0 + noise_01)[..., None]
        step = jnp.where(boost[..., None], step * bf, step)
        slen = jnp.where(boost, slen * bf[..., 0], slen)

        # solid hit: sample previous frame at this uv (glsl:371-384)
        resolve = hit & solid
        lod = jnp.minimum(slen * 5.0, 5.0)
        prev = sampling.sample_mip_atlas(
            prev_frame_atlas, prev_base[0], prev_base[1], uv, lod, levels=prev_levels
        )[..., :3]
        status = jnp.where(resolve, 1, status)
        result = jnp.where(resolve[..., None], prev * ss_intensity, result)

        # distance exhausted -> proceed to voxel march (glsl:392)
        done = (trav > dist_to_travel) & active & ~offscreen & ~resolve & ~boost
        status = jnp.where(done, 2, status)

        return dict(pos=pos, step=step, slen=slen, trav=trav, status=status, result=result)

    st = jax.lax.fori_loop(0, max_ss_steps, ss_body, st0)
    # lanes that ran out of iterations: treat like distance-exhausted
    status = jnp.where(st["status"] == 0, 2, st["status"])

    # -- phase C: continue in voxel space (glsl:399-423)
    no_open = sum4[..., 3] < 0.5
    rd2 = rd * step_scale
    ro_c = ro + rd2 * noise_01[..., None]
    sum_c = _voxel_march(grid, ro_c, 0.5 * rd2, sum4, num_steps, foggyness[..., None]
                         if jnp.ndim(foggyness) else foggyness, True)
    voxel_rgb = jnp.where(no_open[..., None], 0.0, _tone(sum_c))

    return jnp.where((status == 1)[..., None], st["result"], voxel_rgb)
