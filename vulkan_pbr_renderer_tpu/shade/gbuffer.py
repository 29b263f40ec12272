"""Deferred G-buffer assembly from the visibility buffer.

Replaces the reference's geometry pass fragment shader
(geometry_pass.glsl:255-352).  The rasterizer gives us (depth, tri_id) per
pixel; this pass gathers the 3 vertices of each pixel's triangle, interpolates
attributes with perspective-correct barycentrics, computes **analytic** screen
derivatives (the TPU replacement for dFdx/dFdy), samples the four material
texture arrays with derivative-based mip selection, applies the alpha test and
the derivative-TBN normal mapping (geometry_pass.glsl:284-310), and emits the
same five G-buffer targets as the reference (render.cpp:680-691):
base_color, world normal, ORM, emissive, velocity — plus depth and a coverage
mask (the TPU stand-in for "background pixel").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..gpu import sampling
from ..raster.setup import TriSetup
from ..utils import math3d as m3


class GBuffer(NamedTuple):
    base_color: jnp.ndarray   # [H,W,3] linear albedo
    normal: jnp.ndarray       # [H,W,3] world-space, unit (mapped)
    orm: jnp.ndarray          # [H,W,3]
    emissive: jnp.ndarray     # [H,W,3]
    depth: jnp.ndarray        # [H,W] ndc z in [0,1]; 1.0 where empty
    velocity: jnp.ndarray     # [H,W,2] ndc velocity (cur - prev), jitter-free
    coverage: jnp.ndarray     # [H,W] bool


def pack_raster_row(setup: TriSetup, scene):
    """Per-frame [T,16] f32 row: adj (9, row-major), c_w (3), mat id, alpha
    flag, pad — so the G-buffer's per-pixel triangle fetch is exactly TWO
    gather rows (this 64-byte one + the static 96-byte scene.tri_attr) instead
    of round 1's six (meta + 3 verts + adj + c_w)."""
    n = setup.adj.shape[0]
    return jnp.concatenate(
        [
            setup.adj.reshape(n, 9),
            setup.c_w,
            scene.mat_id.astype(jnp.float32)[:, None],
            scene.tri_alpha[:, None],
            jnp.zeros((n, 2), jnp.float32),
        ],
        axis=1,
    )


def _lambda_and_derivs(adj, cw, px, py):
    """Perspective-correct barycentrics + their exact screen-x/y derivatives.

    lambda_j(p) = e_j(p) / W(p) with e_j, W affine in p =>
    d(lambda_j)/dx = (a_jx * W - e_j * W_x) / W^2  (a_jx = x-coefficient).
    This replaces hardware dFdx/dFdy (geometry_pass.glsl:284-287) with exact
    derivatives (no 2x2 quad quantization).  adj [...,3,3] (columns = edges),
    cw [...,3] fetched by the caller.
    """
    p = jnp.stack([px + 0.5, py + 0.5, jnp.ones_like(px)], -1)
    e = jnp.einsum("...ij,...i->...j", adj, p)     # [...,3]
    w = jnp.einsum("...i,...i->...", cw, p)
    w = jnp.where(jnp.abs(w) < 1e-20, 1e-20, w)
    lam = e / w[..., None]
    ex = adj[..., 0, :]                            # x-coeff of each edge fn
    ey = adj[..., 1, :]
    wx = cw[..., 0:1]
    wy = cw[..., 1:2]
    dlam_dx = (ex - lam * wx) / w[..., None]
    dlam_dy = (ey - lam * wy) / w[..., None]
    return lam, dlam_dx, dlam_dy


def _interp(attr_tri, lam):
    """attr_tri [...,3,A] interpolated by lam [...,3] -> [...,A].

    Written as explicit VPU mul/adds: the einsum form lowered to a batched
    dot_general that XLA padded onto the MXU (3-wide contraction at `highest`
    f32 precision = 6 systolic passes) — 105 ms/frame in the round-1 profile,
    the G-buffer's "unexplained" cost.
    """
    return (
        attr_tri[..., 0, :] * lam[..., 0:1]
        + attr_tri[..., 1, :] * lam[..., 1:2]
        + attr_tri[..., 2, :] * lam[..., 2:3]
    )


def gbuffer_pass(
    scene,
    setup: TriSetup,
    depth,
    tri_id,
    clip_from_world,
    old_clip_from_world,
    alpha_threshold=0.3,
    row_offset=0,
):
    """Assemble the G-buffer.  All inputs are device arrays; fully jit-safe.

    scene: assets.scene.Scene; depth/tri_id: [H,W] from the rasterizer
    (rows starting at global pixel row `row_offset` for the sharded path).
    """
    h, w = depth.shape
    covered = tri_id >= 0
    tid = jnp.maximum(tri_id, 0)

    px = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    py = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.float32)[:, None] + row_offset, (h, w)
    )

    # TWO gather rows per pixel: the per-frame raster row (adj, c_w, mat,
    # alpha) and the static triangle attribute row (3 verts' pos/nrm/uv)
    row_a = pack_raster_row(setup, scene)[tid]     # [H,W,16]
    adj = row_a[..., 0:9].reshape(row_a.shape[:-1] + (3, 3))
    cw = row_a[..., 9:12]
    mat = row_a[..., 12].astype(jnp.int32)
    do_test = row_a[..., 13] > 0.5

    lam, dlam_dx, dlam_dy = _lambda_and_derivs(adj, cw, px, py)

    attr = scene.tri_attr[tid]                     # [H,W,24]
    pos_tri = attr[..., 0:9].reshape(attr.shape[:-1] + (3, 3))
    nrm_tri = attr[..., 9:18].reshape(attr.shape[:-1] + (3, 3))
    uv_tri = attr[..., 18:24].reshape(attr.shape[:-1] + (3, 2))

    world_pos = _interp(pos_tri, lam)
    normal_geo = _interp(nrm_tri, lam)
    normal_geo = m3.normalize(normal_geo)
    uv = _interp(uv_tri, lam)

    duv_dx = _interp(uv_tri, dlam_dx)              # exact d(uv)/d(pixel x)
    duv_dy = _interp(uv_tri, dlam_dy)
    dpos_dx = _interp(pos_tri, dlam_dx)
    dpos_dy = _interp(pos_tri, dlam_dy)

    # mip level from uv footprint in texels (standard GL lod rule)
    ts = scene.tex_packed.shape[1]
    du = jnp.maximum(
        jnp.sum((duv_dx * ts) ** 2, -1), jnp.sum((duv_dy * ts) ** 2, -1)
    )
    lod = 0.5 * jnp.log2(jnp.maximum(du, 1e-12))
    lod = jnp.clip(lod, 0.0, 16.0)

    # nearest-mip (GL *_MIPMAP_NEAREST) from the uint8 window atlas: ONE
    # 48-byte gather row per pixel (was 2x192B f32 trilinear rows — the
    # single largest op of the round-1 frame, 277 ms; docs/PERF_NOTES.md)
    texel = sampling.sample_mip_atlas_array_window_nearest(
        scene.tex_packed, mat, uv, lod, 12, scale=scene.tex_scale
    )
    base_color = texel[..., 0:4]
    nrm_xy = texel[..., 4:6]
    orm = texel[..., 6:9]
    emissive = texel[..., 9:12]

    # alpha test (geometry_pass.glsl:259): discard -> background
    alpha_ok = jnp.where(do_test, base_color[..., 3] >= alpha_threshold, True)
    covered = covered & alpha_ok

    albedo = jnp.power(jnp.maximum(base_color[..., :3], 0.0), 2.2)  # sRGB->linear (glsl:260)

    # --- derivative TBN + normal mapping (geometry_pass.glsl:277-310) -----
    tsn_xy = nrm_xy * 2.0 - 1.0
    tsn_z = jnp.sqrt(jnp.maximum(1.0 - jnp.sum(tsn_xy**2, -1), 0.0))
    n_geo = normal_geo
    handed = duv_dx[..., 0] * duv_dy[..., 1] - duv_dx[..., 1] * duv_dy[..., 0]

    def _ortho(v, n):
        return m3.normalize(v - n * m3.dot(v, n, keepdims=True))

    # branch 1 (mirrored uv): B from texcoord-X
    denorm_b = dpos_dx * duv_dy[..., 0:1] - dpos_dy * duv_dx[..., 0:1]
    b1 = _ortho(denorm_b, n_geo)
    t1 = jnp.cross(b1, n_geo)
    # branch 2: T from texcoord-Y
    denorm_t = dpos_dx * duv_dy[..., 1:2] - dpos_dy * duv_dx[..., 1:2]
    t2 = _ortho(denorm_t, n_geo)
    b2 = jnp.cross(t2, n_geo)
    mirrored = (handed < 0.0)[..., None]
    t_vec = jnp.where(mirrored, t1, t2)
    b_vec = jnp.where(mirrored, b1, b2)
    normal = (
        t_vec * tsn_xy[..., 0:1] + b_vec * tsn_xy[..., 1:2] + n_geo * tsn_z[..., None]
    )
    normal = m3.normalize(normal)
    # degenerate uv derivatives -> fall back to geometric normal
    degenerate = (jnp.abs(handed) < 1e-20)[..., None]
    normal = jnp.where(degenerate, n_geo, normal)

    # --- velocity (geometry_pass.glsl:312): jitter-free ndc motion --------
    ndc_cur, _ = m3.project_points(clip_from_world, world_pos)
    ndc_old, _ = m3.project_points(old_clip_from_world, world_pos)
    velocity = ndc_cur[..., :2] - ndc_old[..., :2]

    cov3 = covered[..., None]
    return GBuffer(
        base_color=jnp.where(cov3, albedo, 0.0),
        normal=jnp.where(cov3, normal, jnp.array([0.0, 0.0, 1.0])),
        orm=jnp.where(cov3, orm, 0.0),
        emissive=jnp.where(cov3, emissive, 0.0),
        depth=jnp.where(covered, depth, 1.0),
        velocity=jnp.where(covered[..., None], velocity, 0.0),
        coverage=covered,
    )
