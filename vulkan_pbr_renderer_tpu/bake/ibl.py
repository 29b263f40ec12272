"""One-time IBL precompute — ports of the three gen_*.glsl compute bakes.

These run once at startup (the reference dispatches them from HotreloadShaders,
render.cpp:505-619) and are cacheable to disk (bake/cache.py).  All three use
the same golden-spiral equal-area hemisphere sampling
(gen_irradiance_map.glsl:84-92): pitch = pi - acos(i/N - 1) in (0, pi/2],
yaw = 2*pi*i/phi; directions built by rotating N about its tangent then about
itself.  Sample loops run as lax.scan over chunks so memory stays bounded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..gpu import sampling
from ..utils import math3d as m3
from ..shade import brdf

SOME_VECTOR = jnp.array([12.123825810901, 6.11831989512, -5.12039214121], jnp.float32)
PI = np.pi


def golden_spiral(n):
    """(pitch, yaw) arrays of the reference's hemisphere point set."""
    i = np.arange(n, dtype=np.float64)
    x = i / n
    pitch = PI - np.arccos(np.clip(x - 1.0, -1.0, 1.0))
    yaw = 2.0 * PI * (i / 1.61803398875)
    return jnp.asarray(pitch, jnp.float32), jnp.asarray(yaw, jnp.float32)


def _face_dirs(size):
    """[6,S,S,3] unit directions at cubemap texel centers."""
    uv1 = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    u, v = jnp.meshgrid(uv1, uv1, indexing="xy")
    uvg = jnp.stack([u, v], -1)  # [S,S,2] (u=x, v=y)
    faces = []
    for f in range(6):
        faces.append(
            sampling.cubemap_dir_from_face_uv(jnp.full((size, size), f, jnp.int32), uvg)
        )
    return jnp.stack(faces)


def _hemisphere_dir(n, tangent, pitch, yaw):
    """Rotate(Rotate(N, tangent, pitch), N, yaw) — broadcast over texels."""
    d = m3.rotate_about_axis(n, tangent, pitch)
    return m3.rotate_about_axis(d, n, yaw)


@functools.partial(jax.jit, static_argnames=(
    "env_base_size", "size", "samples", "chunk"))
def bake_irradiance(env_cube_atlas, env_base_size, size=32, samples=1024, chunk=64):
    """Diffuse irradiance cubemap (gen_irradiance_map.glsl:73-101):
    mean of cos(pitch)-weighted env samples at LOD 6.  Returns [6,S,S,3]."""
    chunk = min(chunk, samples)
    n = _face_dirs(size)                                       # [6,S,S,3]
    tangent = m3.normalize(jnp.cross(n, SOME_VECTOR))
    pitches, yaws = golden_spiral(samples)

    def body(acc, idx):
        p = jax.lax.dynamic_slice_in_dim(pitches, idx, chunk)
        y = jax.lax.dynamic_slice_in_dim(yaws, idx, chunk)
        def one(pk, yk):
            d = _hemisphere_dir(n, tangent, pk, yk)
            val = sampling.sample_cubemap_lod(
                env_cube_atlas, env_base_size, d, jnp.full(d.shape[:-1], 6.0)
            )
            return jnp.cos(pk) * val[..., :3]
        vals = jax.vmap(one)(p, y)                             # [chunk,6,S,S,3]
        return acc + jnp.sum(vals, axis=0), None

    acc0 = jnp.zeros((6, size, size, 3), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(0, samples, chunk))
    return acc / samples


# the hardcoded per-mip roughness table (gen_prefiltered_env_map.glsl:117)
PREFILTER_ROUGHNESS = (0.0, 0.03, 0.15, 0.4, 0.6)


@functools.partial(jax.jit, static_argnames=(
    "env_base_size", "size", "min_size", "samples", "chunk"))
def bake_prefiltered_env(env_cube_atlas, env_base_size, size=256, min_size=16,
                         samples=8192, chunk=64):
    """Specular prefiltered env mips (gen_prefiltered_env_map.glsl:103-151).

    mip 0: direct env lookup at LOD 1.  mips 1..4 (down to 16^2): Beckmann-
    weighted golden-spiral convolution (N=R assumption), env at LOD 3+mip,
    result divided by pi.  Returns the cube mip atlas [6,S,Wa,3] with the
    remaining chain below min_size box-filtered from the last baked level.
    """
    chunk = min(chunk, samples)
    levels = []
    mip = 0
    s = size
    while s >= 1:
        if mip == 0:
            d = _face_dirs(s)
            lv = sampling.sample_cubemap_lod(
                env_cube_atlas, env_base_size, d, jnp.ones(d.shape[:-1])
            )[..., :3]
        elif s >= min_size and mip < len(PREFILTER_ROUGHNESS):
            r = _face_dirs(s)
            tangent = m3.normalize(jnp.cross(r, SOME_VECTOR))
            rough = PREFILTER_ROUGHNESS[mip]
            pitches, yaws = golden_spiral(samples)
            dw = 2.0 * PI / samples

            def body(acc, idx):
                p = jax.lax.dynamic_slice_in_dim(pitches, idx, chunk)
                y = jax.lax.dynamic_slice_in_dim(yaws, idx, chunk)
                def one(pk, yk):
                    l = _hemisphere_dir(r, tangent, pk, yk)
                    rad = sampling.sample_cubemap_lod(
                        env_cube_atlas, env_base_size, l,
                        jnp.full(l.shape[:-1], 3.0 + mip),
                    )[..., :3]
                    d_w = brdf.distribution_beckmann(jnp.cos(pk * 0.5), rough)
                    return d_w * rad * jnp.cos(pk) * dw
                vals = jax.vmap(one)(p, y)
                return acc + jnp.sum(vals, axis=0), None

            acc0 = jnp.zeros((6, s, s, 3), jnp.float32)
            acc, _ = jax.lax.scan(body, acc0, jnp.arange(0, samples, chunk))
            lv = acc / PI
        else:
            # below the baked range: box-filter the previous level
            prev = levels[-1]
            lv = jax.vmap(sampling.downsample2x)(prev)
        levels.append(lv)
        s //= 2
        mip += 1

    # pack into the cube mip atlas layout
    per_face = []
    for f in range(6):
        per_face.append(sampling.pack_mip_atlas([lv[f] for lv in levels]))
    return jnp.stack(per_face)


@functools.partial(jax.jit, static_argnames=("size", "samples", "chunk"))
def bake_brdf_lut(size=256, samples=4096, chunk=256):
    """Split-sum BRDF LUT (gen_brdf_integration_map.glsl:142-210): 256^2 over
    (NdotV, roughness) -> (scale, bias) with D_Beckmann * G_Mikkelsen weights.
    Returns [S,S,2] (x = NdotV along width, y = roughness along height)."""
    chunk = min(chunk, samples)
    uv1 = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    n_dot_v = uv1[None, :]                      # u (width)  -> NdotV
    roughness = uv1[:, None]                    # v (height) -> roughness
    n_dot_v = jnp.broadcast_to(n_dot_v, (size, size))
    roughness = jnp.broadcast_to(roughness, (size, size))

    sin_v = jnp.sqrt(jnp.clip(1.0 - n_dot_v**2, 0.0, 1.0))
    v = jnp.stack([jnp.zeros_like(n_dot_v), -sin_v, n_dot_v], -1)
    # (the reference rotates V about +x by acos(NdotV): V = (0, -sin, cos))

    pitches, yaws = golden_spiral(samples)
    dw = 2.0 * PI / samples

    def body(carry, idx):
        scale, bias = carry
        p = jax.lax.dynamic_slice_in_dim(pitches, idx, chunk)
        y = jax.lax.dynamic_slice_in_dim(yaws, idx, chunk)

        def one(pk, yk):
            # L = Rotate(Rotate(N=(0,0,1), x-axis, pitch), N, yaw)
            sp, cp = jnp.sin(pk), jnp.cos(pk)
            # Rotate((0,0,1), x, pitch) = (0, -sin p, cos p); then rotate about z by yaw:
            l0 = jnp.stack([jnp.zeros_like(pk), -sp, cp])
            cy, sy = jnp.cos(yk), jnp.sin(yk)
            l = jnp.stack([cy * l0[0] - sy * l0[1], sy * l0[0] + cy * l0[1], l0[2]])
            l = jnp.broadcast_to(l, (size, size, 3))
            h = m3.normalize(l + v)
            n_dot_l = l[..., 2]
            n_dot_h = h[..., 2]
            v_dot_h = jnp.sum(v * h, -1)
            d = brdf.distribution_beckmann(n_dot_h, roughness)
            g = brdf.geometry_mikkelsen(n_dot_h, n_dot_v, n_dot_l, v_dot_h)
            fc = jnp.power(jnp.clip(1.0 - v_dot_h, 0.0, 1.0), 5.0)
            common = d * g * dw / (4.0 * jnp.maximum(n_dot_v, 1e-4))
            return common * (1.0 - fc), common * fc

        s_c, b_c = jax.vmap(one)(p, y)
        return (scale + jnp.sum(s_c, 0), bias + jnp.sum(b_c, 0)), None

    (scale, bias), _ = jax.lax.scan(
        body,
        (jnp.zeros((size, size)), jnp.zeros((size, size))),
        jnp.arange(0, samples, chunk),
    )
    return jnp.stack([scale, bias], -1)
