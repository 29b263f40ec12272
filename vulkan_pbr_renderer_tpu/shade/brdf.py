"""BRDF term library.

The one-stop module for the microfacet terms the reference duplicates across
its shaders (SURVEY.md §2.3 "shared shader-library functions";
lighting_pass.glsl:21-117).  All functions are elementwise jnp math over
arrays of any shape (scalars broadcast), safe under jit/vmap/grad.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846
GOLDEN_RATIO = 1.61803398875


def distribution_ggx(n_dot_h, roughness):
    """GGX/Trowbridge-Reitz NDF with alpha = roughness^2 (lighting_pass.glsl:21-31)."""
    a = roughness * roughness
    a2 = a * a
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI * d * d)


def distribution_beckmann(n_dot_h, m):
    """Beckmann NDF (lighting_pass.glsl:108-113); m is the rms slope."""
    m2 = m * m
    nh = jnp.clip(n_dot_h, 1e-4, 1.0)
    nh2 = nh * nh
    tan2 = (1.0 - nh2) / nh2
    return jnp.exp(-tan2 / m2) / (PI * m2 * nh2 * nh2)


def distribution_phong(n_dot_h, n):
    """Normalized Phong NDF (lighting_pass.glsl:115-117)."""
    return ((n + 2.0) / (2.0 * PI)) * jnp.power(jnp.maximum(n_dot_h, 0.0), n)


def geometry_schlick_ggx(n_dot_v, k):
    return n_dot_v / (n_dot_v * (1.0 - k) + k)


def geometry_smith_direct(v_dot_n, l_dot_n, roughness):
    """Smith G with the direct-lighting k remap (roughness+1)^2/8 (glsl:64-70)."""
    r = roughness + 1.0
    k = r * r / 8.0
    return geometry_schlick_ggx(v_dot_n, k) * geometry_schlick_ggx(l_dot_n, k)


def geometry_smith_ibl(n_dot_v, n_dot_l, roughness):
    """Smith G with the IBL k remap roughness^2/2 (glsl:56-61)."""
    k = roughness * roughness / 2.0
    return geometry_schlick_ggx(n_dot_v, k) * geometry_schlick_ggx(n_dot_l, k)


def geometry_mikkelsen(n_dot_h, v_dot_n, l_dot_n, v_dot_h):
    """Cook-Torrance geometric attenuation (glsl:72-74) — used for the sun."""
    vh = jnp.maximum(v_dot_h, 1e-6)
    return jnp.minimum(
        1.0,
        jnp.minimum(2.0 * n_dot_h * v_dot_n / vh, 2.0 * n_dot_h * l_dot_n / vh),
    )


def fresnel_schlick(cos_theta, f0):
    """Schlick Fresnel (glsl:76-79). f0 broadcasts against cos_theta[...,None]."""
    c = jnp.clip(cos_theta, 0.0, 1.0)
    if f0.ndim > c.ndim:
        c = c[..., None]
    return f0 + (1.0 - f0) * jnp.power(1.0 - c, 5.0)


def fresnel_schlick_roughness(cos_theta, f0, roughness):
    """Roughness-aware Schlick (glsl:82-85). cos_theta/roughness pre-broadcast
    to f0's shape by the caller ([...,1] against [...,3])."""
    c = jnp.clip(cos_theta, 0.0, 1.0)
    return f0 + (jnp.maximum(1.0 - roughness, f0) - f0) * jnp.power(1.0 - c, 5.0)


def f0_from_metallic(base_color, metallic, f0_dielectric=0.04):
    """F0 = mix(0.04, albedo, metallic) (lighting_pass.glsl:657-658)."""
    m = metallic[..., None] if jnp.ndim(metallic) < jnp.ndim(base_color) else metallic
    return f0_dielectric * (1.0 - m) + base_color * m


def cook_torrance_direct(n, v, l, base_color, roughness, metallic, f0_dielectric=0.04):
    """Direct-light Cook-Torrance exactly as the sun term (glsl:655-679):
    D = GGX, G = Mikkelsen, F = Schlick(VdotH), kD from Fresnel(NdotV),
    result multiplied by NdotL; returns [...,3] BRDF*NdotL (no light color).
    """
    h_un = l + v
    h = h_un / jnp.maximum(jnp.linalg.norm(h_un, axis=-1, keepdims=True), 1e-8)
    n_dot_l = jnp.maximum(jnp.sum(n * l, -1), 0.0)
    v_dot_n = jnp.maximum(jnp.sum(n * v, -1), 0.0)
    v_dot_h = jnp.maximum(jnp.sum(v * h, -1), 0.0)
    n_dot_h = jnp.maximum(jnp.sum(n * h, -1), 0.0)

    f0 = f0_from_metallic(base_color, metallic, f0_dielectric)
    d = distribution_ggx(n_dot_h, roughness)
    g = geometry_mikkelsen(n_dot_h, v_dot_n, n_dot_l, v_dot_h)
    f = fresnel_schlick(v_dot_h, f0)
    spec = f * (g * d / jnp.maximum(4.0 * n_dot_l * v_dot_n, 1e-4))[..., None]

    ks = fresnel_schlick(v_dot_n, f0)
    kd = (1.0 - ks) * (1.0 - metallic[..., None])
    brdf = kd * base_color / PI + spec
    return jnp.where(n_dot_l[..., None] > 0.0, brdf * n_dot_l[..., None], 0.0)
