"""Color/tonemapping helpers shared across passes.

The ACES approximation + gamma encode reproduce final_post_process.glsl:1-36
(Narkowicz constants with the 0.6 pre-scale from https://64.github.io/tonemapping/,
which the reference inlines in four shaders).  sRGB conversion uses the
reference's pow-2.2 approximation (geometry_pass.glsl:260).
"""

from __future__ import annotations

import jax.numpy as jnp


def aces_approx(v):
    """ACES filmic approximation incl. the 0.6 pre-scale; clamps to [0,1]."""
    v = v * 0.6
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((v * (a * v + b)) / (v * (c * v + d) + e), 0.0, 1.0)


def gamma_encode(v):
    """pow(1/2.2) gamma encode (final_post_process.glsl:33)."""
    return jnp.power(jnp.maximum(v, 0.0), 1.0 / 2.2)


def srgb_to_linear_pow22(v):
    """The reference's sRGB→linear: pow(x, 2.2) (geometry_pass.glsl:260)."""
    return jnp.power(jnp.maximum(v, 0.0), 2.2)


def luminance_rec601(v):
    """0.299/0.587/0.114 luma used by the GI tone compressor (lighting_pass.glsl:268)."""
    return 0.299 * v[..., 0] + 0.587 * v[..., 1] + 0.114 * v[..., 2]


def luminance_rec709(v):
    """Rec.709 luma used by TAA/bloom (taa_resolve.glsl:176-178)."""
    return 0.2127 * v[..., 0] + 0.7152 * v[..., 1] + 0.0722 * v[..., 2]


def tone_compress_sqrt(rgb_mean):
    """Luminance-sqrt compression of GI radiance (lighting_pass.glsl:267-270)."""
    lum = luminance_rec601(rgb_mean)[..., None]
    return rgb_mean * jnp.sqrt(jnp.maximum(lum, 0.0)) / jnp.maximum(lum, 1e-4)
