"""Deterministic screen-space noise sequences.

Reimplements the reference's noise toolbox (lighting_pass.glsl:119-147,426-430):
interleaved gradient noise, the R2 quasirandom sequence used for TAA jitter
(render.cpp:973-975, render.cpp:649-652), and the 4x4 Bayer matrix.  These are
bit-deterministic functions of pixel coordinate + frame index, which makes
frames reproducible — the foundation of the golden-image test strategy
(SURVEY.md §4).
"""

from __future__ import annotations

import jax.numpy as jnp

# R2 sequence constants: 1/phi2, 1/phi2^2 where phi2 is the plastic number
# (lighting_pass.glsl:145-147).
_R2_ALPHA = (0.7548776662466927, 0.5698402909980532)

# Bayer 4x4 ordered-dither matrix, values k/16 (lighting_pass.glsl:426-430).
# bayerIndex is column-major mat4: bayerIndex[col][row]; indexed [x%4][y%4],
# i.e. x selects the column.  BAYER4[y, x] therefore transposes the literal.
BAYER4 = (
    jnp.array(
        [
            [0.0, 8.0, 2.0, 10.0],
            [12.0, 4.0, 14.0, 6.0],
            [3.0, 11.0, 1.0, 9.0],
            [15.0, 7.0, 13.0, 5.0],
        ],
        jnp.float32,
    ).T
    / 16.0
)


def interleaved_gradient_noise(px, py):
    """IGN in [0,1) from integer-ish pixel coordinates (float in, float out)."""
    return jnp.mod(52.9829189 * jnp.mod(0.06711056 * px + 0.00583715 * py, 1.0), 1.0)


def r2_sequence(n):
    """2-D low-discrepancy point for index n; returns values in [0,1)^2."""
    n = jnp.asarray(n, jnp.float32)
    return jnp.stack([jnp.mod(n * _R2_ALPHA[0], 1.0), jnp.mod(n * _R2_ALPHA[1], 1.0)], axis=-1)


def taa_jitter(frame_idx, width, height):
    """Sub-pixel NDC jitter for frame `frame_idx` (render.cpp:973-975).

    jitter = (r2(n)*2-1) / (width, height); added to clip xy scaled by w
    (geometry_pass.glsl:109-113).
    """
    j = r2_sequence(frame_idx) * 2.0 - 1.0
    return j / jnp.array([width, height], jnp.float32)


def frame_noise(px, py, frame_idx_mod_59, offset=(0.0, 0.0)):
    """Per-pixel per-frame noise matching lighting_pass.glsl:456-459.

    noise = fract(IGN(pixel + offset) + 1000*phi*frame_idx_mod_59)
    """
    noise_offset = 1000.0 * 1.61803398875 * frame_idx_mod_59
    return jnp.mod(interleaved_gradient_noise(px + offset[0], py + offset[1]) + noise_offset, 1.0)


def bayer_noise(px, py, noise_1):
    """Bayer-matrix constant in [0,16) (lighting_pass.glsl:564-565)."""
    bx = jnp.floor(px + noise_1 * 50502.0501253).astype(jnp.int32) % 4
    by = jnp.floor(py + noise_1 * 2052.213).astype(jnp.int32) % 4
    return BAYER4[by, bx] * 16.0
