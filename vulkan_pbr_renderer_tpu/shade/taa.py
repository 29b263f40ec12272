"""Temporal anti-aliasing resolve — port of taa_resolve.glsl:180-287.

Per pixel: Mitchell-Netravali-weighted 3x3 source filter, neighborhood
first/second moments, closest-depth velocity dilation, Catmull-Rom history
resampling at the reprojected uv, variance clipping to mu +/- gamma*sigma,
and velocity-difference-based history rejection.

Deviation from the reference, on purpose: the reference's dilation loop reads
the depth at the *unshifted* uv (taa_resolve.glsl:215 samples `uv`, not
`sample_uv`), which degenerates closest_depth_uv to the constant (-1,-1)
neighbor.  We implement the intended closest-depth dilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gpu import sampling


def _mitchell(x, b=1.0 / 3.0, c=1.0 / 3.0):
    ax = abs(x)
    if ax < 1:
        return ((12 - 9 * b - 6 * c) * ax**3 + (-18 + 12 * b + 6 * c) * ax**2 + (6 - 2 * b)) / 6
    if ax < 2:
        return ((-b - 6 * c) * ax**3 + (6 * b + 30 * c) * ax**2 + (-12 * b - 48 * c) * ax + (8 * b + 24 * c)) / 6
    return 0.0


def _shift_edge(img, dy, dx):
    """Image shifted so out[y,x] = img[y+dy, x+dx], edge-clamped."""
    h, w = img.shape[:2]
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (img.ndim - 2)
    p = jnp.pad(img, pad, mode="edge")
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(p, 1 + dy, h, 0), 1 + dx, w, 1
    )


def taa_resolve(
    lighting,        # [H,W,3] current lighting result
    depth,           # [H,W]
    velocity,        # [H,W,2] current ndc velocity
    velocity_prev,   # [H,W,2] previous frame's velocity buffer
    history,         # [H,W,3] previous TAA output
    blend=0.05,
    velocity_rejection=1000.0,
    gamma=1.0,
    catmull_history=True,
):
    """Returns the new TAA output [H,W,3]."""
    h, w = depth.shape
    offsets = [(dy, dx) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    neighbors = jnp.stack([_shift_edge(lighting, dy, dx) for (dy, dx) in offsets])
    weights = jnp.asarray(
        [_mitchell(np.hypot(dx, dy)) for (dy, dx) in offsets], jnp.float32
    )

    source = jnp.einsum("nhwc,n->hwc", neighbors, weights) / jnp.sum(weights)
    m1 = jnp.mean(neighbors, axis=0)
    m2 = jnp.mean(neighbors**2, axis=0)
    sigma = jnp.sqrt(jnp.abs(m2 - m1 * m1))
    minc = m1 - gamma * sigma
    maxc = m1 + gamma * sigma

    # closest-depth velocity dilation — dense select tournament (argmin +
    # take_along_axis lower to gathers on TPU)
    best_d = depth
    vel = velocity
    for (dy, dx) in offsets:
        if dy == 0 and dx == 0:
            continue
        d_n = _shift_edge(depth, dy, dx)
        v_n = _shift_edge(velocity, dy, dx)
        take = d_n < best_d
        best_d = jnp.where(take, d_n, best_d)
        vel = jnp.where(take[..., None], v_n, vel)

    u = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / w
    v = (jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5) / h
    uv = jnp.stack([jnp.broadcast_to(u, (h, w)), jnp.broadcast_to(v, (h, w))], -1)
    reproj_uv = uv - vel * 0.5

    # History resample in YCoCg, split by what the eye needs (the gather-rate
    # ceiling is ~170 M rows/s for <=32-byte rows and wide rows degrade —
    # docs/microbench_gather2.py — so the 4x4 f16 RGB window (96B rows from a
    # 200 MB table) and even the 2x2 5-tap (5 x 24B rows) are both slow):
    #  * luma: full 16-tap Catmull-Rom from a 4x4 window of f16 luma
    #    ([H,W,16], 32B rows, 67 MB -> VMEM-promoted) — sharpness lives in
    #    luma;
    #  * chroma: bilinear CoCg from a 2x2 f16 window ([H,W,8], 16B rows).
    # 2 gather rows/pixel total.  The reference's RGB Catmull
    # (taa_resolve.glsl:125-174) differs only by the chroma filter.
    wvel = sampling.window_pack(velocity_prev, 2, 2, dtype=jnp.float16)
    prev_vel = sampling.sample_bilinear_window(wvel, h, w, reproj_uv, 2)
    if catmull_history:
        y = (0.25 * history[..., 0] + 0.5 * history[..., 1]
             + 0.25 * history[..., 2])
        co = 0.5 * history[..., 0] - 0.5 * history[..., 2]
        cg = (-0.25 * history[..., 0] + 0.5 * history[..., 1]
              - 0.25 * history[..., 2])
        # f16 luma: log-distributed 0.05% relative precision at every scale —
        # exactly the reference's RGBA16F RT precision — and decode-free.
        # (Two compressed-u16 schemes lost to it: y/(1+y) needed a divide per
        # decoded texel = 9.4 ms/frame of VPU division, and sqrt-scale had
        # 0.36% low-end steps that amplified benign fp noise past the
        # sharded-parity tolerance.)
        wluma = sampling.window_pack(y[..., None], 4, 4, dtype=jnp.float16)
        wchroma = sampling.window_pack(
            jnp.stack([co, cg], -1), 2, 2, dtype=jnp.float16
        )

        y_s = sampling.sample_catmull_rom_window_decode(
            wluma, h, w, reproj_uv, 1
        )[..., 0]
        y_s = jnp.maximum(y_s, 0.0)   # Catmull undershoot
        ch = sampling.sample_bilinear_window(wchroma, h, w, reproj_uv, 2)
        co_s, cg_s = ch[..., 0], ch[..., 1]
        prev_color = jnp.stack(
            [y_s + co_s - cg_s, y_s + cg_s, y_s - co_s - cg_s], -1
        )
    else:
        prev_color = sampling.sample_bilinear(history, reproj_uv)
    prev_color = jnp.clip(prev_color, minc, maxc)

    weight_b = blend + velocity_rejection * jnp.linalg.norm(prev_vel - vel, axis=-1)
    offscreen = jnp.any((reproj_uv < 0.0) | (reproj_uv > 1.0), axis=-1)
    weight_b = jnp.where(offscreen, 1.0, weight_b)[..., None]
    weight_a = jnp.where(offscreen[..., None], 0.0, 1.0 - blend)

    return (source * weight_b + prev_color * weight_a) / jnp.maximum(
        weight_b + weight_a, 1e-5
    )
