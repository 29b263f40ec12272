"""3D math helpers (vectors, quaternions, 4x4 matrices).

Replaces the reference's HandmadeMath usage (third_party/HandmadeMath.h, used by
src/utils/camera.h:102-120) with jnp equivalents.  Conventions are pinned to the
reference so that frames are comparable:

* World space is right-handed, Z-up (SunTemple is imported with an axis flip so
  that +Z is up; reference asset_import.cpp:121-126).
* View space is right-handed with **+Y down, +Z forward** — the reference
  compiles with CAMERA_VIEW_SPACE_IS_POSITIVE_Y_DOWN (common.h:6), so
  `clip_from_view` is a LH_ZO perspective (camera.h:110-115): NDC x right,
  y **down** (matches Vulkan), depth in [0, 1] with near→0 / far→1
  (GPU_REVERSE_DEPTH is disabled, gpu_vulkan.c:24-26).
* Matrices are [4,4] row-major arrays applied to column vectors: v' = M @ v.
  Batched points are transformed as pts @ M.T.

All functions are jit-safe (pure jnp, static shapes).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Small vector helpers


def normalize(v, axis=-1, eps=1e-12):
    """Unit-length vector; safe for zero vectors."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def dot(a, b, axis=-1, keepdims=False):
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def reflect(i, n):
    """GLSL reflect: i - 2*dot(n,i)*n (i points toward the surface)."""
    return i - 2.0 * dot(i, n, keepdims=True) * n


def mix(a, b, t):
    return a + (b - a) * t


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def rotate_about_axis(v, n, theta):
    """Rotate v about unit axis n by angle theta (Rodrigues).

    Matches the reference's `Rotate` helper (lighting_pass.glsl:98-101).
    Broadcasts over leading dims; theta may be an array with trailing dim 1.
    """
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    d = dot(v, n, keepdims=True)
    return c * (v - d * n) + s * jnp.cross(n, v) + d * n


# ---------------------------------------------------------------------------
# Quaternions — stored as (x, y, z, w), matching HandmadeMath


def quat_identity():
    return jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)


def quat_from_axis_angle(axis, angle):
    """Right-handed rotation of `angle` radians about unit `axis`."""
    axis = jnp.asarray(axis, jnp.float32)
    half = jnp.asarray(angle, jnp.float32) * 0.5
    xyz = axis * jnp.sin(half)
    return jnp.append(xyz, jnp.cos(half))


def quat_mul(q1, q2):
    """Hamilton product q1*q2 (apply q2's rotation first, then q1's)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def quat_slerp(a, b, t):
    """Spherical lerp used by the reference's lazy camera (camera.h:96)."""
    cos_th = jnp.sum(a * b, axis=-1)
    b = jnp.where(cos_th < 0, -b, b)
    cos_th = jnp.abs(cos_th)
    # Fall back to lerp for nearly-parallel quats.
    theta = jnp.arccos(jnp.clip(cos_th, -1.0, 1.0))
    sin_th = jnp.sin(theta)
    use_lerp = sin_th < 1e-5
    w_a = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_th, 1e-12))
    w_b = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_th, 1e-12))
    return quat_normalize(w_a[..., None] * a + w_b[..., None] * b)


def quat_to_mat4(q):
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy), jnp.zeros_like(x),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx), jnp.zeros_like(x),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy), jnp.zeros_like(x),
            jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros_like(x), jnp.ones_like(x),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (4, 4))


# ---------------------------------------------------------------------------
# 4x4 matrices


def mat4_identity():
    return jnp.eye(4, dtype=jnp.float32)


def translate(v):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(jnp.asarray(v, jnp.float32))


def scale(v):
    v = jnp.asarray(v, jnp.float32)
    return jnp.diag(jnp.concatenate([v, jnp.ones((1,), jnp.float32)]))


def rotate_rh(angle, axis):
    """Rotation matrix about `axis` by `angle` rad (right-handed).

    Mirrors HMM_Rotate_RH as used for the sun orientation
    (render.cpp:966: sun_ori = HMM_Rotate_RH(angle, axis)).
    """
    return quat_to_mat4(quat_from_axis_angle(normalize(jnp.asarray(axis, jnp.float32)), angle))


def perspective_lh_zo(fov_y_rad, aspect_x_over_y, z_near, z_far):
    """Perspective projection with w = +z_view and depth in [0,1].

    Matches HMM_Perspective_LH_ZO (camera.h:112): the true projection for a
    right-handed +Y-down +Z-forward view space.  NDC y is down (Vulkan).
    """
    f = 1.0 / np.tan(fov_y_rad / 2.0)
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = f / aspect_x_over_y
    m[1, 1] = f
    m[2, 2] = z_far / (z_far - z_near)
    m[2, 3] = -z_far * z_near / (z_far - z_near)
    m[3, 2] = 1.0
    return jnp.asarray(m)


def orthographic_rh_zo(left, right, bottom, top, near, far):
    """Orthographic projection, right-handed (camera looks down -z), depth [0,1].

    Matches HMM_Orthographic_RH_ZO as used for the sun shadow matrix
    (render.cpp:969: ortho(-40, 40, -40, 40, -40, 40) @ inv(sun_ori)).
    A view-space point at z = -far maps to depth 1; z = -near maps to 0...
    with near=-40/far=40 the usable depth range spans the [-40, 40] slab.
    """
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 2.0 / (right - left)
    m[1, 1] = 2.0 / (top - bottom)
    m[2, 2] = -1.0 / (far - near)
    m[0, 3] = -(right + left) / (right - left)
    m[1, 3] = -(top + bottom) / (top - bottom)
    m[2, 3] = -near / (far - near)
    m[3, 3] = 1.0
    return jnp.asarray(m)


def look_at(eye, target, up=(0.0, 0.0, 1.0)):
    """view_from_world for the reference's view convention: +X right, +Y DOWN,
    +Z forward (CAMERA_VIEW_SPACE_IS_POSITIVE_Y_DOWN, common.h:6)."""
    eye = jnp.asarray(eye, jnp.float32)
    f = normalize(jnp.asarray(target, jnp.float32) - eye)
    r = normalize(jnp.cross(f, jnp.asarray(up, jnp.float32)))
    d = jnp.cross(f, r)  # world-space "view down"
    rot = jnp.stack([r, d, f])
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(rot)
    return m.at[:3, 3].set(-rot @ eye)


def inverse(m):
    return jnp.linalg.inv(m)


def transform_points(m, pts):
    """Apply a [4,4] matrix to [..., 3] points (w=1). Returns [..., 4]."""
    pts = jnp.asarray(pts)
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    p4 = jnp.concatenate([pts, ones], axis=-1)
    return p4 @ m.T


def transform_dirs(m, dirs):
    """Apply a [4,4] matrix to [..., 3] directions (w=0). Returns [..., 3]."""
    return dirs @ m[:3, :3].T


def project_points(m, pts):
    """Transform [...,3] points and perspective-divide. Returns ([...,3] ndc, w)."""
    clip = transform_points(m, pts)
    w = clip[..., 3:4]
    return clip[..., :3] / w, w[..., 0]
