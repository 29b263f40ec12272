"""Triangle setup for 2D-homogeneous rasterization.

Replaces the fixed-function vertex-processing + primitive-assembly stage that
the reference gets for free from Vulkan (GPU_MakePipelineEx vertex inputs,
gpu_vulkan.c:1744-1764; culling :1799-1804).  We use Olano-Greer 2D homogeneous
rasterization: edge functions and screen-linear interpolation coefficients are
derived from the adjugate of the 3x3 matrix of clip-space (x_px*w, y_px*w, w)
rows — this needs **no near-plane clipping** (triangles crossing w=0 rasterize
correctly), which keeps triangle counts static, exactly what XLA wants.

Conventions:
* clip space: x,y in [-w,w] with y down (Vulkan), z in [0,w], w = +view z.
* pixel space: x right in [0,W], y down in [0,H]; pixel centers at +0.5.
* A pixel p=(px+.5, py+.5, 1) is inside a front-facing triangle iff all three
  edge values e_j = (adj(M) column j) . p are >= 0 (det>0 orientation).
* For attribute vector a over the 3 verts, (a/w-interpolated)(p) =
  (adj@a . p) / (adj@ones . p) — perspective-correct, screen-linear numerators.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class TriSetup(NamedTuple):
    """Per-triangle rasterization data (all [N, ...])."""

    adj: jnp.ndarray      # [N,3,3] adjugate of homogeneous screen matrix; columns j = edge j coeffs
    c_w: jnp.ndarray      # [N,3]   coefficients of 1/w-interp numerator (= adj @ ones)
    c_z: jnp.ndarray      # [N,3]   screen-linear depth plane (fallback for w<=0 tris)
    z_vert: jnp.ndarray   # [N,3]   (z0_ndc, z1-z0, z2-z0): high-precision depth via
                          #         z = z0 + (e1*dz1 + e2*dz2)/sum(e) — the plane form
                          #         loses ~11 bits to coefficient cancellation, which at
                          #         z_near=0.02/z_far=1e4 is tens of world units
    z_mode: jnp.ndarray   # [N]     bool: True = use z_vert (all w healthy)
    det: jnp.ndarray      # [N]     signed 2x area (homogeneous)
    bbox: jnp.ndarray     # [N,4]   pixel bbox (x0, y0, x1, y1) inclusive-exclusive, clipped to screen
    valid: jnp.ndarray    # [N]     bool: rasterize this triangle


def _adjugate3(m):
    """Adjugate of [...,3,3] (transpose of cofactor matrix): adj @ m = det * I."""
    a = m
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    return jnp.stack(
        [
            jnp.stack([c00, c10, c20], -1),
            jnp.stack([c01, c11, c21], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        axis=-2,
    )


def setup_triangles(clip, width, height, cull="back", guard_band=8192.0):
    """Compute TriSetup from clip-space triangle vertices.

    clip: [N,3,4] (x,y,z,w) per triangle vertex.
    cull: 'back' (default — keep camera-facing det<0 tris), 'front', or 'none'
      (keep both; back faces are orientation-flipped so edge tests still work).
    Returns TriSetup with edge/interp coefficients in *pixel* space.
    """
    n = clip.shape[0]
    x, y, z, w = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    # homogeneous pixel coords: X = (x/w*0.5+0.5)*W * w = (0.5x + 0.5w)*W
    xh = (0.5 * x + 0.5 * w) * width
    yh = (0.5 * y + 0.5 * w) * height
    m = jnp.stack([xh, yh, w], axis=-1)  # [N,3,3] rows = vertices

    adj = _adjugate3(m)
    det = (
        m[..., 0, 0] * adj[..., 0, 0]
        + m[..., 0, 1] * adj[..., 1, 0]
        + m[..., 0, 2] * adj[..., 2, 0]
    )

    # Orientation: with y-down pixel coords, triangles wound to face the
    # camera (outward-facing surfaces from our asset pipeline / glTF after the
    # axis flip) produce det < 0.  "front" = det < 0.
    if cull == "back":
        valid = det < 0.0
        flip = -jnp.ones_like(det)
    elif cull == "front":
        valid = det > 0.0
        flip = jnp.ones_like(det)
    elif cull == "none":
        valid = det != 0.0
        flip = jnp.sign(det)
    else:
        raise ValueError(f"bad cull mode {cull!r}")
    adj = adj * flip[..., None, None]

    c_w = jnp.sum(adj, axis=-1)                      # adj @ ones -> 1/w numerator
    # Depth plane: z_ndc(p) = (adj@z_clip . p) / |det|  — screen-linear, so we
    # fold the 1/|det| in here and the per-pixel eval is a single dot product.
    abs_det = flip * det
    c_z = jnp.einsum("nij,nj->ni", adj, z) / jnp.where(abs_det == 0, 1.0, abs_det)[..., None]

    # High-precision depth: per-vertex z_ndc + deltas (see TriSetup docstring).
    eps_w = 1e-6
    safe_w = jnp.where(jnp.abs(w) < eps_w, eps_w, w)
    zv = z / safe_w
    z_vert = jnp.stack([zv[:, 0], zv[:, 1] - zv[:, 0], zv[:, 2] - zv[:, 0]], -1)
    z_mode = jnp.all(w > eps_w, axis=-1)

    # Screen bbox.  For all-front triangles: project and bound.  For
    # near-plane-crossing triangles (some w <= eps): the visible region is the
    # convex hull of the front vertices' projections plus the directions at
    # infinity where the triangle crosses w = eps; the bbox extends to the
    # screen border along each sign of those crossing directions (component-
    # wise over the min/max of the crossing xy — covers every intermediate
    # direction of the crossing segment by linearity).  Round 3: the previous
    # full-screen fallback cost ~2000 binning pairs PER crossing triangle
    # whenever the camera hugged a wall or floor.
    eps = 1e-6
    all_front = jnp.all(w > eps, axis=-1)
    front = w > eps                                   # [N,3]
    pxv = xh / jnp.maximum(w, eps)
    pyv = yh / jnp.maximum(w, eps)
    big = 1e9
    px_min = jnp.min(jnp.where(front, pxv, big), -1)
    px_max = jnp.max(jnp.where(front, pxv, -big), -1)
    py_min = jnp.min(jnp.where(front, pyv, big), -1)
    py_max = jnp.max(jnp.where(front, pyv, -big), -1)
    # w=eps crossings of the 3 edges, in homogeneous xy (the direction)
    ext_xp = jnp.zeros(all_front.shape, bool)
    ext_xn = jnp.zeros(all_front.shape, bool)
    ext_yp = jnp.zeros(all_front.shape, bool)
    ext_yn = jnp.zeros(all_front.shape, bool)
    for i in range(3):
        j = (i + 1) % 3
        wi, wj = w[..., i], w[..., j]
        cross = front[..., i] != front[..., j]
        denom = jnp.where(jnp.abs(wj - wi) < 1e-30, 1e-30, wj - wi)
        t = (eps - wi) / denom
        dx = xh[..., i] + t * (xh[..., j] - xh[..., i])
        dy = yh[..., i] + t * (yh[..., j] - yh[..., i])
        # >=/<= : a crossing direction of exactly 0 extends both ways (free
        # insurance against sign flips between the w=eps and w=0 crossings)
        ext_xp |= cross & (dx >= 0)
        ext_xn |= cross & (dx <= 0)
        ext_yp |= cross & (dy >= 0)
        ext_yn |= cross & (dy <= 0)
    px_min = jnp.where(ext_xn, -big, px_min)
    px_max = jnp.where(ext_xp, big, px_max)
    py_min = jnp.where(ext_yn, -big, py_min)
    py_max = jnp.where(ext_yp, big, py_max)
    x0 = jnp.clip(jnp.floor(px_min), 0, width).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(py_min), 0, height).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(px_max) + 1, 0, width).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(py_max) + 1, 0, height).astype(jnp.int32)
    bbox = jnp.stack([x0, y0, x1, y1], -1)
    # cull fully-behind triangles and zero-area bboxes
    any_front = jnp.any(w > eps, axis=-1)
    nonempty = (bbox[..., 2] > bbox[..., 0]) & (bbox[..., 3] > bbox[..., 1])
    valid = valid & any_front & nonempty
    return TriSetup(adj=adj, c_w=c_w, c_z=c_z, z_vert=z_vert, z_mode=z_mode,
                    det=det, bbox=bbox, valid=valid)


def transform_to_clip(positions, mat, jitter=None):
    """World [N,3] -> clip [N,4] via mat [4,4]; optional TAA jitter in NDC
    (added in clip space scaled by w, geometry_pass.glsl:109-113)."""
    ones = jnp.ones(positions.shape[:-1] + (1,), positions.dtype)
    clip = jnp.concatenate([positions, ones], -1) @ mat.T
    if jitter is not None:
        clip = clip.at[..., :2].add(jitter * clip[..., 3:4])
    return clip


def edge_at(setup: TriSetup, tri_idx, px, py):
    """Evaluate edge values + interpolation denominators at pixel centers.

    tri_idx [...], px/py [...] pixel integer coords -> (e [...,3], w_num [...], z [...]).
    """
    p = jnp.stack([px + 0.5, py + 0.5, jnp.ones_like(px, jnp.float32)], -1)
    adj = setup.adj[tri_idx]                 # [...,3,3]
    e = jnp.einsum("...ij,...i->...j", adj, p)
    w_num = jnp.einsum("...i,...i->...", setup.c_w[tri_idx], p)
    z = jnp.einsum("...i,...i->...", setup.c_z[tri_idx], p)
    return e, w_num, z


def barycentrics_at(setup: TriSetup, tri_idx, px, py):
    """Perspective-correct barycentrics (l0,l1,l2) at pixel centers."""
    e, w_num, _ = edge_at(setup, tri_idx, px, py)
    return e / jnp.where(w_num[..., None] == 0, 1e-20, w_num[..., None])
