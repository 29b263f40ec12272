"""Pallas tile rasterizer — the TPU replacement for fixed-function raster.

Consumes the per-tile triangle bins from binning.py and produces the
visibility buffer (nearest depth + triangle id per pixel), the same contract
as xla_raster.rasterize_vis but tiled: each grid step rasterizes one chunk of
triangles against one (tile_h x tile_w) pixel tile held in VMEM.

Kernel anatomy (per grid step (ty, tx, c)):
* tri_data block [chunk, 16] lives in SMEM; per-triangle scalar coefficients
  drive dense vector math (the classic scalar*vector VPU broadcast form —
  sublane-vector -> plane broadcasts lower terribly in Mosaic, see history).
* at c == 0 the tile's depth/id buffers initialize to (FAR, -1).
* per triangle, only the [block_h, tile_w] row blocks its pixel bbox touches
  are evaluated (cols 13/14 carry the bbox), via a dynamic inner fori +
  dynamic-offset read-modify-write of the tile refs — typical triangles
  touch 1-2 of the tile's row blocks, cutting VPU work ~2-4x.
* depth test: strict less-than, first-processed wins ties; per-tile ids are
  sorted ascending, matching xla_raster's argmin semantics.  (Boundary pixels
  can still differ from the XLA path by one ULP of edge evaluation — TPU and
  XLA schedule the FMAs differently; tests allow a small mismatch budget on
  real hardware.)

Runs in interpret mode off-TPU so the CPU test suite exercises it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..gpu import device
from .binning import bin_triangles
from .setup import TriSetup

FAR = 3.4e38  # python float: jnp scalars would be captured tracers in the kernel


def _vis_kernel(starts_ref, data_ref, depth_ref, id_ref, *, tile_h, tile_w,
                chunk, block_h, y_origin, n_pair_blocks):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    c = pl.program_id(2)
    n_blocks = tile_h // block_h

    @pl.when(c == 0)
    def _():
        depth_ref[:] = jnp.full((tile_h, tile_w), FAR, jnp.float32)
        id_ref[:] = jnp.full((tile_h, tile_w), -1.0, jnp.float32)

    tile_idx = ty * pl.num_programs(1) + tx
    start = starts_ref[tile_idx]
    end = starts_ref[tile_idx + 1]
    # my block's absolute pair range (must mirror the in_spec index_map clamp)
    blk = jnp.minimum(start // chunk + c, n_pair_blocks - 1)
    blk_base = blk * chunk
    lo = jnp.maximum(start - blk_base, 0)
    hi = jnp.clip(end - blk_base, 0, chunk)

    @pl.when(hi > lo)
    def _():
        x0 = (tx * tile_w).astype(jnp.float32)
        y0f = (ty * tile_h).astype(jnp.float32) + y_origin
        px = x0 + 0.5 + jax.lax.broadcasted_iota(
            jnp.int32, (block_h, tile_w), 1
        ).astype(jnp.float32)
        py_base = 0.5 + jax.lax.broadcasted_iota(
            jnp.int32, (block_h, tile_w), 0
        ).astype(jnp.float32)

        def tri_body(t, _):
            ax0 = data_ref[0, t, 0]
            ay0 = data_ref[0, t, 1]
            ac0 = data_ref[0, t, 2]
            ax1 = data_ref[0, t, 3]
            ay1 = data_ref[0, t, 4]
            ac1 = data_ref[0, t, 5]
            ax2 = data_ref[0, t, 6]
            ay2 = data_ref[0, t, 7]
            ac2 = data_ref[0, t, 8]
            zx = data_ref[0, t, 9]
            zy = data_ref[0, t, 10]
            zc = data_ref[0, t, 11]
            idf = data_ref[0, t, 12]
            by0 = data_ref[0, t, 13]
            by1 = data_ref[0, t, 14]
            zvmode = data_ref[0, t, 15]

            rb0 = jnp.maximum(
                jnp.floor((by0 - y0f) / block_h).astype(jnp.int32), 0
            )
            rb1 = jnp.minimum(
                jnp.floor((by1 - 1.0 - y0f) / block_h).astype(jnp.int32),
                n_blocks - 1,
            )

            def rb_body(rb, _):
                ybase = y0f + (rb * block_h).astype(jnp.float32)
                py = py_base + ybase
                e0 = ax0 * px + ay0 * py + ac0
                e1 = ax1 * px + ay1 * py + ac1
                e2 = ax2 * px + ay2 * py + ac2
                esum = e0 + e1 + e2
                # depth: vertex-interp (cols = z0,dz1,dz2) when zvmode, else
                # the screen-linear plane (near-plane-crossing tris); phrased
                # as the rational N/D with a pre-division range test to stay
                # bitwise-identical to xla_raster.rasterize_vis
                n_hp = zx * esum + (e1 * zy + e2 * zc)
                z_pl = zx * px + zy * py + zc
                vert = zvmode > 0.5
                n_sel = jnp.where(vert, n_hp, z_pl)
                d_sel = jnp.where(vert, esum, 1.0)
                cov = (
                    (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                    & (esum > 0.0) & (n_sel >= 0.0) & (n_sel <= d_sel)
                )
                z = n_sel / jnp.where(d_sel == 0.0, 1e-20, d_sel)
                sl = pl.ds(rb * block_h, block_h)
                bz = depth_ref[sl, :]
                take = cov & (z < bz)
                depth_ref[sl, :] = jnp.where(take, z, bz)
                id_ref[sl, :] = jnp.where(take, idf, id_ref[sl, :])
                return 0

            jax.lax.fori_loop(rb0, rb1 + 1, rb_body, 0)
            return 0

        jax.lax.fori_loop(lo, hi, tri_body, 0)


def rasterize_vis_tiled(
    setup: TriSetup,
    width,
    height,
    tile_h=32,
    tile_w=128,
    tile_capacity=4096,
    chunk=128,
    block_h=8,
    pair_capacity=None,
    interpret=None,
    y_origin=0,
    return_overflow=False,
):
    """Tiled rasterization of rows [y_origin, y_origin+height).
    Returns (depth [H,W] — +inf empty, tri_id [H,W]).

    With return_overflow=True also returns an i32[2] vector
    [max_tile_segment, total_pairs]: if max_tile_segment > tile_capacity or
    total_pairs > pair_capacity, triangles were silently dropped this frame
    (the kernel processes tile_capacity//chunk chunks per tile and binning's
    scatter drops out-of-bounds pairs) — the host must re-render with larger
    capacities.  See ADVICE.md round-1 (high)."""
    if interpret is None:
        interpret = device.pallas_interpret()
    bins = bin_triangles(
        setup, width, height, tile_h, tile_w, pair_capacity, tile_capacity, chunk,
        y_origin=y_origin,
    )
    ty, tx = bins.tiles_y, bins.tiles_x
    n_chunks = tile_capacity // chunk
    n_pair_blocks = bins.pair_data.shape[0]

    kernel = functools.partial(
        _vis_kernel, tile_h=tile_h, tile_w=tile_w, chunk=chunk, block_h=block_h,
        y_origin=float(y_origin), n_pair_blocks=n_pair_blocks,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ty, tx, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, chunk, 16),
                # fetch my tile-segment's c-th pair block; the clamp keeps the
                # index repeated (fetch skipped) once the segment is exhausted
                lambda i, j, c, starts: (
                    jnp.minimum(
                        starts[i * tx + j] // chunk + c, n_pair_blocks - 1
                    ),
                    0,
                    0,
                ),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, c, starts: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, c, starts: (i, j),
                         memory_space=pltpu.VMEM),
        ],
    )
    depth, trif = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ty * tile_h, tx * tile_w), jnp.float32),
            jax.ShapeDtypeStruct((ty * tile_h, tx * tile_w), jnp.float32),
        ],
        interpret=interpret,
    )(bins.starts, bins.pair_data)
    depth = jnp.where(depth >= FAR, jnp.inf, depth)
    tri = trif.astype(jnp.int32)
    if return_overflow:
        ovf = jnp.stack([bins.max_segment, bins.total_pairs])
        return depth[:height, :width], tri[:height, :width], ovf
    return depth[:height, :width], tri[:height, :width]
