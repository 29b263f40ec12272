"""Pallas tile rasterizer — the TPU replacement for fixed-function raster.

Consumes the per-tile triangle bins from binning.py and produces the
visibility buffer (nearest depth + triangle id per pixel), the same contract
as xla_raster.rasterize_vis but tiled: each grid step rasterizes one
chunk of triangles against one (tile_h x tile_w) pixel tile held in VMEM.

Kernel anatomy (per grid step (ty, tx, c)):
* tri_data block [chunk, 16]: triangles on sublanes — cols 0-8 = edge
  functions e0/e1/e2 as (ax, ay, const), 9-11 = screen-linear depth plane,
  12 = global triangle id stored as f32 (exact below 2^24).
* at c == 0 the tile's depth/id buffers initialize to (FAR, -1).
* triangles are processed in static groups of `group`: each group broadcasts
  its coefficient columns [group,1,1] against the tile's pixel planes
  [tile_h, tile_w], producing [group, th, tw] edge/depth values — pure dense
  VPU work with no transposes and no dynamic indexing (Mosaic-friendly).
  Depth-test reduction: min over the group axis, id resolved by a tie-min
  (equal-depth ties pick the smallest id, which equals first-submitted order
  because per-tile ids are sorted ascending — matching xla_raster's argmin).
* chunks beyond the tile's bin count are skipped with pl.when.

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
BIG_ID = 3.0e38


def _vis_kernel(counts_ref, data_ref, depth_ref, id_ref, *, tile_h, tile_w,
                chunk, group):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        depth_ref[:] = jnp.full((tile_h, tile_w), FAR, jnp.float32)
        id_ref[:] = jnp.full((tile_h, tile_w), -1.0, jnp.float32)

    tile_idx = ty * pl.num_programs(1) + tx
    count = counts_ref[tile_idx]
    n_tris = count - c * chunk  # triangles remaining in this chunk

    @pl.when(n_tris > 0)
    def _():
        x0 = (tx * tile_w).astype(jnp.float32)
        y0 = (ty * tile_h).astype(jnp.float32)
        px = x0 + 0.5 + jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w), 1
        ).astype(jnp.float32)
        py = y0 + 0.5 + jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w), 0
        ).astype(jnp.float32)

        # Per-triangle scalar coefficients from SMEM drive dense [th, tw]
        # vector math — the classic scalar*vector form the VPU broadcasts well.
        def tri_body(t, carry):
            bz, bid = carry
            e0 = data_ref[0, 0, t, 0] * px + data_ref[0, 0, t, 1] * py + data_ref[0, 0, t, 2]
            e1 = data_ref[0, 0, t, 3] * px + data_ref[0, 0, t, 4] * py + data_ref[0, 0, t, 5]
            e2 = data_ref[0, 0, t, 6] * px + data_ref[0, 0, t, 7] * py + data_ref[0, 0, t, 8]
            z = data_ref[0, 0, t, 9] * px + data_ref[0, 0, t, 10] * py + data_ref[0, 0, t, 11]
            cov = (
                (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & ((e0 + e1 + e2) > 0.0)
                & (z >= 0.0) & (z <= 1.0)
            )
            take = cov & (z < bz)
            bz = jnp.where(take, z, bz)
            bid = jnp.where(take, data_ref[0, 0, t, 12], bid)
            return bz, bid

        n = jnp.minimum(n_tris, chunk)
        best_z, best_id = jax.lax.fori_loop(
            0, n, tri_body, (depth_ref[:], id_ref[:])
        )
        depth_ref[:] = best_z
        id_ref[:] = best_id


def rasterize_vis_tiled(
    setup: TriSetup,
    width,
    height,
    tile_h=32,
    tile_w=128,
    tile_capacity=4096,
    chunk=128,
    group=32,
    pair_capacity=None,
    interpret=None,
):
    """Tiled rasterization. Returns (depth [H,W] — +inf empty, tri_id [H,W])."""
    if interpret is None:
        interpret = device.pallas_interpret()
    bins = bin_triangles(
        setup, width, height, tile_h, tile_w, pair_capacity, tile_capacity, chunk
    )
    ty, tx = bins.tiles_y, bins.tiles_x
    n_chunks = tile_capacity // chunk

    kernel = functools.partial(
        _vis_kernel, tile_h=tile_h, tile_w=tile_w, chunk=chunk, group=group
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ty, tx, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, chunk, 16),
                lambda i, j, c, counts: (i * tx + j, c, 0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j, c, counts: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, c, counts: (i, j),
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
    )(bins.counts, bins.tri_data)
    depth = jnp.where(depth >= FAR, jnp.inf, depth)
    tri = trif.astype(jnp.int32)
    return depth[:height, :width], tri[:height, :width]
