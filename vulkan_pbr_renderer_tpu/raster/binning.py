"""Tile binning: exact per-tile triangle lists, built with XLA sort.

The reference's rasterizer gets binning for free from fixed-function hardware;
on TPU we build it from data-parallel primitives with **static shapes**:

1. per-triangle tile-bbox spans -> pair counts (ntx*nty)
2. exclusive cumsum + searchsorted expands triangles into (tile, tri) pairs
   inside a fixed capacity buffer (the classic scan-based stream expansion)
3. a stable sort by tile id groups pairs per tile
4. per-tile start offsets via searchsorted; a gather builds the [T, cap]
   triangle-slot table and the packed per-slot coefficient blocks the Pallas
   kernel consumes ([T, chunks, 16, chunk] — coefficients on sublanes,
   triangles on lanes).

Everything is jit-safe; capacities are config constants.  Overflowing
triangles (beyond pair_capacity or per-tile cap) are dropped — pick
capacities from the scene budget.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .setup import TriSetup


class TileBins(NamedTuple):
    tri_data: jnp.ndarray    # [T, n_chunks, chunk, 16] f32: tris on sublanes;
                             # cols 0-8 edges, 9-11 depth plane, 12 tri id (f32)
    tri_ids: jnp.ndarray     # [T, cap] i32 global tri ids (-1 = empty slot)
    counts: jnp.ndarray      # [T] i32 triangles binned per tile (<= cap)
    tiles_x: int
    tiles_y: int


def pack_tri_data(setup: TriSetup):
    """[N,16] f32 cols: e0(ax,ay,ac) e1(...) e2(...) z(cx,cy,cc) pad4.

    Invalid triangles get e0 = -1 constant so the coverage test always fails.
    """
    n = setup.adj.shape[0]
    adj = setup.adj  # [N,3,3]; columns j = edge j coefficients
    # edge j coefficient vector = adj[:, :, j] (x, y, const)
    e = jnp.transpose(adj, (0, 2, 1)).reshape(n, 9)  # [N, (e0x,e0y,e0c,e1x,...)]
    dead = jnp.tile(
        jnp.array([0, 0, -1, 0, 0, 1, 0, 0, 1], jnp.float32), (n, 1)
    )
    e = jnp.where(setup.valid[:, None], e, dead)
    z = setup.c_z
    pad = jnp.zeros((n, 4), jnp.float32)
    return jnp.concatenate([e, z, pad], axis=1)


def bin_triangles(
    setup: TriSetup,
    width,
    height,
    tile_h=32,
    tile_w=128,
    pair_capacity=None,
    tile_capacity=4096,
    chunk=128,
) -> TileBins:
    n = setup.adj.shape[0]
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    n_tiles = tiles_x * tiles_y
    if pair_capacity is None:
        pair_capacity = 4 * n

    bbox = setup.bbox
    valid = setup.valid
    tx0 = jnp.clip(bbox[:, 0] // tile_w, 0, tiles_x - 1)
    ty0 = jnp.clip(bbox[:, 1] // tile_h, 0, tiles_y - 1)
    tx1 = jnp.clip((bbox[:, 2] - 1) // tile_w, 0, tiles_x - 1)
    ty1 = jnp.clip((bbox[:, 3] - 1) // tile_h, 0, tiles_y - 1)
    ntx = jnp.where(valid, tx1 - tx0 + 1, 0)
    nty = jnp.where(valid, ty1 - ty0 + 1, 0)
    counts = (ntx * nty).astype(jnp.int32)

    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]

    # Stream expansion without searchsorted (XLA's is O(P log N) gathers and
    # dominates the frame): scatter each triangle's id at its start offset,
    # then a forward-fill cummax assigns every pair slot its triangle.
    p = jnp.arange(pair_capacity, dtype=jnp.int32)
    starts_arr = jnp.full((pair_capacity,), -1, jnp.int32)
    scatter_idx = jnp.where(counts > 0, offsets, pair_capacity)  # OOB drops
    starts_arr = starts_arr.at[scatter_idx].max(jnp.arange(n, dtype=jnp.int32))
    tri_of = jnp.clip(jax.lax.cummax(starts_arr), 0, n - 1)
    in_range = p < total
    m = p - offsets[tri_of]
    mx = m % jnp.maximum(ntx[tri_of], 1)
    my = m // jnp.maximum(ntx[tri_of], 1)
    tile = (ty0[tri_of] + my) * tiles_x + (tx0[tri_of] + mx)
    tile = jnp.where(in_range, tile, n_tiles)  # overflow/invalid sorts last

    # Single-key sort: (tile << shift) | pair index.  The pair index keeps the
    # within-tile order stable (pairs are generated in triangle order), and is
    # recovered by masking — one i32 sort is ~2x cheaper than sort_key_val.
    shift = max(1, (pair_capacity - 1).bit_length())
    assert (n_tiles + 1) < (1 << (31 - shift)), "pair_capacity too large to pack sort key"
    key = (tile << shift) | p
    skey = jax.lax.sort(key)
    sort_tile = skey >> shift
    sort_tri = tri_of[skey & ((1 << shift) - 1)]

    # per-tile [start, count]
    tile_range = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sort_tile, tile_range, side="left").astype(jnp.int32)
    tile_counts = jnp.minimum(starts[1:] - starts[:-1], tile_capacity)

    # slot table [T, cap]
    cap = tile_capacity
    slot = starts[:-1, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
    slot_valid = jnp.arange(cap, dtype=jnp.int32)[None, :] < tile_counts[:, None]
    slot = jnp.clip(slot, 0, pair_capacity - 1)
    tri_table = jnp.where(slot_valid, sort_tri[slot], -1)  # [T, cap]

    # gather packed per-slot data; dead rows for empty slots
    packed = pack_tri_data(setup)                       # [N,16]
    dead = jnp.zeros((16,), jnp.float32).at[2].set(-1.0)
    data = jnp.where(
        slot_valid[..., None], packed[jnp.maximum(tri_table, 0)], dead
    )                                                   # [T, cap, 16]
    # column 12 carries the global tri id as f32 (ids < 2^24 are exact)
    data = data.at[..., 12].set(tri_table.astype(jnp.float32))

    n_chunks = cap // chunk
    tri_data = data.reshape(n_tiles, n_chunks, chunk, 16)
    tri_ids = tri_table
    return TileBins(
        tri_data=tri_data,
        tri_ids=tri_ids,
        counts=tile_counts,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
    )
