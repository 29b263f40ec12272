"""Tile binning: exact per-tile triangle lists, built gather-free.

The reference's rasterizer gets binning for free from fixed-function hardware;
on TPU we build it from data-parallel primitives with **static shapes**.  The
performance-critical discovery (see git history): XLA random gathers cost
~13ns/element on v5e, so the classic "expand pairs then gather per-pair
triangle attributes" pipeline is hopeless.  This implementation uses zero
per-pair gathers:

1. per-triangle tile-bbox spans -> pair counts (ntx*nty), exclusive cumsum
2. stream expansion by scatter + cummax forward-fill: each triangle scatters
   a *monotone* packed value at its pair-run start; cummax fills the run.
   Three fills carry (tri id), (run start offset), (ntx | base_tile) — so the
   per-pair tile id is pure dense arithmetic.
3. one i32 sort of (tile << tri_bits) | tri — the low bits both keep the
   per-tile order stable AND recover the triangle id without a gather.
4. per-tile start offsets via a tiny searchsorted (n_tiles+1 queries); the
   packed coefficients are gathered once into PAIR order ([P,16] — the single
   gather of the pipeline); the kernel consumes each tile's segment
   [starts[t], starts[t+1]) directly with chunk-granular blocks and in-kernel
   lo/hi masking of the partial edge chunks.

Packed pair layout [P/chunk, chunk, 16] f32 (triangles on sublanes):
cols 0-8 edge functions, 9-11 depth (vertex-interp (z0,dz1,dz2) when col 15
=1, else screen-linear plane), 12 tri id (f32, exact < 2^24),
13-14 pixel-space bbox y0/y1 for the kernel's row-block culling, 15 pad.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .setup import TriSetup


class TileBins(NamedTuple):
    pair_data: jnp.ndarray   # [Pc/chunk, chunk, 16|13] f32 pair-ordered blocks
    starts: jnp.ndarray      # [T+1] i32 pair-array segment starts per tile
    tiles_x: int
    tiles_y: int
    max_segment: jnp.ndarray  # i32 scalar: longest per-tile pair run (for
                              # tile_capacity overflow detection)
    total_pairs: jnp.ndarray  # i32 scalar: true pair count before clipping
                              # to pair_capacity (scatter drops the excess)
    chunk_minz: jnp.ndarray   # [Pc/chunk] f32: min vertex z over each chunk
                              # block (FAR for all-dead blocks) — the
                              # hierarchical-z bound for the kernel's
                              # early-exit (z_order sorts only)


def pack_tri_data(setup: TriSetup):
    """[N,16] f32 cols as documented above (id/bbox cols filled by caller).

    Invalid triangles get e0 = -1 constant so the coverage test always fails.
    """
    n = setup.adj.shape[0]
    adj = setup.adj  # [N,3,3]; columns j = edge j coefficients
    e = jnp.transpose(adj, (0, 2, 1)).reshape(n, 9)
    dead = jnp.tile(
        jnp.array([0, 0, -1, 0, 0, 1, 0, 0, 1], jnp.float32), (n, 1)
    )
    e = jnp.where(setup.valid[:, None], e, dead)
    z = jnp.where(setup.z_mode[:, None], setup.z_vert, setup.c_z)
    pad = jnp.zeros((n, 4), jnp.float32)
    out = jnp.concatenate([e, z, pad], axis=1)
    out = out.at[:, 13].set(setup.bbox[:, 1].astype(jnp.float32))
    out = out.at[:, 14].set(setup.bbox[:, 3].astype(jnp.float32))
    out = out.at[:, 15].set(setup.z_mode.astype(jnp.float32))
    return out


def pack_tri_data_slim(setup: TriSetup):
    """[N,13] f32: cols 0-8 edges, 9-11 depth, 12 = ±(id+1) with the sign
    carrying z_mode (+ = vertex-interp depth, − = screen-linear plane).

    The slim layout is the round-3 pair-gather diet (VERDICT r2 #1): the
    folded kernel never used the bbox cols, the id is exact in f32 (< 2^24),
    and folding z_mode into its sign drops rows from 64 B to 52 B — wide rows
    fall off the gather-rate cliff (docs/PERF_NOTES.md row-format sweep).
    """
    n = setup.adj.shape[0]
    e = jnp.transpose(setup.adj, (0, 2, 1)).reshape(n, 9)
    dead = jnp.tile(
        jnp.array([0, 0, -1, 0, 0, 1, 0, 0, 1], jnp.float32), (n, 1)
    )
    e = jnp.where(setup.valid[:, None], e, dead)
    z = jnp.where(setup.z_mode[:, None], setup.z_vert, setup.c_z)
    ids1 = jnp.arange(1, n + 1, dtype=jnp.float32)
    enc = jnp.where(setup.z_mode, ids1, -ids1)[:, None]
    return jnp.concatenate([e, z, enc], axis=1)


def _fill(scatter_idx, values, capacity):
    """Scatter `values` (must be monotone over the scatter order) at
    scatter_idx into a length-`capacity` array, then cummax-forward-fill."""
    arr = jnp.full((capacity,), -1, jnp.int32)
    arr = arr.at[scatter_idx].max(values)
    return jax.lax.cummax(arr)


def bin_triangles(
    setup: TriSetup,
    width,
    height,
    tile_h=32,
    tile_w=128,
    pair_capacity=None,
    tile_capacity=4096,
    chunk=128,
    y_origin=0,
    z_order=False,
    fmt="wide16",
) -> TileBins:
    """height counts rows starting at pixel row `y_origin` (sub-viewport
    binning for the row-sharded multi-chip path, parallel/sharding.py).

    z_order=True sorts each tile's pairs front-to-back (by quantized min
    vertex depth, triangle id tie-break) and fills TileBins.chunk_minz — the
    folded kernel then skips chunks once its tile is covered closer than
    anything remaining (hierarchical z)."""
    n = setup.adj.shape[0]
    tiles_x = -(-width // tile_w)
    tiles_y = -(-height // tile_h)
    n_tiles = tiles_x * tiles_y
    if pair_capacity is None:
        pair_capacity = 4 * n
    pair_capacity = -(-pair_capacity // chunk) * chunk

    bbox = setup.bbox
    valid = setup.valid
    by0 = bbox[:, 1] - y_origin
    by1 = bbox[:, 3] - y_origin
    valid = valid & (by1 > 0) & (by0 < height)
    tx0 = jnp.clip(bbox[:, 0] // tile_w, 0, tiles_x - 1)
    ty0 = jnp.clip(by0 // tile_h, 0, tiles_y - 1)
    tx1 = jnp.clip((bbox[:, 2] - 1) // tile_w, 0, tiles_x - 1)
    ty1 = jnp.clip((by1 - 1) // tile_h, 0, tiles_y - 1)
    ntx = jnp.where(valid, tx1 - tx0 + 1, 0).astype(jnp.int32)
    nty = jnp.where(valid, ty1 - ty0 + 1, 0).astype(jnp.int32)
    counts = ntx * nty
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]

    tri_ids32 = jnp.arange(n, dtype=jnp.int32)
    scatter_idx = jnp.where(counts > 0, offsets, pair_capacity)  # OOB drops
    base_tile = (ty0 * tiles_x + tx0).astype(jnp.int32)

    tile_bits = max(1, int(n_tiles).bit_length())  # holds values <= n_tiles
    span_bits = 8
    # ntx is clamped to span_max below, so a screen wider than 255 tiles
    # would silently drop the rightmost tile columns of full-width triangles
    # (ADVICE r2): fail loudly instead.  255 tiles = 8160px at 32px tiles.
    assert tiles_x <= (1 << span_bits) - 1, (
        f"screen {width}px = {tiles_x} tile columns exceeds the {span_bits}-bit "
        "binning span; raise span_bits in binning.py"
    )
    tri_bits = max(1, int(n - 1).bit_length())
    half_bits = (tile_bits + 1) // 2
    # packed fill values must stay positive int32 (tri in the high bits keeps
    # them monotone over the scatter order)
    assert (n << max(span_bits, half_bits)) <= (1 << 31) and n < (
        1 << 24
    ), "triangle count too large for packed binning keys"
    assert pair_capacity < (1 << (31 - span_bits)), (
        "pair_capacity too large for the packed (run_start | ntx) fill"
    )

    # Monotone forward-fills — 2 scatter+cummax passes in the common case
    # (round-3; each pass cost ~4.7 ms at 638k tris, so fills are worth
    # packing to the int32 bit limit):
    #   * (run_start | ntx): run_start strictly increases between runs (every
    #     run has >= 1 pair), so the packed value stays monotone over the
    #     scatter order with ntx in the low bits — one fill carries both
    #   * (tri | base_tile): tri id rides the high bits — ALSO recovered from
    #     here (>> tile_bits), so no dedicated tri fill; when
    #     tri_bits+tile_bits exceeds int31 (e.g. the 4096-tile sun map at
    #     >512k tris) base_tile splits into two half-width fills and tri
    #     rides the first
    span_max = (1 << span_bits) - 1
    rs_packed = jnp.maximum(
        _fill(
            scatter_idx, (offsets << span_bits) | jnp.minimum(ntx, span_max),
            pair_capacity,
        ),
        0,
    )
    run_start = rs_packed >> span_bits
    ntx_fill = rs_packed & span_max
    if tri_bits + tile_bits <= 31:
        base_packed = _fill(
            scatter_idx, (tri_ids32 << tile_bits) | base_tile, pair_capacity
        )
        base_fill = base_packed & ((1 << tile_bits) - 1)
        tri_of = jnp.clip(base_packed >> tile_bits, 0, n - 1)
    else:
        half_max = (1 << half_bits) - 1
        lo_packed = _fill(
            scatter_idx, (tri_ids32 << half_bits) | (base_tile & half_max),
            pair_capacity,
        )
        base_lo = lo_packed & half_max
        tri_of = jnp.clip(lo_packed >> half_bits, 0, n - 1)
        base_hi = _fill(
            scatter_idx, (tri_ids32 << half_bits) | (base_tile >> half_bits),
            pair_capacity,
        ) & half_max
        base_fill = (base_hi << half_bits) | base_lo

    p = jnp.arange(pair_capacity, dtype=jnp.int32)
    in_range = p < total
    m = p - run_start
    ntx_p = jnp.maximum(ntx_fill, 1)
    tile = base_fill + (m // ntx_p) * tiles_x + (m % ntx_p)
    tile = jnp.where(in_range, tile, n_tiles)  # overflow/invalid sorts last

    # sort pairs by (tile, tri) — or (tile, z, tri) for hierarchical-z — the
    # low key bits recover the triangle id gather-free.  One packed key when
    # the bits fit (~2x cheaper than the two-key lexicographic sort).
    if z_order:
        # front-to-back within each tile: quantized min vertex depth in the
        # second key's high bits (floor-quantized, so zq/K is a conservative
        # lower bound — exactly what the kernel's skip test needs).  zq rides
        # a 4th monotone fill (tri in the high bits), NOT a per-pair gather.
        zq_bits = min(12, 30 - tri_bits)
        zq_max = (1 << zq_bits) - 1
        zv = setup.z_vert
        minz = zv[:, 0] + jnp.minimum(
            0.0, jnp.minimum(zv[:, 1], jnp.minimum(zv[:, 2], zv[:, 1] + zv[:, 2]))
        )
        # conservative 0 for plane-depth (w<=0) triangles; clamp to [0,1]
        minz = jnp.where(setup.z_mode, jnp.clip(minz, 0.0, 1.0), 0.0)
        zq_tri = jnp.minimum((minz * zq_max).astype(jnp.int32), zq_max)
        zq_fill = _fill(
            scatter_idx, (tri_ids32 << zq_bits) | zq_tri, pair_capacity
        ) & zq_max
        key2 = (zq_fill << tri_bits) | tri_of
        sort_tile, k2 = jax.lax.sort((tile, key2), num_keys=2)
        sort_tri = k2 & ((1 << tri_bits) - 1)
        zq_sorted = (k2 >> tri_bits).astype(jnp.float32) * (1.0 / zq_max)
        chunk_minz = zq_sorted.reshape(pair_capacity // chunk, chunk).min(axis=1)
    elif tile_bits + tri_bits <= 31:
        key = (tile << tri_bits) | tri_of
        skey = jax.lax.sort(key)
        sort_tile = skey >> tri_bits
        sort_tri = skey & ((1 << tri_bits) - 1)
        chunk_minz = jnp.zeros((pair_capacity // chunk,), jnp.float32)
    else:
        sort_tile, sort_tri = jax.lax.sort((tile, tri_of), num_keys=2)
        chunk_minz = jnp.zeros((pair_capacity // chunk,), jnp.float32)

    # per-tile segment starts into the sorted pair array
    tile_range = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(sort_tile, tile_range, side="left").astype(jnp.int32)

    # pair-ordered packed data — the single gather of the pipeline (P rows,
    # independent of per-tile capacity).  'slim13' (52 B rows) is the folded
    # kernel's diet; 'wide16' keeps the v1 rowblock layout with bbox cols.
    pair_valid = p < total
    if fmt == "slim13":
        packed = pack_tri_data_slim(setup)              # [N,13]
        data = packed[sort_tri]                         # [P,13]
        # dead rows: e0 const -1 kills coverage; enc 0 decodes to id -1
        dead = jnp.zeros((13,), jnp.float32).at[2].set(-1.0)
        data = jnp.where(pair_valid[:, None], data, dead)
        pair_data = data.reshape(pair_capacity // chunk, chunk, 13)
    else:
        packed = pack_tri_data(setup)                   # [N,16]
        data = packed[sort_tri]                         # [P,16]
        dead = jnp.zeros((16,), jnp.float32).at[2].set(-1.0)
        data = jnp.where(pair_valid[:, None], data, dead)
        data = data.at[:, 12].set(
            jnp.where(pair_valid, sort_tri, -1).astype(jnp.float32)
        )
        pair_data = data.reshape(pair_capacity // chunk, chunk, 16)
    return TileBins(
        pair_data=pair_data,
        starts=starts,
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        max_segment=jnp.max(starts[1:] - starts[:-1]),
        total_pairs=total,
        chunk_minz=chunk_minz,
    )
