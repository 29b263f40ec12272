"""Folded-tile Pallas rasterizer (v2) — the round-2 redesign, round-3 diet.

The v1 kernel (visibility.py) loops triangles in SCALAR code: ~16 SMEM loads
plus row-block loop management per (triangle, tile) pair, measured ~137
cycles/pair (146 ms at 638k tris, docs/PERF_NOTES.md).  This kernel removes
the scalar loop entirely — the design evaluated as "most promising" in the
round-1 notes (PERF_NOTES "Rasterizer roadmap" #2), plus a restructured grid:

* A tile is 32x32 pixels **folded** into the lane axis: plane column
  p = y_in_tile*32 + x_in_tile, so one [chunk, 1024] vector op evaluates a
  whole chunk of triangles against the whole tile.  Per-triangle coefficients
  live in VMEM as [chunk, 1] columns and broadcast along LANES (the cheap
  direction; sublane broadcasts are the slow one — CLAUDE.md).
* The grid is one step per tile (not per tile*max-chunks): each step walks
  exactly ceil(segment/chunk) chunks of its own pair segment with
  double-buffered async DMA from HBM — empty tiles cost one grid step, and
  there is NO tile_capacity: arbitrarily deep tiles are processed in full
  (kills the v1 silent-drop overflow class, ADVICE.md r1 high).
* Depth resolve: each of the `chunk` sublane slots keeps a running
  (min z, id) over the chunks it sees; one final reduction per tile picks the
  global winner.  Tie-break on exactly equal depth is "smallest triangle id"
  (v1: first-processed) — identical except for exactly coincident surfaces.

Round-3 changes (VERDICT r2 next #1):
* slim 13-col pair rows (52 B vs 64 B — binning.pack_tri_data_slim): the
  z_mode flag rides the sign of ±(id+1), the bbox cols the folded kernel
  never read are gone, and the [P,13] binning gather is ~20% cheaper.
* inner-loop op diet: min-reduced edge coverage (2 mins + 1 compare instead
  of 3 compares + 2 ands) and one fused coverage chain.
* y_origin arrives as a scalar-prefetch operand, so the row-sharded path can
  pass a traced lax.axis_index-derived origin (ADVICE r2 #1).

Matches the fixed-function rasterizer the reference gets from Vulkan
(gpu_vulkan.c:1680-1872 graphics pipelines).
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

FAR = 3.4e38
BIG_ID = 3.0e38
NCOL = 13  # binning.pack_tri_data_slim columns


def _vis_kernel_folded(starts_ref, minz_ref, yorg_ref, pair_ref,
                       depth_out, id_out, buf, depth_acc, id_acc, den_acc,
                       sem, *, tile, chunk, tiles_x, hiz):
    pix = tile * tile
    t = pl.program_id(0)
    ty = t // tiles_x
    tx = t % tiles_x
    out_row = t % 8  # 8 tiles share one (8, pix) output block (Mosaic needs
                     # sublane-divisible blocks; each step writes its own row)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    n = end - start
    # block-aligned walk: DMA whole transposed pair blocks [NCOL, chunk] (lane
    # dim 128-aligned — Mosaic requires it), mask rows outside [start, end)
    blk0 = start // chunk
    nchunks = jnp.where(n > 0, (end - 1) // chunk - blk0 + 1, 0)
    nb_total = minz_ref.shape[0]

    # pixel-coordinate planes (int iota -> f32; f32 iota unsupported)
    pidx = jax.lax.broadcasted_iota(jnp.int32, (chunk, pix), 1)
    px = (tx * tile + pidx % tile).astype(jnp.float32) + 0.5
    py = (ty * tile + pidx // tile + yorg_ref[0]).astype(jnp.float32) + 0.5
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    depth_acc[:] = jnp.full((chunk, pix), FAR, jnp.float32)
    id_acc[:] = jnp.full((chunk, pix), BIG_ID, jnp.float32)
    if not hiz:
        den_acc[:] = jnp.full((chunk, pix), 1.0, jnp.float32)

    def get_dma(slot, i):
        return pltpu.make_async_copy(
            pair_ref.at[blk0 + i],
            buf.at[slot],
            sem.at[slot],
        )

    def eval_common(slot, i):
        """Shared coverage + rational depth (N, D) eval for one chunk.

        Depth is the rational N/D (N = z0*esum + e1*dz1 + e2*dz2, D = esum
        for vertex-interp rows; N = plane z, D = 1 for w-crossing rows) with
        the range test PRE-division — bitwise the scheme in
        xla_raster.rasterize_vis.  The per-(chunk,pixel) DIVISION of the old
        kernel (the single most expensive VPU op in the loop) is gone: the
        non-hiz accumulator keeps (N, D) and depth-tests rationally, dividing
        once per TILE at resolve (~13x fewer divides at bench scale).
        Products stay far from f32 overflow: |N| <= |D| under coverage and
        |D| = |esum| ~ (w*W)^2*W <~ 1e15, so cross-products <= ~1e30.
        """
        d = jnp.swapaxes(buf[slot], 0, 1)   # [chunk, NCOL] f32
        e0 = d[:, 0:1] * px + d[:, 1:2] * py + d[:, 2:3]
        e1 = d[:, 3:4] * px + d[:, 4:5] * py + d[:, 5:6]
        e2 = d[:, 6:7] * px + d[:, 7:8] * py + d[:, 8:9]
        esum = e0 + e1 + e2
        em = jnp.minimum(jnp.minimum(e0, e1), e2)
        zx, zy, zc = d[:, 9:10], d[:, 10:11], d[:, 11:12]
        enc = d[:, 12:13]  # ±(id+1); + = vertex-interp depth, − = plane
        n_hp = zx * esum + (e1 * zy + e2 * zc)
        z_pl = zx * px + zy * py + zc
        vert = enc > 0.0
        n_sel = jnp.where(vert, n_hp, z_pl)
        d_sel = jnp.where(vert, esum, 1.0)
        row_glob = (blk0 + i) * chunk + row
        rowok = (row_glob >= start) & (row_glob < end)  # my segment only
        cov = (
            (em >= 0.0) & (esum > 0.0) & rowok
            & (n_sel >= 0.0) & (n_sel <= d_sel)
        )
        return n_sel, d_sel, cov, enc

    def eval_chunk(slot, i):
        get_dma(slot, i).wait()
        n_sel, d_sel, cov, enc = eval_common(slot, i)
        if hiz:
            # the early-exit bound needs actual z per chunk — keep the divide
            z = n_sel / jnp.where(d_sel == 0.0, 1e-20, d_sel)
            zm = jnp.where(cov, z, FAR)
            cur = depth_acc[:]
            take = zm < cur
            depth_acc[:] = jnp.where(take, zm, cur)
            id_acc[:] = jnp.where(take, jnp.abs(enc) - 1.0, id_acc[:])
        else:
            nm = jnp.where(cov, n_sel, FAR)
            dm = jnp.where(cov, d_sel, 1.0)
            cur_n = depth_acc[:]
            cur_d = den_acc[:]
            # rational depth test: nm/dm < cur_n/cur_d  (both dens > 0)
            take = nm * cur_d < cur_n * dm
            depth_acc[:] = jnp.where(take, nm, cur_n)
            den_acc[:] = jnp.where(take, dm, cur_d)
            id_acc[:] = jnp.where(take, jnp.abs(enc) - 1.0, id_acc[:])

    @pl.when(nchunks > 0)
    def _body():
        get_dma(0, 0).start()

        if not hiz:
            def chunk_body(i, _):
                slot = i % 2

                @pl.when(i + 1 < nchunks)
                def _():
                    get_dma((i + 1) % 2, i + 1).start()

                eval_chunk(slot, i)
                return 0
        else:
            # hierarchical z (pairs sorted front-to-back per tile): once
            # every pixel is covered closer than anything remaining, stop.
            # chunk_minz is a conservative lower bound (floor-quantized min
            # vertex z), so `bound > zmax` implies strictly farther — the
            # skipped triangles cannot win any pixel; results stay EXACT.
            # The next chunk's DMA starts only after its skip test, so no
            # orphaned DMA/semaphore ever outlives the grid step.
            def chunk_body(i, done):
                slot = i % 2

                @pl.when(jnp.logical_not(done))
                def _():
                    eval_chunk(slot, i)

                zmax = jnp.max(jnp.min(depth_acc[:], axis=0))  # FAR if hole
                nxt = jnp.minimum(blk0 + i + 1, nb_total - 1)
                done2 = done | (minz_ref[nxt] > zmax)

                @pl.when((i + 1 < nchunks) & jnp.logical_not(done2))
                def _():
                    get_dma((i + 1) % 2, i + 1).start()
                return done2

        jax.lax.fori_loop(0, nchunks, chunk_body, False if hiz else 0)

    # final resolve: global min depth, then smallest id among the minima.
    # Non-hiz: the deferred division happens HERE — once per tile, not per
    # chunk (winner slots hold (N, D) with D > 0; empty slots FAR/1).
    zm = depth_acc[:] if hiz else depth_acc[:] / den_acc[:]
    zmin = jnp.min(zm, axis=0, keepdims=True)          # [1, pix]
    ids = jnp.where(zm == zmin, id_acc[:], BIG_ID)
    idw = jnp.min(ids, axis=0, keepdims=True)
    depth_out[pl.ds(out_row, 1), :] = zmin
    id_out[pl.ds(out_row, 1), :] = jnp.where(zmin >= FAR, -1.0, idw)


def rasterize_vis_folded(
    setup: TriSetup,
    width,
    height,
    tile=32,
    chunk=128,
    pair_capacity=None,
    interpret=None,
    y_origin=0,
    return_overflow=False,
    hiz=False,
):
    """Folded-tile rasterization of rows [y_origin, y_origin+height).
    Returns (depth [H,W] — +inf empty, tri_id [H,W][, overflow i32[2]]).

    y_origin may be a traced value (e.g. lax.axis_index-derived in the
    row-sharded frame) — it reaches the kernel as a scalar-prefetch operand.
    overflow[0] is always 0 (this kernel has no per-tile capacity); only a
    pair_capacity overrun (overflow[1] > pair_capacity) can drop triangles.
    hiz: front-to-back pair order + early-exit once the tile is covered
    closer than anything remaining (exact — see the kernel docnote).
    """
    if interpret is None:
        interpret = device.pallas_interpret()
    bins = bin_triangles(
        setup, width, height, tile, tile, pair_capacity,
        tile_capacity=0, chunk=chunk, y_origin=y_origin, z_order=hiz,
        fmt="slim13",
    )
    ty, tx = bins.tiles_y, bins.tiles_x
    n_tiles = ty * tx
    pix = tile * tile

    # transposed chunk blocks [NB, NCOL, chunk]: the kernel DMAs one
    # [NCOL, chunk] block per step (lane dim = chunk = 128-aligned, as Mosaic
    # requires)
    assert bins.pair_data.shape[1:] == (chunk, NCOL)
    blocks = jnp.swapaxes(bins.pair_data, 1, 2)

    kernel = functools.partial(
        _vis_kernel_folded, tile=tile, chunk=chunk, tiles_x=tx, hiz=hiz,
    )
    n_tiles_pad = -(-n_tiles // 8) * 8
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((8, pix), lambda t, starts, minz, yorg: (t // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, pix), lambda t, starts, minz, yorg: (t // 8, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NCOL, chunk), jnp.float32),
            pltpu.VMEM((chunk, pix), jnp.float32),
            pltpu.VMEM((chunk, pix), jnp.float32),
            pltpu.VMEM((chunk, pix), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    yorg = jnp.asarray(y_origin, jnp.int32).reshape(1)
    depth_t, id_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles_pad, pix), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles_pad, pix), jnp.float32),
        ],
        interpret=interpret,
    )(bins.starts, bins.chunk_minz, yorg, blocks)
    depth_t = depth_t[:n_tiles]
    id_t = id_t[:n_tiles]

    # unfold [T, tile*tile] -> [H, W]
    def unfold(a):
        return (
            a.reshape(ty, tx, tile, tile)
            .transpose(0, 2, 1, 3)
            .reshape(ty * tile, tx * tile)[:height, :width]
        )

    depth = unfold(depth_t)
    tri = unfold(id_t)
    depth = jnp.where(depth >= FAR, jnp.inf, depth)
    tri = jnp.where(tri >= BIG_ID, -1.0, tri).astype(jnp.int32)
    if return_overflow:
        ovf = jnp.stack([jnp.int32(0), bins.total_pairs])
        return depth, tri, ovf
    return depth, tri
