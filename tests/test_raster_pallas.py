"""The Pallas tile rasterizer must match the XLA reference exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vulkan_pbr_renderer_tpu.assets import MaterialDesc, build_scene, procedural
from vulkan_pbr_renderer_tpu.raster import binning, setup as rs, visibility, xla_raster as rr
from vulkan_pbr_renderer_tpu.utils import math3d as m3


def _random_tris(n, seed=0, depth_range=(0.1, 0.9)):
    rng = np.random.default_rng(seed)
    center = rng.uniform(-1, 1, (n, 1, 2))
    verts = center + rng.uniform(-0.4, 0.4, (n, 3, 2))
    z = rng.uniform(*depth_range, (n, 1, 1)).repeat(3, 1)
    w = np.ones((n, 3, 1), np.float32)
    return jnp.asarray(np.concatenate([verts, z, w], -1).astype(np.float32))


def _compare(clip, W, H, **kw):
    s = rs.setup_triangles(clip, W, H, cull="none")
    d_ref, t_ref = rr.rasterize_vis(s, W, H)
    d_got, t_got = visibility.rasterize_vis_tiled(s, W, H, **kw)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_got))
    dr = np.asarray(d_ref)
    dg = np.asarray(d_got)
    np.testing.assert_allclose(
        np.where(np.isinf(dr), -1, dr), np.where(np.isinf(dg), -1, dg), atol=1e-6
    )


def test_single_triangle_matches():
    clip = jnp.asarray(
        np.array([[[-0.5, -0.5, 0.5, 1.0], [0.5, -0.5, 0.5, 1.0], [0.0, 0.5, 0.5, 1.0]]],
                 np.float32)
    )
    _compare(clip, 256, 128, tile_capacity=256)


def test_many_random_triangles_match():
    clip = _random_tris(300, seed=1)
    _compare(clip, 256, 160, tile_capacity=512)


def test_multi_tile_spanning_triangles():
    # few huge triangles spanning many tiles
    clip = _random_tris(8, seed=2)
    clip = clip.at[:, :, :2].multiply(3.0)
    _compare(clip, 384, 160, tile_capacity=256)


def test_depth_ordering_matches():
    # heavy overlap: many tris at the same place, distinct depths
    rng = np.random.default_rng(3)
    n = 64
    base = np.array([[[-0.6, -0.6], [0.6, -0.6], [0.0, 0.6]]], np.float32)
    verts = base + rng.uniform(-0.05, 0.05, (n, 3, 2)).astype(np.float32)
    z = np.linspace(0.2, 0.8, n, dtype=np.float32)[:, None, None].repeat(3, 1)
    w = np.ones((n, 3, 1), np.float32)
    clip = jnp.asarray(np.concatenate([verts, z, w], -1))
    _compare(clip, 128, 128, tile_capacity=256)


def test_scene_raster_through_pipeline():
    mats = [MaterialDesc()]
    parts = [procedural.make_plane((0, 0, 0), (10, 10), 2, 0),
             procedural.make_cube((0, 0, 1), (1.5, 1.5, 1.5), 0),
             procedural.make_uv_sphere((2, 1, 1), 0.8, 8, 16, 0)]
    scene = build_scene(parts, mats, texture_size=16)
    cam = m3.perspective_lh_zo(np.deg2rad(60.0), 1.5, 0.1, 100.0) @ m3.look_at(
        jnp.array([4.0, -5.0, 3.0]), jnp.array([0.0, 0.0, 0.5])
    )
    clip = rs.transform_to_clip(scene.positions, cam)
    s = rs.setup_triangles(clip[scene.indices], 192, 128, cull="back")
    d_ref, t_ref = rr.rasterize_vis(s, 192, 128)
    d_got, t_got = visibility.rasterize_vis_tiled(s, 192, 128, tile_capacity=512)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_got))


def test_folded_hiz_matches_xla_exactly():
    """hiz (front-to-back + early-exit) must be EXACT: the skip test uses a
    conservative lower bound, so skipped triangles are strictly occluded."""
    from vulkan_pbr_renderer_tpu.raster import visibility_v2

    # heavy overdraw: many stacked triangles in the same region
    clip = _random_tris(600, seed=11)
    s = rs.setup_triangles(clip, 128, 96, cull="none")
    d_ref, t_ref = rr.rasterize_vis(s, 128, 96)
    d_on, t_on = visibility_v2.rasterize_vis_folded(s, 128, 96, hiz=True)
    d_off, t_off = visibility_v2.rasterize_vis_folded(s, 128, 96, hiz=False)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_on))
    np.testing.assert_array_equal(np.asarray(t_off), np.asarray(t_on))
    dr = np.where(np.isinf(np.asarray(d_ref)), -1, np.asarray(d_ref))
    dn = np.where(np.isinf(np.asarray(d_on)), -1, np.asarray(d_on))
    np.testing.assert_allclose(dr, dn, atol=1e-6)


def test_near_plane_crossing_bbox_conservative():
    """Triangles crossing w=0 get a directional-extension bbox (setup.py
    round 3) instead of full screen; the tiled kernels must still cover every
    pixel the XLA baseline covers."""
    from vulkan_pbr_renderer_tpu.raster import visibility_v2

    rng = np.random.default_rng(21)
    n = 40
    verts = rng.uniform(-2, 2, (n, 3, 2)).astype(np.float32)
    z = rng.uniform(0.1, 0.9, (n, 1, 1)).astype(np.float32).repeat(3, 1)
    # w spans negative..positive so many triangles cross the camera plane
    w = rng.uniform(-0.5, 1.5, (n, 3, 1)).astype(np.float32)
    clip = jnp.asarray(np.concatenate([verts * np.abs(w), z * np.abs(w), w], -1))
    s = rs.setup_triangles(clip, 160, 96, cull="none")
    d_ref, t_ref = rr.rasterize_vis(s, 160, 96)
    d_v2, t_v2 = visibility_v2.rasterize_vis_folded(s, 160, 96)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_v2))
    d_v1, t_v1 = visibility.rasterize_vis_tiled(s, 160, 96, tile_capacity=256)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_v1))


def test_binning_segments_consistent():
    clip = _random_tris(100, seed=4)
    s = rs.setup_triangles(clip, 256, 128, cull="none")
    bins = binning.bin_triangles(s, 256, 128, tile_capacity=256)
    assert bins.tiles_x == 2 and bins.tiles_y == 4
    starts = np.asarray(bins.starts)
    ids = np.asarray(bins.pair_data[..., 12]).reshape(-1).astype(np.int64)
    assert (np.diff(starts) >= 0).all()
    total = starts[-1]
    assert (ids[:total] >= 0).all()
    assert (ids[total:] == -1).all()
    # per-tile segments hold sorted tri ids (stability)
    for t in range(starts.shape[0] - 1):
        seg = ids[starts[t] : starts[t + 1]]
        assert (np.diff(seg) > 0).all()  # each tri at most once per tile
    # every valid triangle appears in at least one tile
    valid_ids = set(np.nonzero(np.asarray(s.valid))[0].tolist())
    binned = set(ids[:total].tolist())
    assert valid_ids == binned


def test_overflow_counters_surface_dropped_triangles():
    # ADVICE.md r1 (high): capacity overflow must be detectable.  5 tris in
    # one tile with tile_capacity=4 (chunk must divide capacity; use chunk=4):
    # max_segment reports 5 > 4.
    clip = _random_tris(5, seed=7)
    clip = clip.at[:, :, :2].multiply(0.1)  # all in one tile
    s = rs.setup_triangles(clip, 128, 32, cull="none")
    d, t, ovf = visibility.rasterize_vis_tiled(
        s, 128, 32, tile_capacity=4, chunk=4, return_overflow=True
    )
    max_seg, total = (int(x) for x in np.asarray(ovf))
    assert max_seg == 5 and max_seg > 4
    # with ample capacity the same scene reports no overflow
    _, _, ovf2 = visibility.rasterize_vis_tiled(
        s, 128, 32, tile_capacity=256, return_overflow=True
    )
    assert int(np.asarray(ovf2)[0]) == 5 and int(np.asarray(ovf2)[0]) <= 256


def test_renderer_check_overflow(tmp_path):
    # end-to-end: render a frame through the pallas backend with tiny
    # capacities and confirm the host-side check flags the drop.  Only the v1
    # rowblock kernel has a per-tile capacity (the sun raster packs all ~576
    # sphere tris into one 32px tile > tile_capacity=128); the folded (v2)
    # kernel walks arbitrarily deep segments, so the same scene must report
    # clean there.
    from vulkan_pbr_renderer_tpu.app.renderer import Renderer, make_camera
    from vulkan_pbr_renderer_tpu.config import RenderConfig

    mats = [MaterialDesc()]
    parts = [procedural.make_uv_sphere((0, 0, 1), 1.0, 12, 24, 0)]
    scene = build_scene(parts, mats, texture_size=16)
    cfg = RenderConfig(
        width=128, height=64, shadow_map_size=64, lightgrid_size=8,
        prefiltered_env_size=16, prefiltered_env_min_size=8,
        prefilter_samples=16, brdf_lut_size=16, brdf_lut_samples=16,
        bloom_pass_count=2, gi_screen_trace_steps=2, gi_diffuse_steps=2,
        gi_specular_steps=2, light_shaft_steps=2,
        tile_capacity=128, tri_chunk=128, raster_kernel="rowblock",
        tile_h=32, tile_w=128,
        # the subject is the overflow COUNTERS (main + sun raster); the
        # shading stack behind them is irrelevant, and with it off the two
        # Renderer compiles drop ~5x (this test was the fast tier's single
        # slowest at 149 s — VERDICT r4 #7)
        enable_gi=False, enable_taa=False, enable_bloom=False,
        enable_light_shafts=False, enable_ibl=False,
    )
    r = Renderer(cfg, scene, use_cache=False, raster_backend="pallas")
    cam = make_camera((0.0, -4.0, 1.0), (0.0, 0.0, 1.0), cfg)
    r.render(cam)
    ok, msg = r.check_overflow()
    assert not ok and "overflow" in msg
    with pytest.raises(RuntimeError):
        r.check_overflow(strict=True)

    r2 = Renderer(cfg.replace(raster_kernel="folded"), scene, use_cache=False,
                  raster_backend="pallas")
    r2.render(cam)
    ok2, _ = r2.check_overflow()
    assert ok2  # no tile capacity to overflow; pair budget is ample
