"""Raster microbench: isolate binning vs kernel cost at bench scale (round 3).

Times, on the real TPU with in-device lax.scan loops (vary an input each rep —
the tunnel memoizes byte-identical calls):
  * setup+binning only (bin_triangles through TileBins.starts fetch)
  * full rasterize_vis_folded (binning + folded kernel)
for the current config and candidate variants (tile size, hiz).

Usage:  python docs/microbench_raster.py [--detail 4.5] [--reps 3] [--iters 4]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=float, default=4.5)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--iters", type=int, default=4, help="in-device scan length")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--t", type=float, default=0.5, help="camera path point")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vulkan_pbr_renderer_tpu.app.renderer import make_camera
    from vulkan_pbr_renderer_tpu.assets import build_scene, suntemple
    from vulkan_pbr_renderer_tpu.config import RenderConfig
    from vulkan_pbr_renderer_tpu.raster import binning, setup as rsetup
    from vulkan_pbr_renderer_tpu.raster import visibility_v2

    cfg = RenderConfig(width=args.width, height=args.height)
    scene = build_scene(suntemple.build_parts(detail=args.detail),
                        suntemple.materials(), texture_size=64)
    n = scene.num_tris
    print(f"# {n} tris @ {args.width}x{args.height}", file=sys.stderr)
    cam = make_camera(*suntemple.camera_path(args.t), cfg)
    tri_pos = scene.tri_attr[:, :9].reshape(-1, 3, 3)

    def bench(name, fn, *inputs):
        """fn(eps_scalar, *inputs) -> scalar; scans iters times in-device."""

        @jax.jit
        def run(eps, *ins):
            def body(c, i):
                return c + fn(eps + 1e-12 * i.astype(jnp.float32), *ins), 0
            out, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(args.iters))
            return out

        float(run(jnp.float32(0.0), *inputs))  # compile
        t0 = time.perf_counter()
        for k in range(args.reps):
            float(run(jnp.float32(1e-9 * (k + 1)), *inputs))
        ms = (time.perf_counter() - t0) / (args.reps * args.iters) * 1000
        print(f"{name:48s} {ms:8.2f} ms")
        return ms

    mat = cam.clip_from_world

    def do_setup(eps, pos):
        clip = rsetup.transform_to_clip(pos, mat + eps, None)
        return rsetup.setup_triangles(clip, args.width, args.height, cull="back")

    bench("setup only", lambda eps, pos: do_setup(eps, pos).det.sum(), tri_pos)

    def bin_only(eps, pos, tile):
        s = do_setup(eps, pos)
        b = binning.bin_triangles(s, args.width, args.height, tile, tile,
                                  pair_capacity=2 * n, tile_capacity=0,
                                  chunk=128)
        return b.pair_data.sum() * 0 + b.starts[-1].astype(jnp.float32)

    def full(eps, pos, tile, hiz=False, pcap=2):
        s = do_setup(eps, pos)
        d, t = visibility_v2.rasterize_vis_folded(
            s, args.width, args.height, tile=tile, chunk=128,
            pair_capacity=int(pcap * n), hiz=hiz)
        return jnp.where(jnp.isinf(d), 0.0, d).sum()

    bench("setup+binning tile=32",
          functools.partial(bin_only, tile=32), tri_pos)
    bench("setup+binning tile=16",
          functools.partial(bin_only, tile=16), tri_pos)
    for pcap in (2, 6):
        bench(f"full raster tile=32 pcap={pcap}",
              functools.partial(full, tile=32, pcap=pcap), tri_pos)
    # tile=16: quarters the folded plane a tiny triangle pays for (~3x less
    # pixel-eval work at SunTemple's triangle sizes) at ~1.5x the pair count
    bench("full raster tile=16 pcap=3",
          functools.partial(full, tile=16, pcap=3), tri_pos)

    # real pair count at this view for capacity pricing
    s = jax.jit(do_setup)(jnp.float32(0.0), tri_pos)
    b = binning.bin_triangles(s, args.width, args.height, 32, 32,
                              pair_capacity=6 * n, tile_capacity=0, chunk=128)
    print(f"# real pairs tile=32: {int(b.total_pairs)} = "
          f"{int(b.total_pairs)/n:.2f}/tri; capacity 6x = {6*n}")
    b16 = binning.bin_triangles(s, args.width, args.height, 16, 16,
                                pair_capacity=12 * n, tile_capacity=0, chunk=128)
    print(f"# real pairs tile=16: {int(b16.total_pairs)} = "
          f"{int(b16.total_pairs)/n:.2f}/tri")


if __name__ == "__main__":
    main()
