"""Fast-GI fidelity tuner: SSIM + frame-ms for config variants vs the
reference-parity hybrid march (VERDICT r2 #3: fast SSIM >= 0.95).

Renders matched settled frames at 960x544 (camera t in --points), prints one
line per variant, and (with --diff) writes diff heatmaps to /tmp/gi_diff_*.png.

Usage on TPU:  python docs/tune_gi.py [--variants base,skip4,...] [--diff]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": dict(gi_fast_spec_hit_steps=0, gi_fast_probe_level=1),
    "skip4": dict(gi_fast_skip_steps=4),
    "samples3": dict(gi_fast_samples=3),
    "skip4_samples3": dict(gi_fast_skip_steps=4, gi_fast_samples=3),
    "noprobe": dict(gi_fast_screen_probe=False),
    "spread2": dict(gi_fast_sample_spread=2.0),
    "hit6": dict(gi_fast_spec_hit_steps=6, gi_fast_probe_level=1),
    "hit6_l0": dict(gi_fast_spec_hit_steps=6, gi_fast_probe_level=0),
    "hit10_l0": dict(gi_fast_spec_hit_steps=10, gi_fast_probe_level=0),
    "hit6_dh4_l0": dict(gi_fast_spec_hit_steps=6, gi_fast_diffuse_hit_steps=4,
                        gi_fast_probe_level=0),
    "margin0": dict(gi_fast_spec_hit_steps=0, gi_fast_probe_margin=0.0),
    "dssi1": dict(gi_fast_spec_hit_steps=0, gi_diffuse_ss_intensity=1.0),
    "dh2_m0": dict(gi_fast_spec_hit_steps=2, gi_fast_diffuse_hit_steps=2,
                   gi_fast_probe_margin=0.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base")
    ap.add_argument("--points", default="0.3,0.7")
    ap.add_argument("--settle", type=int, default=4)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--height", type=int, default=544)
    ap.add_argument("--detail", type=float, default=4.5)
    ap.add_argument("--diff", action="store_true")
    ap.add_argument("--time", action="store_true",
                    help="also time each variant (8-frame in-device scan)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vulkan_pbr_renderer_tpu.app.renderer import Renderer, make_camera
    from vulkan_pbr_renderer_tpu.assets import build_scene, suntemple
    from vulkan_pbr_renderer_tpu.config import RenderConfig
    from vulkan_pbr_renderer_tpu.utils import image

    cfg = RenderConfig(width=args.width, height=args.height // 32 * 32)
    scene = build_scene(suntemple.build_parts(detail=args.detail),
                        suntemple.materials(), texture_size=256)
    points = [float(t) for t in args.points.split(",")]

    def settled(mode_cfg, t):
        r = Renderer(mode_cfg, scene, raster_backend="pallas")
        cam = make_camera(*suntemple.camera_path(t), mode_cfg)
        img = None
        for k in range(args.settle):
            img = r.render(cam, sun_angle=(35.0 + 0.001 * k, 80.0))
        return np.asarray(img)

    refs = {}
    for t in points:
        refs[t] = settled(cfg.replace(gi_mode="reference"), t)
        print(f"# reference frame t={t} done", file=sys.stderr)

    for name in args.variants.split(","):
        kw = VARIANTS[name]
        vcfg = cfg.replace(gi_mode="fast", **kw)
        ssims = []
        for t in points:
            img = settled(vcfg, t)
            s = float(image.ssim(img, refs[t]))
            ssims.append(s)
            if args.diff:
                d = np.abs(img - refs[t]).mean(-1)
                d = (np.clip(d / max(d.max(), 1e-6), 0, 1) * 255).astype(np.uint8)
                image.write_png(f"/tmp/gi_diff_{name}_t{t}.png",
                                np.stack([d, d, d], -1) / 255.0)
                image.write_png(f"/tmp/gi_fast_{name}_t{t}.png", img)
                if name == args.variants.split(",")[0]:
                    image.write_png(f"/tmp/gi_ref_t{t}.png", refs[t])
        print(f"{name:20s} ssim={['%.4f' % s for s in ssims]} "
              f"mean={np.mean(ssims):.4f}")


if __name__ == "__main__":
    main()
