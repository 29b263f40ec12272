"""Per-op TPU profile of the full frame (VERDICT r1 #4).

Collects a jax.profiler device trace of the bench-scale frame, then parses the
xplane proto into a per-op time table (top ops + per-pass rollup by scope
name).  Falls back to printing the raw trace path if the conversion tooling
can't parse it (the tunnel platform is experimental).

Usage (on TPU):  python docs/profile_frame.py [--detail 4.5] [--frames 2]
Output: /tmp/jax_trace/** + a printed table; paste the table into
docs/PERF_NOTES.md.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect(detail, frames, width, height, trace_dir, overrides=None):
    import jax
    import jax.numpy as jnp

    from vulkan_pbr_renderer_tpu.app.renderer import (
        CameraState, Renderer, init_frame_state, make_camera, render_frame,
    )
    from vulkan_pbr_renderer_tpu.assets import build_scene, suntemple
    from vulkan_pbr_renderer_tpu.config import RenderConfig

    cfg = RenderConfig(width=width, height=height)
    if overrides:
        def parse(v):
            for conv in (int, float):
                try:
                    return conv(v)
                except ValueError:
                    pass
            return {"True": True, "False": False}.get(v, v)
        cfg = cfg.replace(**{k: parse(v) for k, v in
                             (kv.split(":") for kv in overrides.split(","))})
    backend = "pallas"
    parts = suntemple.build_parts(detail=detail)
    scene = build_scene(parts, suntemple.materials(), texture_size=256)
    print(f"# scene: {scene.num_tris} tris, {width}x{height}", file=sys.stderr)
    r = Renderer(cfg, scene, raster_backend=backend)

    cams = [make_camera(*suntemple.camera_path(i / max(frames - 1, 1)), cfg)
            for i in range(frames)]
    cam_batch = CameraState(*[
        jnp.stack([getattr(c, f) for c in cams]) for f in CameraState._fields
    ])
    sun = jnp.asarray([35.0, 80.0], jnp.float32)

    import functools

    @functools.partial(jax.jit)
    def render_n(state, cam_batch, sun, pre, lut):
        def body(state, cam_leaves):
            cam = CameraState(*cam_leaves)
            state, img = render_frame(scene, state, cam, sun, pre, lut, cfg,
                                      backend)
            return state, jnp.mean(img)
        state, means = jax.lax.scan(body, state, tuple(cam_batch))
        return state, means

    state = init_frame_state(cfg)
    # warm up / compile outside the trace
    state, means = render_n(state, cam_batch, sun, r.prefiltered_env, r.brdf_lut)
    float(means[-1])
    print("# compiled; tracing", file=sys.stderr)

    jax.profiler.start_trace(trace_dir)
    state, means = render_n(state, cam_batch, sun + 0.001, r.prefiltered_env,
                            r.brdf_lut)
    float(means[-1])
    jax.profiler.stop_trace()
    return frames


def summarize(trace_dir, frames, top=40):
    """Parse the xplane proto -> per-op table. Requires the tensorboard
    profile plugin (present in this image)."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("NO xplane.pb produced — device tracing unsupported here?")
        return False
    path = max(paths, key=os.path.getmtime)
    print(f"# parsing {path}", file=sys.stderr)
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception as e:  # pragma: no cover
        print(f"xprof import failed: {e}; raw trace at {path}")
        return False
    data, _ctype = rtd.xspace_to_tool_data([path], "framework_op_stats", {})
    out_json = os.path.join(trace_dir, "op_stats.json")
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out_json, mode) as f:
        f.write(data)
    print(f"# wrote {out_json}", file=sys.stderr)
    try:
        tables = json.loads(data)
        d = tables[0]  # [device table, host table]
        cols = [c["id"] for c in d["cols"]]
        rows = [[c.get("v") if isinstance(c, dict) else c for c in r["c"]]
                for r in d["rows"]]
        i_name = cols.index("operation")
        i_type = cols.index("type")
        i_occ = cols.index("occurrences")
        i_self = cols.index("total_self_time")
        rows = [r for r in rows if (r[i_self] or 0) > 0]
        rows.sort(key=lambda r: -(r[i_self] or 0))
        total = sum(r[i_self] or 0 for r in rows)
        print(f"\n== top device ops by self time "
              f"(total {total/1e3/frames:.1f} ms/frame over {frames} frames) ==")
        print(f"{'ms/frame':>9} {'%':>5} {'x':>5}  op")
        for r in rows[:top]:
            t = (r[i_self] or 0) / 1e3 / frames
            pct = 100.0 * (r[i_self] or 0) / total
            print(f"{t:9.2f} {pct:5.1f} {r[i_occ]:>5}  "
                  f"[{r[i_type]}] {str(r[i_name])[:100]}")
        # rollup by op type
        by_type = {}
        for r in rows:
            by_type[r[i_type]] = by_type.get(r[i_type], 0) + (r[i_self] or 0)
        print("\n== rollup by op type ==")
        for t, us in sorted(by_type.items(), key=lambda kv: -kv[1])[:20]:
            print(f"{us/1e3/frames:9.2f} ms  {100.0*us/total:5.1f}%  {t}")
    except Exception as e:
        print(f"table parse failed ({e}); inspect {out_json} manually")
    return True


def summarize_hlo(trace_dir, frames, top=60, type_filter=None):
    """Per-HLO-instruction table with source lines (hlo_stats tool) — the
    per-op table above merges every `jit(_take)/gather` in a pass into one
    row; this splits them by instruction and maps each back to the Python
    line that emitted it."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("NO xplane.pb found")
        return False
    path = max(paths, key=os.path.getmtime)
    print(f"# parsing {path} (hlo_stats)", file=sys.stderr)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ctype = rtd.xspace_to_tool_data([path], "hlo_stats", {})
    tables = json.loads(data)
    d = tables if isinstance(tables, dict) else tables[0]
    cols = [c["id"] for c in d["cols"]]
    rows = [[c.get("v") if isinstance(c, dict) else c for c in r["c"]]
            for r in d["rows"]]

    def col(*names):
        for n in names:
            if n in cols:
                return cols.index(n)
        return None

    i_cat = col("hlo_category", "category")
    i_expr = col("hlo_op_expression", "expression", "hlo_op_name")
    i_self = col("total_self_time_in_us", "total_self_time", "self_time_us")
    i_src = col("source_info", "source")
    i_occ = col("occurrences")
    rows = [r for r in rows if (r[i_self] or 0) > 0]
    if type_filter:
        rows = [r for r in rows if type_filter in str(r[i_cat] or "").lower()]
    rows.sort(key=lambda r: -(r[i_self] or 0))
    total = sum(r[i_self] or 0 for r in rows)
    import re

    def clean_src(s):
        # the cell is HTML with a title= holding the full stack; keep the
        # repo frames that aren't the profile/renderer boilerplate
        frames_ = re.findall(r"/root/repo/([\w/.]+:\d+)", s)
        keep = [f for f in frames_
                if "profile_frame" not in f and "bench.py" not in f]
        # drop the generic renderer.py dispatch frames unless nothing else
        inner = [f for f in keep if "app/renderer" not in f]
        return " <- ".join((inner or keep)[:3]) or "?"

    print(f"\n== top HLO instructions by self time "
          f"(total {total/1e3/frames:.1f} ms/frame"
          f"{' [' + type_filter + ' only]' if type_filter else ''}) ==")
    for r in rows[:top]:
        t = (r[i_self] or 0) / 1e3 / frames
        src = clean_src(str(r[i_src] or "?"))
        expr = re.sub(r"\s+", " ", str(r[i_expr] or ""))[:130]
        occ = r[i_occ] if i_occ is not None else "?"
        print(f"{t:9.2f} ms x{occ:>4} [{r[i_cat]}] {src}")
        print(f"           {expr}")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detail", type=float, default=4.5)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument("--trace-dir", default="/tmp/jax_trace")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--hlo", action="store_true",
                    help="per-HLO-instruction table with source lines")
    ap.add_argument("--type", default=None,
                    help="with --hlo: filter category substring (e.g. gather)")
    ap.add_argument("--config", default=None,
                    help="RenderConfig overrides, kw:v,kw:v")
    args = ap.parse_args()
    if not args.summarize_only:
        collect(args.detail, args.frames, args.width, args.height,
                args.trace_dir, overrides=args.config)
    if args.hlo:
        summarize_hlo(args.trace_dir, args.frames, type_filter=args.type)
    else:
        summarize(args.trace_dir, args.frames)


if __name__ == "__main__":
    main()
