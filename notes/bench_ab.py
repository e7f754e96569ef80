"""A/B kernel-variant timing on the full-world bench views (real TPU).

Times whole render waves (the production path: staged trace + in-program
rescue + shade with bucketed compaction) per kernel variant, per viewpoint.
Each (variant, view) pair runs in its OWN SUBPROCESS with a timeout and one
retry — the axon tunnel wedges transiently (BENCH_r03; several repros this
round) and a bare loop loses the whole table to one wedge.

Usage (PYTHONPATH=/root/repo:/root/.axon_site):

    python notes/bench_ab.py --views 0,5 --waves 2 \
        --variants base,noprefetch,np8,rounds384

Each variant compiles its own executables on first use (minutes through the
tunnel, cached persistently); timed waves are warm.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    "noprefetch": {"paged_prefetch": False},
    "np2": {"paged_fanout": 2},
    "np6": {"paged_fanout": 6},
    "np8": {"paged_fanout": 8},
    "npp2": {"paged_pool_fanout": 2},
    "march16": {"paged_march": 16},
    "march64": {"paged_march": 64},
    "phases1": {"paged_phases": 1},
    "phases3": {"paged_phases": 3},
    "transit4": {"paged_transit": 4},
    "rounds128": {"paged_rounds": 128},
    "rounds256": {"paged_rounds": 256},
    "rounds384": {"paged_rounds": 384},
    # Round-5: with rescue resume-from-t the main budget can shrink —
    # divergent tiles release early and stragglers resume where they
    # stopped instead of re-marching from the origin.
    "rounds96": {"paged_rounds": 96},
    "rounds64": {"paged_rounds": 64},
    "rounds48": {"paged_rounds": 48},
    "rounds32": {"paged_rounds": 32},
    "p1": {"rescue_passes": 1},
    "slab512npp2": {"paged_pool_slab": 512, "paged_pool_fanout": 2},
    "slab512npp4": {"paged_pool_slab": 512, "paged_pool_fanout": 4},
    "slab256npp4": {"paged_pool_slab": 256, "paged_pool_fanout": 4},
    "p2": {"rescue_passes": 2},
    "r96p1": {"paged_rounds": 96, "rescue_passes": 1},
    "r96rr192": {"paged_rounds": 96, "rescue_rounds": 192},
    # Round-5b: two-tile (16,128) kernel state — one vote+DMA round serves
    # 2048 lanes (ROADMAP §1's last untried >20% candidate).
    "tile16": {"paged_tile_rows": 16},
    "tile16r256": {"paged_tile_rows": 16, "paged_rounds": 256},
}


def _pair_main(vname: str, vi: int, waves: int, small: bool) -> None:
    """Subprocess: one (variant, view) measurement; prints PAIR_RESULT."""
    import dataclasses

    import jax

    CACHE = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(CACHE, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from brickmap_tpu import scene as scene_mod
    from brickmap_tpu.app.benchmark import SUN_POSITION, benchmark_cameras
    from brickmap_tpu.config import BrickmapConfig, GridConfig, RenderConfig
    from brickmap_tpu.ops import sunsky as ss
    from brickmap_tpu.pallas.paged import build_paged_scene_device
    from brickmap_tpu.render import pathtrace

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))[0])

    tag = "small" if small else "full"
    if small:
        grid = GridConfig(grid_size=1024, grid_height=256)
        scale = 1024.0 / 4096.0
    else:
        grid = GridConfig()
        scale = 1.0
    sc = scene_mod.load_scene(os.path.join(CACHE, f"scene_{tag}.npz"))
    meta = np.load(os.path.join(CACHE, f"paged_{tag}_meta.npy"))
    scd = np.load(os.path.join(CACHE, f"paged_{tag}_scd.npy"))
    scene = build_paged_scene_device(sc, grid, meta=meta, sc_dist=scd)
    sync(scene.poolT)
    print(f"[{vname}/v{vi}] scene on device", file=sys.stderr, flush=True)

    base_render = RenderConfig(width=1920, height=1080, max_bounces=3,
                               max_top_steps=2048, paged_rounds=192)
    render = dataclasses.replace(base_render, **VARIANTS[vname])
    cfg = BrickmapConfig(grid=grid, render=render)
    w, h = render.width, render.height
    sun_dir = ss.sun_direction_from_position(jnp.asarray(SUN_POSITION))
    cam = benchmark_cameras(scale)[vi]
    arrays = pathtrace.camera_arrays_for(cam, sun_dir, w, h)
    cam_brick = jnp.asarray(cam.brick_position, jnp.int32)
    key = jax.random.PRNGKey(vi)

    t0 = time.perf_counter()
    out = pathtrace.render_wave(jax.random.fold_in(key, 999), scene,
                                arrays, cam_brick, cfg, w, h)
    sync(out[0])
    warm_s = time.perf_counter() - t0
    print(f"[{vname}/v{vi}] warm {warm_s:.1f}s", file=sys.stderr, flush=True)
    times = []
    exh = 0
    for i in range(waves):
        t0 = time.perf_counter()
        rgb, cnt, req = pathtrace.render_wave(
            jax.random.fold_in(key, i), scene, arrays, cam_brick, cfg, w, h)
        sync(rgb)
        times.append(time.perf_counter() - t0)
        exh += int(req["exhausted_rays"])
    best = min(times)
    mr = int(req["traced_rays"]) / best / 1e6
    print("PAIR_RESULT " + json.dumps(
        dict(variant=vname, view=vi, warm_s=round(warm_s, 1),
             best_s=round(best, 3), mrays=round(mr, 3), exhausted=exh)),
        flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", default="0,5")
    ap.add_argument("--waves", type=int, default=2)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--variants", default="base,noprefetch")
    ap.add_argument("--timeout", type=float, default=1500.0)
    ap.add_argument("--pair", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.pair:
        vname, vi = args.pair.split(":")
        _pair_main(vname, int(vi), args.waves, args.small)
        return

    rows = []
    for vname in args.variants.split(","):
        for vi in (int(v) for v in args.views.split(",")):
            for attempt in range(2):
                try:
                    proc = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--pair", f"{vname}:{vi}",
                         "--waves", str(args.waves)]
                        + (["--small"] if args.small else []),
                        stdout=subprocess.PIPE, text=True,
                        timeout=args.timeout)
                    got = None
                    for line in proc.stdout.splitlines():
                        if line.startswith("PAIR_RESULT "):
                            got = json.loads(line[len("PAIR_RESULT "):])
                    if got:
                        rows.append(got)
                        print(f"{got['variant']:12s} view {got['view']}: "
                              f"warm {got['warm_s']:7.1f}s  best "
                              f"{got['best_s']:6.2f}s  {got['mrays']:6.2f} "
                              f"Mrays/s  exh {got['exhausted']}", flush=True)
                        break
                    print(f"{vname}:{vi} attempt {attempt}: no result "
                          f"(rc={proc.returncode})", flush=True)
                except subprocess.TimeoutExpired:
                    print(f"{vname}:{vi} attempt {attempt}: TIMED OUT "
                          f"(tunnel wedge?)", flush=True)

    print("\nvariant      view   warm_s  best_s  Mrays/s  exh")
    for r in rows:
        print(f"{r['variant']:12s} {r['view']:4d} {r['warm_s']:8.1f} "
              f"{r['best_s']:7.2f} {r['mrays']:8.2f} {r['exhausted']:5d}")


if __name__ == "__main__":
    main()
