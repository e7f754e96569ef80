"""A/B kernel-variant timing on the full-world bench views (real TPU).

Times whole render waves (the production path: staged trace + rescue +
shade with bucketed compaction) per kernel variant, per viewpoint.
Usage (PYTHONPATH=/root/repo:/root/.axon_site):

    python notes/bench_ab.py --views 0,1 --waves 2 \
        --variants base,noprefetch,np6,march64

Each variant compiles its own executables on first use (minutes through the
tunnel, cached persistently); timed waves are warm.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

ap = argparse.ArgumentParser()
ap.add_argument("--views", default="0,1")
ap.add_argument("--waves", type=int, default=2)
ap.add_argument("--small", action="store_true")
ap.add_argument("--variants", default="base,noprefetch")
args = ap.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from brickmap_tpu import scene as scene_mod
from brickmap_tpu.app.benchmark import SUN_POSITION, benchmark_cameras
from brickmap_tpu.config import BrickmapConfig, GridConfig, RenderConfig
from brickmap_tpu.ops import sunsky as ss
from brickmap_tpu.pallas.paged import build_paged_scene_device
from brickmap_tpu.render import pathtrace

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
}


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[:1])[0])


tag = "small" if args.small else "full"
if tag == "small":
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
print("scene on device", flush=True)

base_render = RenderConfig(width=1920, height=1080, max_bounces=3,
                           max_top_steps=2048, paged_rounds=192)
w, h = base_render.width, base_render.height
sun_dir = ss.sun_direction_from_position(jnp.asarray(SUN_POSITION))
cams = benchmark_cameras(scale)
views = [int(v) for v in args.views.split(",")]

rows = []
for vname in args.variants.split(","):
    render = dataclasses.replace(base_render, **VARIANTS[vname])
    cfg = BrickmapConfig(grid=grid, render=render)
    for vi in views:
        cam = cams[vi]
        arrays = pathtrace.camera_arrays_for(cam, sun_dir, w, h)
        cam_brick = jnp.asarray(cam.brick_position, jnp.int32)
        key = jax.random.PRNGKey(vi)
        t0 = time.perf_counter()
        out = pathtrace.render_wave(jax.random.fold_in(key, 999), scene,
                                    arrays, cam_brick, cfg, w, h)
        sync(out[0])
        warm_s = time.perf_counter() - t0
        times = []
        exh = 0
        for i in range(args.waves):
            t0 = time.perf_counter()
            rgb, cnt, req = pathtrace.render_wave(
                jax.random.fold_in(key, i), scene, arrays, cam_brick, cfg,
                w, h)
            sync(rgb)
            times.append(time.perf_counter() - t0)
            exh += int(req["exhausted_rays"])
        best = min(times)
        mr = int(req["traced_rays"]) / best / 1e6
        rows.append((vname, vi, warm_s, best, mr, exh))
        print(f"{vname:12s} view {vi}: warm {warm_s:6.1f}s  "
              f"best {best:6.2f}s  {mr:6.2f} Mrays/s  exh {exh}",
              flush=True)

print("\nvariant      view   warm_s  best_s  Mrays/s  exh")
for vname, vi, warm_s, best, mr, exh in rows:
    print(f"{vname:12s} {vi:4d} {warm_s:8.1f} {best:7.2f} {mr:8.2f} {exh:5d}")
