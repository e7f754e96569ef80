"""Per-phase timing of one render wave on the real TPU (full world).

Breaks render_wave into its host-orchestrated pieces and syncs (host-pull)
after each, reporting ms + live counts per bounce.

    python notes/profile_wave.py [--view 0] [--small] [--waves 2]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ap = argparse.ArgumentParser()
ap.add_argument("--view", type=int, default=0)
ap.add_argument("--small", action="store_true")
ap.add_argument("--waves", type=int, default=2)
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
from brickmap_tpu.pallas.paged import PagedScene
from brickmap_tpu.render import pathtrace
from brickmap_tpu.render.pathtrace import (
    _bounce_step, _final_shadow, _live_count, _pick_bucket, _primary_state,
    _tile_permutation)


def sync(x):
    # Slice ONE element on device first: pulling a whole [2M,3] leaf through
    # the tunnel costs ~300-400 ms and would inflate every phase number.
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[:1])[0])


tag = "small" if args.small else "full"
import ml_dtypes

meta = np.load(os.path.join(CACHE, f"paged_{tag}_meta.npy"))
poolT = np.load(os.path.join(CACHE, f"paged_{tag}_poolT.npy")).view(
    ml_dtypes.bfloat16)
scd = np.load(os.path.join(CACHE, f"paged_{tag}_scd.npy"))
scene = jax.tree.map(jnp.asarray, PagedScene(meta=meta, poolT=poolT,
                                             sc_dist=scd))
sync(scene.sc_dist)
print("scene uploaded", flush=True)

grid = GridConfig(grid_size=1024, grid_height=256) if args.small \
    else GridConfig()
render = RenderConfig(width=1920, height=1080, max_bounces=3,
                      max_top_steps=2048, paged_rounds=192)
cfg = BrickmapConfig(grid=grid, render=render)
scale = (grid.grid_size / 4096.0)
w, h = 1920, 1080
n = w * h

cam = benchmark_cameras(scale)[args.view]
sun_dir = ss.sun_direction_from_position(jnp.asarray(SUN_POSITION))
arrays = pathtrace.camera_arrays_for(cam, sun_dir, w, h)
cam_brick = jnp.asarray(cam.brick_position, jnp.int32)

perm, inv = _tile_permutation(w, h)
perm_j = jnp.asarray(perm)

for wave in range(args.waves):
    key = jax.random.PRNGKey(100 + wave)
    k_pix, k_loop = jax.random.split(key)
    t00 = time.perf_counter()

    t0 = time.perf_counter()
    st = _primary_state(k_pix, arrays, cfg, w, h, pixel_order=perm_j)
    sync(st["origins"])
    print(f"[w{wave}] primary_state      {1e3*(time.perf_counter()-t0):8.1f} ms",
          flush=True)

    for bounce in range(cfg.render.max_bounces + 1):
        k_loop, k_b = jax.random.split(k_loop)
        t0 = time.perf_counter()
        live = _live_count(st)
        t_live = time.perf_counter() - t0
        bucket = None if bounce == 0 else _pick_bucket(live, 2 * n)
        t0 = time.perf_counter()
        st = _bounce_step(jnp.int32(bounce), k_b, st, scene, cam_brick,
                          arrays["sun_direction"], cfg, bucket=bucket)
        sync(st["accum"])
        dt = time.perf_counter() - t0
        print(f"[w{wave}] bounce {bounce} live={live:8d} bucket="
              f"{bucket or 2*n:8d}  trace+shade {1e3*dt:8.1f} ms "
              f"(live pull {1e3*t_live:.0f} ms)", flush=True)

    t0 = time.perf_counter()
    fl = int(np.asarray(jnp.sum(st["sh_active"].astype(jnp.int32))))
    fbucket = _pick_bucket(fl, n)
    out = _final_shadow(st, scene, cam_brick, cfg, bucket=fbucket)
    sync(out[0])
    print(f"[w{wave}] final shadow live={fl:8d} bucket={fbucket:8d}  "
          f"{1e3*(time.perf_counter()-t0):8.1f} ms", flush=True)
    print(f"[w{wave}] TOTAL {1e3*(time.perf_counter()-t00):8.1f} ms",
          flush=True)
