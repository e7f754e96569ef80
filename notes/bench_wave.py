"""Per-phase timing of one full path-traced wave at 1080p (paged kernel)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(cache, "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from brickmap_tpu import scene as scene_mod
from brickmap_tpu.app.benchmark import SUN_POSITION, benchmark_cameras
from brickmap_tpu.config import BrickmapConfig, GridConfig, RenderConfig
from brickmap_tpu.ops import sunsky as ss
from brickmap_tpu.pallas.paged import PagedScene
from brickmap_tpu.render import pathtrace

VIEW = int(sys.argv[1]) if len(sys.argv) > 1 else 1

cfg = BrickmapConfig(
    grid=GridConfig(grid_size=1024, grid_height=256),
    render=RenderConfig(width=1920, height=1080, max_bounces=3,
                        paged_rounds=192),
)
w, h = cfg.render.width, cfg.render.height

sc = scene_mod.load_scene(os.path.join(cache, "scene_small.npz"))
import ml_dtypes

psc = PagedScene(
    meta=jnp.asarray(np.load(os.path.join(cache, "paged_small_meta.npy"))),
    poolT=jnp.asarray(np.load(os.path.join(
        cache, "paged_small_poolT.npy")).view(ml_dtypes.bfloat16)),
    sc_dist=jnp.asarray(np.load(os.path.join(cache, "paged_small_scd.npy"))))

sun_dir = ss.sun_direction_from_position(jnp.asarray(SUN_POSITION))
cam = benchmark_cameras(0.25)[VIEW]
arrays = pathtrace.camera_arrays_for(cam, sun_dir, w, h)
cam_brick = jnp.asarray(cam.brick_position, jnp.int32)

perm, inv = pathtrace._tile_permutation(w, h)
perm_j = jnp.asarray(perm)


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0])


for rep in range(2):
    key = jax.random.PRNGKey(rep)
    t0 = time.perf_counter()
    st = pathtrace._primary_state(key, arrays, cfg, w, h, pixel_order=perm_j)
    sync(st["origins"])
    t1 = time.perf_counter()
    print(f"rep{rep} primary_state: {(t1-t0)*1e3:8.1f} ms")
    n = w * h
    for b in range(cfg.render.max_bounces + 1):
        tb = time.perf_counter()
        bucket = None if b == 0 else pathtrace._pick_bucket(
            pathtrace._live_count(st), 2 * n)
        tcount = time.perf_counter() - tb
        st = pathtrace._bounce_step(jnp.int32(b), jax.random.fold_in(key, b),
                                    st, psc, cam_brick,
                                    arrays["sun_direction"], cfg,
                                    bucket=bucket)
        sync(st["accum"])
        na = int(np.asarray(st["active"]).sum())
        ns = int(np.asarray(st["sh_active"]).sum())
        print(f"rep{rep} bounce {b}: {(time.perf_counter()-tb)*1e3:8.1f} ms "
              f"(count {tcount*1e3:.0f} ms, bucket {bucket}, "
              f"active {na}, shadow {ns})")
    tb = time.perf_counter()
    fbucket = pathtrace._pick_bucket(
        int(np.asarray(st["sh_active"]).sum()), n)
    out = pathtrace._final_shadow(st, psc, cam_brick, cfg, bucket=fbucket)
    sync(out[0])
    print(f"rep{rep} final_shadow: {(time.perf_counter()-tb)*1e3:8.1f} ms "
          f"(bucket {fbucket})")
