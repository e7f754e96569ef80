"""Prime bench.py's full-world caches (scene npz + paged tables), CPU-only."""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from brickmap_tpu import scene as scene_mod
from brickmap_tpu.config import BrickmapConfig, GridConfig
from brickmap_tpu.pallas.paged import build_paged_scene

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache")
os.makedirs(CACHE, exist_ok=True)

cfg = BrickmapConfig(grid=GridConfig())
cache_path = os.path.join(CACHE, "scene_full.npz")
t0 = time.time()
if os.path.exists(cache_path):
    sc = scene_mod.load_scene(cache_path)
    print(f"scene loaded in {time.time()-t0:.1f}s", flush=True)
else:
    sc = scene_mod.generate_terrain_scene(cfg.grid)
    print(f"scene generated in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    scene_mod.save_scene(cache_path, sc)
    print(f"scene saved in {time.time()-t0:.1f}s", flush=True)

base = os.path.join(CACHE, "paged_full")
if not os.path.exists(base + "_meta.npy"):
    t0 = time.time()
    psc = build_paged_scene(sc, cfg.grid)
    print(f"paged tables built in {time.time()-t0:.1f}s "
          f"(poolT {psc.poolT.nbytes/1e6:.0f} MB)", flush=True)
    t0 = time.time()
    np.save(base + "_meta.npy", np.asarray(psc.meta))
    np.save(base + "_poolT.npy", np.asarray(psc.poolT).view(np.uint16))
    np.save(base + "_scd.npy", np.asarray(psc.sc_dist))
    print(f"paged tables saved in {time.time()-t0:.1f}s", flush=True)
else:
    print("paged tables already cached", flush=True)
print("done", flush=True)
