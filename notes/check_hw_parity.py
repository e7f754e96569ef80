"""Hardware parity check: compiled kernel vs oracle on the small box scene."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from brickmap_tpu import scene as scene_mod
from brickmap_tpu.config import GridConfig
from brickmap_tpu.ops import dda_ref
from brickmap_tpu.pallas.paged import build_paged_scene
from brickmap_tpu.pallas.traverse3 import trace_rays_paged

GRID = GridConfig(grid_size=128, grid_height=128)
CAM = np.array([0, 0, 0], np.int64)

dense = np.zeros((128, 128, 128), bool)
dense[16:48, 32:96, 32:96] = True
sc = scene_mod.scene_from_dense(dense, GRID)
psc = jax.tree.map(jnp.asarray, build_paged_scene(sc, GRID))

rng = np.random.default_rng(3)
n = 512
origins = rng.uniform([-20, -20, -20], [148, 148, 148], (n, 3)).astype(np.float32)
directions = rng.normal(size=(n, 3)).astype(np.float32)
directions /= np.linalg.norm(directions, axis=1, keepdims=True)

res = trace_rays_paged(jnp.asarray(origins), jnp.asarray(directions), psc,
                       jnp.asarray(CAM, jnp.int32), GRID)
hits = np.asarray(res["hit"]); ts = np.asarray(res["t"])
ns = np.asarray(res["normal"]); exh = np.asarray(res["exhausted"])

bad = 0
for i in range(n):
    r = dda_ref.intersect_voxel(origins[i], directions[i], sc, GRID, CAM)
    ok = (bool(hits[i]) == r.hit
          and (not r.hit or abs(float(ts[i]) - r.distance) < 2e-2))
    if not ok:
        bad += 1
        if bad <= 12:
            print(f"ray {i}: o={origins[i]} d={directions[i]} "
                  f"hw(hit={bool(hits[i])}, t={float(ts[i]):.3f}, "
                  f"exh={bool(exh[i])}) "
                  f"ref(hit={r.hit}, t={r.distance:.3f})")
print(f"{bad}/{n} mismatches, {exh.sum()} exhausted")
