"""Fuzz record_segments vs trace_rays first-cell parity (debug aid)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from brickmap_tpu import scene as scene_mod
from brickmap_tpu.config import GridConfig
from brickmap_tpu.ops.traverse import trace_rays
from brickmap_tpu.pallas.paged import build_paged_scene
from brickmap_tpu.pallas.record import record_segments

GRID = GridConfig(grid_size=128, grid_height=128)

rng0 = np.random.default_rng(1234)
dense = np.zeros((128, 128, 128), bool)
dense[16:32, 32:64, 32:64] = rng0.random((16, 32, 32)) < 0.35
dense[48:56, 80:96, 40:56] = True
sc = scene_mod.scene_from_dense(dense, GRID)
psc = jax.tree.map(jnp.asarray, build_paged_scene(sc, GRID))

bad = 0
for seed in range(20):
    rng = np.random.default_rng(seed)
    n = 256
    origins = np.array([[64.0, 64.0, 120.0]] * n, np.float32)
    origins += rng.normal(scale=8.0, size=(n, 3)).astype(np.float32)
    aims = np.asarray((48, 48, 24), np.float32) + rng.normal(
        scale=40.0, size=(n, 3)).astype(np.float32)
    d = aims - origins
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = d.astype(np.float32)

    segs = record_segments(jnp.asarray(origins), jnp.asarray(dirs), psc,
                           GRID, k_segments=8, interpret=True)
    hard = trace_rays(jnp.asarray(origins), jnp.asarray(dirs),
                      jnp.asarray(sc.index_volume),
                      jnp.asarray(sc.pool_words), jnp.asarray(sc.pool_base),
                      jnp.zeros(3, jnp.int32), GRID, max_iters=512)
    count = np.asarray(segs["count"])
    cells = np.asarray(segs["cells"])
    hit = np.asarray(hard["hit"])
    t = np.asarray(hard["t"])
    nrm = np.asarray(hard["normal"])
    for i in np.nonzero(hit)[0]:
        if count[i] < 1:
            print(f"seed {seed} ray {i}: hard hit but count=0")
            bad += 1
            continue
        c = int(count[i])
        p = origins[i] + dirs[i] * t[i]
        cands = {tuple(np.floor((p - nrm[i] * e) / 8.0).astype(int))
                 for e in (1e-3, 5e-2, -5e-2)}
        got = {(int(w) & 0x3FF, (int(w) >> 10) & 0x3FF,
                (int(w) >> 20) & 0x3FF) for w in cells[i, :c]}
        if c < 8 and not (got & cands):
            print(f"seed {seed} ray {i}: rec {sorted(got)} vs hard "
                  f"{sorted(cands)} o={origins[i]} d={dirs[i]} "
                  f"t={t[i]:.4f} n={nrm[i]}")
            bad += 1
print("bad:", bad)
