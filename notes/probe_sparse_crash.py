"""Isolate the sparse-bwd TPU worker crash: record -> composite -> grad.

Mirrors bench.py's _sparse_bwd_bench exactly; prints STAGE markers so the
first missing marker identifies the faulting phase.  Run on the real TPU:

    python notes/probe_sparse_crash.py [--n N] [--k K] [--stage all|record|fwd|grad]
"""
import argparse
import os
import sys
import time

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1920 * 1080)
ap.add_argument("--k", type=int, default=8)
ap.add_argument("--stage", default="all")
args = ap.parse_args()

import jax
import jax.numpy as jnp
import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
os.makedirs(os.path.join(CACHE, "xla"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from brickmap_tpu import scene as scene_mod
from brickmap_tpu.config import GridConfig
from brickmap_tpu.diff.sparse import (
    cell_pool_map, composite_sparse, pool_fields_from_bitmask)
from brickmap_tpu.pallas.paged import build_paged_scene
from brickmap_tpu.pallas.record import record_segments

print("devices:", jax.devices(), file=sys.stderr)
grid = GridConfig(grid_size=1024, grid_height=256)
sc = scene_mod.load_scene(os.path.join(CACHE, "scene_small.npz"))
psc = jax.tree.map(jnp.asarray, build_paged_scene(sc, grid))
cellmap = jnp.asarray(cell_pool_map(sc, grid))
occ, alb = pool_fields_from_bitmask(sc)
occ_j = jnp.asarray(occ * 0.8)
alb_j = jnp.asarray(alb * 0.6)
del occ, alb
print(f"STAGE setup ok  P={occ_j.shape[0]}", flush=True)

rng = np.random.default_rng(0)
n = args.n
ox = rng.uniform(64, 960, n).astype(np.float32)
oy = rng.uniform(64, 960, n).astype(np.float32)
oz = np.full(n, 250.0, np.float32)
origins = jnp.asarray(np.stack([ox, oy, oz], 1))
dirs = rng.normal(size=(n, 3)).astype(np.float32)
dirs[:, 2] = -np.abs(dirs[:, 2]) - 1.0
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
dirs = jnp.asarray(dirs)
bg = jnp.zeros((n, 3), jnp.float32)
tgt = jnp.full((n, 3), 0.4, jnp.float32)

if args.stage != "gradonly":
    t0 = time.time()
    segs = record_segments(origins, dirs, psc, grid, k_segments=args.k)
    cnt = int(jnp.sum(segs["count"]))
    print(f"STAGE record ok  total-segs={cnt}  {time.time()-t0:.1f}s",
          flush=True)
    if args.stage == "record":
        sys.exit(0)

if args.stage != "gradonly":
    t0 = time.time()
    rgb, trans = composite_sparse(segs["o_cells"], dirs, segs, cellmap,
                                  occ_j, alb_j, bg, grid, k_segments=args.k)
    m = float(jnp.mean(rgb))
    print(f"STAGE fwd ok  mean={m:.4f}  {time.time()-t0:.1f}s", flush=True)
    if args.stage == "fwd":
        sys.exit(0)


from brickmap_tpu.diff.sparse import l2_loss_and_grads_sparse

t0 = time.time()
loss, grads = l2_loss_and_grads_sparse(origins, dirs, psc, cellmap, occ_j,
                                       alb_j, bg, tgt, grid,
                                       k_segments=args.k)
lv = float(loss)
g0 = float(jnp.sum(jnp.abs(grads[0])))
print(f"STAGE grad ok  loss={lv:.5f} |g_occ|={g0:.3f}  "
      f"{time.time()-t0:.1f}s", flush=True)

# Warm repeat: steady-state fwd+bwd throughput (incl. record).
for rep in range(2):
    t0 = time.time()
    loss, grads = l2_loss_and_grads_sparse(origins, dirs, psc, cellmap,
                                           occ_j, alb_j, bg, tgt, grid,
                                           k_segments=args.k)
    lv = float(loss)
    dt = time.time() - t0
    print(f"STAGE warm{rep} ok  loss={lv:.5f}  {dt:.1f}s  "
          f"{n/dt/1e6:.3f} Mrays/s fwd+bwd", flush=True)

# Breakdown: sorted record alone vs the grad replay (warm).
import jax.numpy as jnp2  # noqa: E402

s16 = float(grid.brick_size * grid.supergrid_cell_size)
q = jnp.clip((origins / s16).astype(jnp.int32), 0,
             max(grid.supergrid_xy, grid.supergrid_z) - 1)
pagek = (q[:, 0] + q[:, 1] * grid.supergrid_xy
         + q[:, 2] * grid.supergrid_xy ** 2)
octk = ((dirs[:, 0] > 0).astype(jnp.int32)
        + 2 * (dirs[:, 1] > 0).astype(jnp.int32)
        + 4 * (dirs[:, 2] > 0).astype(jnp.int32))
order = jnp.argsort(pagek * 8 + octk)
o_s = jnp.take(origins, order, axis=0)
d_s = jnp.take(dirs, order, axis=0)
float(np.asarray(o_s.reshape(-1)[:1])[0])
from brickmap_tpu.pallas.record import record_segments as _rs  # noqa: E402

for rep in range(2):
    t0 = time.time()
    segs = _rs(o_s, d_s, psc, grid, k_segments=args.k)
    float(np.asarray(segs["count"].reshape(-1)[:1])[0])
    print(f"STAGE record-sorted{rep}  {time.time()-t0:.1f}s", flush=True)
