"""Whole-frame phase timings of the row-replay sparse fwd+bwd (bench scale).

Phases of l2_loss_and_grads_sparse at the aux-bench workload (2.07 M rays,
small world, K=8), each synced: page-sort, record, count-sort, scan grads,
finalize — to see where the 1/0.23 Mrays/s budget goes.

    PYTHONPATH=/root/repo:/root/.axon_site python notes/probe_sparse_frame.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from brickmap_tpu import scene as scene_mod
from brickmap_tpu.config import GridConfig
from brickmap_tpu.diff import sparse as sp
from brickmap_tpu.pallas.paged import build_paged_scene
from brickmap_tpu.pallas.record import record_segments

grid = GridConfig(grid_size=1024, grid_height=256)
sc = scene_mod.load_scene(os.path.join(CACHE, "scene_small.npz"))
psc = jax.tree.map(jnp.asarray, build_paged_scene(sc, grid))
cellmap = jnp.asarray(sp.cell_pool_map(sc, grid))
occ, alb = sp.pool_fields_from_bitmask(sc)
occ_j = jnp.asarray(occ * 0.8)
alb_j = jnp.asarray(alb * 0.6)

rng = np.random.default_rng(0)
n = 1920 * 1080
K = 8
ox = rng.uniform(64, 960, n).astype(np.float32)
oy = rng.uniform(64, 960, n).astype(np.float32)
oz = np.full(n, 250.0, np.float32)
origin = jnp.asarray(np.stack([ox, oy, oz], 1))
dirs = rng.normal(size=(n, 3)).astype(np.float32)
dirs[:, 2] = -np.abs(dirs[:, 2]) - 1.0
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
direction = jnp.asarray(dirs)
background = jnp.zeros((n, 3), jnp.float32)
target = jnp.full((n, 3), 0.4, jnp.float32)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))[0])


marks = []


def mark(name):
    marks.append((name, time.perf_counter()))
    if len(marks) > 1:
        print(f"  ..{name}: {marks[-1][1] - marks[-2][1]:.1f}s", flush=True)


def run(tag):
    marks.clear()
    mark("start")
    s16 = float(grid.brick_size * grid.supergrid_cell_size)
    q = jnp.clip((origin / s16).astype(jnp.int32), 0,
                 max(grid.supergrid_xy, grid.supergrid_z) - 1)
    page = (q[:, 0] + q[:, 1] * grid.supergrid_xy
            + q[:, 2] * grid.supergrid_xy ** 2)
    octant = ((direction[:, 0] > 0).astype(jnp.int32)
              + 2 * (direction[:, 1] > 0).astype(jnp.int32)
              + 4 * (direction[:, 2] > 0).astype(jnp.int32))
    order = jnp.argsort(page * 8 + octant)
    o1 = jnp.take(origin, order, axis=0)
    d1 = jnp.take(direction, order, axis=0)
    bg1 = jnp.take(background, order, axis=0)
    tgt1 = jnp.take(target, order, axis=0)
    sync(o1)
    mark("page-sort")

    segs = record_segments(o1, d1, psc, grid, k_segments=K)
    sync(segs["cells"])
    mark("record")

    has_seg = segs["cells"][:, 0] >= 0
    order2 = jnp.argsort(~has_seg, stable=True)

    def take2(a):
        return jnp.take(a, order2, axis=0)

    parts = (take2(segs["o_cells"]), take2(d1), take2(segs["cells"]),
             take2(segs["nd"]), take2(segs["ncode"]),
             take2(segs["entry_normal"]), take2(bg1), take2(tgt1))
    sync(parts[0])
    mark("count-sort")

    field2 = sp._pack_field2(occ_j, alb_j)
    sse, dfield2 = sp._row_scan_grads_jit(
        parts[0], parts[1], parts[2], parts[3], parts[4], parts[5],
        cellmap, field2, parts[6], parts[7], grid, K, chunk=8192)
    sync(dfield2)
    mark("scan-grads")

    out = sp._finalize2(sse, dfield2, denom=n * 3, pshape=occ_j.shape)
    sync(out[1][0])
    mark("finalize")

    prev = marks[0][1]
    for nm, t in marks[1:]:
        print(f"{tag} {nm:12s} {1e3*(t-prev):9.1f} ms", flush=True)
        prev = t
    total = marks[-1][1] - marks[0][1]
    print(f"{tag} TOTAL        {total:9.2f} s  "
          f"({n/total/1e6:.3f} Mrays/s)", flush=True)


run("warm0")
run("warm1")
run("warm2")
