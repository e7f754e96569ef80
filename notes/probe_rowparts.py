"""Break down the row-granular sparse replay cost on the real TPU.

Pieces timed on one 8192-ray slice of the bench workload (small world,
K=8): geometry walk, row gather, extraction fwd, extraction+composite fwd,
full fwd+bwd slice, and the whole-frame scan program per-slice rate.

    PYTHONPATH=/root/repo:/root/.axon_site python notes/probe_rowparts.py
"""
import os
import sys
import time
from functools import partial

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
P = occ.shape[0]
print(f"{P} bricks", flush=True)

rng = np.random.default_rng(0)
C = 16384
K = 8
ox = rng.uniform(64, 960, C).astype(np.float32)
oy = rng.uniform(64, 960, C).astype(np.float32)
oz = np.full(C, 250.0, np.float32)
origins = np.stack([ox, oy, oz], 1)
dirs = rng.normal(size=(C, 3)).astype(np.float32)
dirs[:, 2] = -np.abs(dirs[:, 2]) - 1.0
dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
origins_j, dirs_j = jnp.asarray(origins), jnp.asarray(dirs)
bg = jnp.zeros((C, 3), jnp.float32)
tgt = jnp.full((C, 3), 0.4, jnp.float32)

segs = record_segments(origins_j, dirs_j, psc, grid, k_segments=K)
count = np.asarray(segs["count"])
print(f"segment count: mean {count.mean():.2f} p50 {np.median(count)} "
      f"max {count.max()}", flush=True)

field2 = sp._pack_field2(occ_j, alb_j)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))[0])


def timeit(name, fn, *args):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best*1e3:8.2f} ms", flush=True)
    return out


args_geom = (segs["o_cells"], dirs_j, segs["cells"], segs["nd"],
             segs["ncode"], segs["entry_normal"])


@jax.jit
def null(x):
    return x + 1.0


timeit("null program (tunnel overhead)", null, jnp.float32(1.0))

geom = jax.jit(partial(sp._segment_geom, grid=grid, k_segments=K))
slots, lin, mask = timeit("geometry (slots/lin/mask)", geom, *args_geom,
                          cellmap)

gather = jax.jit(lambda f3, s: jnp.take(f3, s, axis=0))
rows = timeit("row gather [C,K,2048]", gather, field2, slots)



nvox = 22


@jax.jit
def fwd_all(field2, slots, lin, mask, bg, tgt):
    rows = jnp.take(field2, slots, axis=0)
    vals = sp._extract_rows(rows, lin)
    o = vals[..., 0].reshape(C, K * nvox)
    a = vals[..., 1:].reshape(C, K * nvox, 3)
    rgb, _ = sp._composite_raw(o, a, mask.reshape(C, K * nvox), bg)
    return jnp.sum((rgb - tgt) ** 2)





@partial(jax.jit, static_argnames=("grid", "k_segments"))
def chunkbody(oc, dc, cells, nd, ncode, enorm, cellmap, field2, bg, tgt,
              grid, k_segments):
    return sp._row_chunk_grad(
        oc, dc, cells, nd, ncode, enorm, cellmap,
        jnp.zeros((), jnp.float32), jnp.zeros_like(field2), field2, bg, tgt,
        grid, k_segments)


timeit("_row_chunk_grad (row scatter)", chunkbody, segs["o_cells"], dirs_j,
       segs["cells"], segs["nd"], segs["ncode"], segs["entry_normal"],
       cellmap, field2, bg, tgt, grid, K)

timeit("record_segments (slice rays)",
       partial(record_segments, k_segments=K),
       origins_j, dirs_j, psc, grid)

# ---- round-5 pieces: the Pallas-extract path used by _row_chunk_grad ----
from brickmap_tpu.pallas.extract import extract_rows_pallas

lin2 = jnp.where(mask, lin, -1).reshape(C * K, nvox)
slots_flat = slots.reshape(-1)


@jax.jit
def gather2(field2, s):
    return jnp.take(field2, s, axis=0)          # [C*K, 2048]


rows2 = timeit("row gather [C*K, 2048]", gather2, field2, slots_flat)


@jax.jit
def pextract(rows2, lin2):
    return extract_rows_pallas(rows2, lin2, False)


timeit("pallas extract fwd", pextract, rows2, lin2)


@jax.jit
def fwd_pallas(rows2, lin2, mask, bg, tgt):
    vals = extract_rows_pallas(rows2, lin2, False)
    occ = vals[:, :nvox].reshape(C, K * nvox)
    alb = [vals[:, (1 + ch) * nvox:(2 + ch) * nvox].reshape(C, K * nvox)
           for ch in range(3)]
    occ_v = jnp.where(mask.reshape(C, K * nvox), jnp.clip(occ, 0, 1), 0.0)
    rgb, _ = sp._composite_core3(occ_v, *alb, bg)
    return jnp.sum((rgb - tgt) ** 2)


timeit("pallas fwd (extract+composite)", fwd_pallas, rows2, lin2, mask, bg,
       tgt)


@jax.jit
def bwd_rows(rows2, lin2, mask, bg, tgt):
    return jax.value_and_grad(fwd_pallas)(rows2, lin2, mask, bg, tgt)


_, d_rows = timeit("pallas fwd+bwd wrt rows", bwd_rows, rows2, lin2, mask,
                   bg, tgt)


@jax.jit
def scatter_only(field2, s, d):
    return jnp.zeros_like(field2).at[s].add(d)


timeit("row scatter-add [C*K, 2048]", scatter_only, field2, slots_flat,
       d_rows)
