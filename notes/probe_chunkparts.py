"""Time the sparse chunk-grad program's pieces on the TPU.

Which dominates: the O(V^2) offsets arithmetic in _segment_gidx, the
[C,V,4] gather, the scatter-add, or the composite backward?
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

from brickmap_tpu.config import GridConfig
from brickmap_tpu.diff import sparse as sp

grid = GridConfig(grid_size=1024, grid_height=256)
C, K = 262144, 8
P = 255948
pvox = P * 512
rng = np.random.default_rng(0)

oc = jnp.asarray(rng.uniform(8, 120, (C, 3)).astype(np.float32))
dc = jnp.asarray((rng.normal(size=(C, 3)) + 0.1).astype(np.float32))
cells = jnp.asarray(rng.integers(0, 1 << 24, (C, K), dtype=np.int32))
nds = jnp.asarray(rng.uniform(0, 50, (C, K)).astype(np.float32))
ncodes = jnp.asarray(rng.integers(-1, 3, (C, K), dtype=np.int32))
enorm = jnp.zeros((C, 3), jnp.float32)
cellmap = jnp.asarray(rng.integers(-1, P, (32, 128, 128), dtype=np.int32))
field = jnp.asarray(rng.uniform(0, 1, (pvox, 4)).astype(np.float32))
bg = jnp.zeros((C, 3), jnp.float32)
tgt = jnp.full((C, 3), 0.4, jnp.float32)


def pull(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[:1])[0])


@jax.jit
def just_walk(oc, dc, cells, nds, ncodes, enorm, cellmap):
    g, m = sp._segment_gidx(oc, dc, cells, nds, ncodes, enorm, cellmap,
                            grid, K, pvox)
    return g.sum(), m.sum()


@jax.jit
def walk_and_gather(oc, dc, cells, nds, ncodes, enorm, cellmap, field):
    g, m = sp._segment_gidx(oc, dc, cells, nds, ncodes, enorm, cellmap,
                            grid, K, pvox)
    fld = jnp.take(field, g, axis=0)
    return fld.sum()


@jax.jit
def full_grad(oc, dc, cells, nds, ncodes, enorm, cellmap, field, bg, tgt):
    sse, df = sp._chunk_grad_acc(
        oc, dc, cells, nds, ncodes, enorm, cellmap,
        jnp.zeros((), jnp.float32), jnp.zeros_like(field), field, bg, tgt,
        grid, K)
    return sse, df


def timeit(name, fn, *args, reps=3):
    pull(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        pull(fn(*args))
    print(f"{name}: {(time.time()-t0)/reps*1e3:.0f} ms", flush=True)


timeit("walk (segment_gidx only)", just_walk, oc, dc, cells, nds, ncodes,
       enorm, cellmap)
timeit("walk + [C,V,4] gather   ", walk_and_gather, oc, dc, cells, nds,
       ncodes, enorm, cellmap, field)
timeit("full chunk grad         ", full_grad, oc, dc, cells, nds, ncodes,
       enorm, cellmap, field, bg, tgt)
