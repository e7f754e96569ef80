"""Hardware parity check: compiled kernels vs oracle on the small box scene.

Run on the real TPU whenever pallas/traverse3.py or pallas/record.py change
(interpret-mode tests cannot catch DMA/semaphore bugs); writes the artifact
``notes/hw_parity_r{N}.txt`` when --artifact N is given.

    PYTHONPATH=/root/repo:/root/.axon_site python notes/check_hw_parity.py \
        --artifact 4
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from brickmap_tpu import scene as scene_mod
from brickmap_tpu.config import GridConfig
from brickmap_tpu.ops import dda_ref
from brickmap_tpu.pallas.paged import build_paged_scene, build_slot_tables
from brickmap_tpu.pallas.record import record_segments
from brickmap_tpu.pallas.traverse3 import trace_rays_paged

ap = argparse.ArgumentParser()
ap.add_argument("--artifact", type=int, default=None,
                help="write notes/hw_parity_r{N}.txt")
args = ap.parse_args()

GRID = GridConfig(grid_size=128, grid_height=128)
CAM = np.array([0, 0, 0], np.int64)

dense = np.zeros((128, 128, 128), bool)
dense[16:48, 32:96, 32:96] = True
sc = scene_mod.scene_from_dense(dense, GRID)
psc = jax.tree.map(jnp.asarray, build_paged_scene(sc, GRID))
slot_tables = tuple(jnp.asarray(t) for t in build_slot_tables(sc, GRID))

rng = np.random.default_rng(3)
n = 512
origins = rng.uniform([-20, -20, -20], [148, 148, 148], (n, 3)).astype(
    np.float32)
directions = rng.normal(size=(n, 3)).astype(np.float32)
directions /= np.linalg.norm(directions, axis=1, keepdims=True)

lines = []


def report(msg):
    print(msg, flush=True)
    lines.append(msg)


ref = [dda_ref.intersect_voxel(origins[i], directions[i], sc, GRID, CAM)
       for i in range(n)]

for prefetch in (True, False):
    res = trace_rays_paged(jnp.asarray(origins), jnp.asarray(directions),
                           psc, jnp.asarray(CAM, jnp.int32), GRID,
                           prefetch=prefetch)
    hits = np.asarray(res["hit"])
    ts = np.asarray(res["t"])
    exh = np.asarray(res["exhausted"])
    bad = 0
    for i in range(n):
        r = ref[i]
        ok = (bool(hits[i]) == r.hit
              and (not r.hit or abs(float(ts[i]) - r.distance) < 2e-2))
        if not ok:
            bad += 1
            if bad <= 12:
                report(f"  ray {i}: o={origins[i]} d={directions[i]} "
                       f"hw(hit={bool(hits[i])}, t={float(ts[i]):.3f}, "
                       f"exh={bool(exh[i])}) "
                       f"ref(hit={r.hit}, t={r.distance:.3f})")
    report(f"trace_rays_paged prefetch={prefetch}: {bad}/{n} mismatches, "
           f"{exh.sum()} exhausted")

# Record kernel: compiled hardware run vs the interpret-mode reference
# semantics (interpret itself is oracle-parity-tested in tests/).
hw = record_segments(jnp.asarray(origins), jnp.asarray(directions), psc,
                     GRID, k_segments=8, slot_tables=slot_tables)
it = record_segments(jnp.asarray(origins), jnp.asarray(directions), psc,
                     GRID, k_segments=8, slot_tables=slot_tables,
                     interpret=True)
bad = 0
for key in ("cells", "nd", "ncode", "slot", "count"):
    a, b = np.asarray(hw[key]), np.asarray(it[key])
    if a.dtype.kind == "f":
        m = ~np.isclose(a, b, atol=1e-5)
    else:
        m = a != b
    nbad = int(np.any(m.reshape(n, -1), axis=1).sum())
    if nbad:
        report(f"  record[{key}]: {nbad}/{n} rays differ")
    bad = max(bad, nbad)
report(f"record_segments hw-vs-interpret: {bad}/{n} mismatches")

if args.artifact is not None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"hw_parity_r{args.artifact}.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")
