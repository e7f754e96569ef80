"""Two-tile (16,128) kernel state A/B on the real TPU (round 5b).

ROADMAP §1's last untried >20% forward candidate: a (16,128) ray tile
amortizes each round's fixed vote+DMA cost over 2048 lanes instead of
1024, at the risk of more rounds/tile (page diversity doubles per tile).

Workload: a synthetic bounce-1-like set — cosine-hemisphere rays from
terrain surface cells inside a view-footprint window, compacted and
(page, octant)-sorted exactly like the production wave.  Same-session
interleaved timing (tile8, tile16, tile8, ...), K pipelined calls per
sync (the pallas_brick methodology — per-call host syncs measure the
tunnel, not the kernel).

Run: PYTHONPATH=/root/repo:/root/.axon_site python notes/probe_tilerows.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")

N_RAYS = 2048 * 1024          # divisible by both tile sizes
PIPELINE = 3                  # calls per host sync
REPS = 3                      # sync batches per variant pass
ROUNDS = 192                  # production budget (bench RenderConfig)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from brickmap_tpu import scene as scene_mod
    from brickmap_tpu.config import GridConfig, RenderConfig
    from brickmap_tpu.pallas.paged import build_paged_scene_device
    from brickmap_tpu.pallas.traverse3 import trace_rays_paged

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))[0])

    grid = GridConfig()
    sc = scene_mod.load_scene(os.path.join(CACHE, "scene_full.npz"))
    meta = np.load(os.path.join(CACHE, "paged_full_meta.npy"))
    scd = np.load(os.path.join(CACHE, "paged_full_scd.npy"))
    scene = build_paged_scene_device(sc, grid, meta=meta, sc_dist=scd)
    sync(scene.poolT)
    print("scene on device", flush=True)

    # ---- synthetic bounce-1 set: surface cells in a footprint window ----
    iv = np.asarray(sc.index_volume)               # (cz, cy, cx) index words
    occ = (iv >> 29) != 0
    surf_z = occ.shape[0] - 1 - np.argmax(occ[::-1], axis=0)   # (cy, cx)
    has = occ.any(axis=0)
    rng = np.random.default_rng(7)
    # Footprint: a 2048-voxel (256-cell) window mid-world (view-0-like).
    c0 = occ.shape[2] // 2 - 128
    ys, xs = np.meshgrid(np.arange(c0, c0 + 256), np.arange(c0, c0 + 256),
                         indexing="ij")
    mask = has[ys, xs]
    ys, xs = ys[mask], xs[mask]
    sel = rng.integers(0, ys.size, N_RAYS)
    cy, cx = ys[sel], xs[sel]
    cz = surf_z[cy, cx]
    bsz = grid.brick_size
    o = np.stack([(cx + rng.random(N_RAYS)) * bsz,
                  (cy + rng.random(N_RAYS)) * bsz,
                  (cz + 1) * bsz + 0.5], axis=1).astype(np.float32)
    # Cosine-weighted upward hemisphere.
    u1, u2 = rng.random(N_RAYS), rng.random(N_RAYS)
    r = np.sqrt(u1)
    phi = 2 * np.pi * u2
    d = np.stack([r * np.cos(phi), r * np.sin(phi),
                  np.sqrt(np.maximum(1 - u1, 0))], axis=1).astype(np.float32)

    # Production compaction order: (page, octant).
    s16 = float(bsz * grid.supergrid_cell_size)
    q = np.clip((o / s16).astype(np.int64), 0,
                max(grid.supergrid_xy, grid.supergrid_z) - 1)
    page = q[:, 0] + q[:, 1] * grid.supergrid_xy \
        + q[:, 2] * grid.supergrid_xy ** 2
    octant = ((d[:, 0] > 0) + 2 * (d[:, 1] > 0)
              + 4 * (d[:, 2] > 0)).astype(np.int64)
    order = np.argsort(page * 8 + octant, kind="stable")
    oj, dj = jnp.asarray(o[order]), jnp.asarray(d[order])
    print(f"{N_RAYS} rays over {np.unique(page).size} pages", flush=True)

    render = RenderConfig()
    cam_brick = jnp.zeros(3, jnp.int32)

    def call(tile_rows):
        return trace_rays_paged(
            oj, dj, scene, cam_brick, grid, max_page_rounds=ROUNDS,
            march_steps=render.paged_march, phase_iters=render.paged_phases,
            transit_iters=render.paged_transit,
            pages_per_round=render.paged_fanout,
            pool_fanout=render.paged_pool_fanout,
            pool_slab=render.paged_pool_slab,
            prefetch=render.paged_prefetch, tile_rows=tile_rows)

    stats = {}
    for tr in (8, 16):
        t0 = time.time()
        res = call(tr)
        sync(res["hit"])
        hits = int(np.asarray(res["hit"]).sum())
        exh = int(np.asarray(res["exhausted"]).sum())
        rounds = int(np.asarray(res["iters"]))
        print(f"tile{tr}: compile+first {time.time()-t0:.1f}s  "
              f"hits {hits}  exhausted {exh}  max-rounds {rounds}",
              flush=True)
        stats[tr] = dict(hits=hits, exh=exh, best=1e9)

    # Interleaved timed passes, PIPELINE calls per sync.
    for rep in range(REPS):
        for tr in (8, 16):
            t0 = time.perf_counter()
            for _ in range(PIPELINE):
                res = call(tr)
            sync(res["hit"])
            dt = (time.perf_counter() - t0) / PIPELINE
            stats[tr]["best"] = min(stats[tr]["best"], dt)
            print(f"rep {rep} tile{tr}: {dt*1e3:8.1f} ms/call  "
                  f"{N_RAYS/dt/1e6:6.2f} Mrays/s", flush=True)

    print("\nsummary:", flush=True)
    for tr in (8, 16):
        s = stats[tr]
        print(f"tile{tr}: best {s['best']*1e3:8.1f} ms  "
              f"{N_RAYS/s['best']/1e6:6.2f} Mrays/s  hits {s['hits']}  "
              f"exhausted {s['exh']}", flush=True)
    if stats[8]["hits"] != stats[16]["hits"]:
        print("WARNING: hit-count mismatch between tilings", flush=True)


if __name__ == "__main__":
    main()
