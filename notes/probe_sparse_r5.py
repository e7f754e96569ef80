"""Round-5 sparse fwd+bwd breakdown at the bench workload (real TPU).

Times each phase of the host row-replay path separately on the small
(1024^2x256) world at 2.07M rays, K=8 — the exact aux sparse-bwd workload:
record kernel, page sort, count sort, live-prefix scan-grad, and the
steady-state cached step.  Identifies the biggest line item for the >=0.5
Mrays/s push (VERDICT r5 item 3).

Run: PYTHONPATH=/root/repo:/root/.axon_site python notes/probe_sparse_r5.py
"""

import os
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".bench_cache")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from brickmap_tpu import scene as scene_mod
    from brickmap_tpu.config import GridConfig
    from brickmap_tpu.diff import sparse as sp
    from brickmap_tpu.pallas.paged import build_paged_scene_device
    from brickmap_tpu.pallas.record import record_segments

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))[0])

    def timed(label, fn, reps=2):
        out = fn()
        sync(out)
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{label:28s} {best*1e3:9.1f} ms", flush=True)
        return out, best

    grid = GridConfig(grid_size=1024, grid_height=256)
    sc = scene_mod.load_scene(os.path.join(CACHE, "scene_small.npz"))
    psc = build_paged_scene_device(sc, grid)
    sync(psc.poolT)
    cellmap = jnp.asarray(sp.cell_pool_map(sc, grid))
    occ, alb = sp.pool_fields_from_bitmask(sc)
    occ_j = jnp.asarray(occ * 0.8)
    alb_j = jnp.asarray(alb * 0.6)
    print(f"P = {occ.shape[0]} resident bricks", flush=True)

    rng = np.random.default_rng(0)
    n = 1920 * 1080
    K = 8
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

    (o_s, d_s, bg_s, tgt_s), t_sort = timed(
        "page_sort", lambda: sp._page_sort(origins, dirs, bg, tgt, grid))
    segs, t_rec = timed(
        "record_segments", lambda: record_segments(o_s, d_s, psc, grid,
                                                   k_segments=K))
    geo_n, t_cnt = timed(
        "count_sort", lambda: sp._count_sort(
            segs["cells"], segs["o_cells"], d_s, segs["nd"], segs["ncode"],
            segs["entry_normal"], bg_s, tgt_s))
    geo, n_live_dev = geo_n
    n_live = int(n_live_dev)
    print(f"n_live = {n_live} ({100.0*n_live/n:.1f}%)", flush=True)

    field2 = sp._pack_field2(occ_j, alb_j)
    chunkv = 16384
    bucket = chunkv * max(1, -(-n // (8 * chunkv)))
    n_run = min(n, -(-max(n_live, 1) // bucket) * bucket)
    print(f"n_run = {n_run}", flush=True)

    def scan_grad():
        return sp._row_scan_grads_jit(
            geo[0][:n_run], geo[1][:n_run], geo[2][:n_run], geo[3][:n_run],
            geo[4][:n_run], geo[5][:n_run], cellmap, field2,
            geo[6][:n_run], geo[7][:n_run], grid, K, chunk=chunkv)

    (sse, dfield2), t_grad = timed("row_scan_grads", scan_grad)

    total = t_sort + t_rec + t_cnt + t_grad
    print(f"{'TOTAL':28s} {total*1e3:9.1f} ms  "
          f"-> {n / total / 1e6:.3f} Mrays/s", flush=True)
    print(f"{'cached step (scan only)':28s} {t_grad*1e3:9.1f} ms  "
          f"-> {n / t_grad / 1e6:.3f} Mrays/s", flush=True)
    per_slice = t_grad / (n_run / chunkv)
    print(f"scan: {n_run // chunkv} slices x {per_slice*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
