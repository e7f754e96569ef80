"""Where does the 2-4 s/batch full-world process_requests cost live?

ROADMAP §2b: suspects are the paged poolT column scatter (donated 2.1 GB
buffer through a tunnel backend that may not honor donation) and the
host-side bookkeeping.  Times each device scatter of the upload path in
isolation (synced, min-of-3) plus the whole process_requests, on the full
world with a real 1024-brick batch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python notes/probe_stream_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    from brickmap_tpu.stream import StreamingScene, _scatter_pool_cols, \
        _scatter_rows

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))[0])

    grid = GridConfig()
    sc = scene_mod.load_scene(os.path.join(CACHE, "scene_full.npz"))
    t0 = time.time()
    mgr = StreamingScene(sc, grid, starting_capacity=256, paged=True)
    sync(mgr._paged.poolT)
    print(f"manager init {time.time()-t0:.1f}s", flush=True)

    # A real batch: 1024 unloaded surface bricks.
    iv = np.asarray(sc.index_volume)
    occ = (iv >> 29) != 0
    surf_z = occ.shape[0] - 1 - np.argmax(occ[::-1], axis=0)
    has = occ.any(axis=0)
    ys, xs = np.nonzero(has)
    rng = np.random.default_rng(3)
    sel = rng.choice(ys.size, 4096, replace=False)
    reqs = [(int(xs[i]), int(ys[i]), int(surf_z[ys[i], xs[i]]))
            for i in sel]

    # ---- isolated scatter timings (shape-matched to the real batch) -----
    q = mgr.queue_size
    import ml_dtypes
    idx = jnp.asarray(rng.integers(0, 4096 * 512, q).astype(np.int32))
    cols = jnp.asarray(rng.random((q, 64)).astype(ml_dtypes.bfloat16))
    rows16 = jnp.asarray(rng.integers(0, 2 ** 20, (q, 16)).astype(np.uint32))

    def timeit(name, fn, *a):
        out = fn(*a)
        sync(out)                       # compile + first
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*a)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best*1e3:8.1f} ms", flush=True)
        return out

    # poolT column scatter — donated 2.1 GB buffer; reassign so the donated
    # input is dropped like the real call site does.
    poolT = mgr._paged.poolT
    pT = poolT
    def pool_call(p):
        return _scatter_pool_cols(p, idx, cols)
    out = pool_call(pT)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = pool_call(out)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{'poolT col scatter (donated)':28s} {best*1e3:8.1f} ms",
          flush=True)
    mgr._paged = type(mgr._paged)(meta=mgr._paged.meta, poolT=out,
                                  sc_dist=mgr._paged.sc_dist)

    # index-volume word scatter (9 GB logical? no - [cz,cy,cx] i32 ~128MB)
    cz, cy, cx = mgr._iv.shape
    flat = mgr._dev_iv.reshape(-1)
    words = jnp.asarray(rng.integers(0, 2 ** 20, q).astype(np.uint32))
    timeit("index-volume scatter", lambda: _scatter_rows(
        flat, idx, words))
    timeit("block-words scatter", lambda: _scatter_rows(
        mgr._dev_bw.reshape(-1), idx, words))
    timeit("pool row scatter", lambda: _scatter_rows(
        mgr._dev_pool, idx % mgr._dev_pool.shape[0], rows16))
    timeit("meta plane scatter", lambda: _scatter_rows(
        mgr._paged.meta.reshape(-1), idx,
        jnp.asarray(rng.integers(0, 2 ** 20, q).astype(np.int32))))

    # ---- whole process_requests batches (host + device) -----------------
    for rep in range(3):
        batch = reqs[rep * 1024:(rep + 1) * 1024]
        t0 = time.perf_counter()
        n = mgr.process_requests(batch)
        sync(mgr._paged.poolT)
        print(f"process_requests batch {rep}: {n} uploads  "
              f"{(time.perf_counter()-t0)*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
