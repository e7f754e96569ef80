"""Standalone TPU benchmark of the hierarchical Pallas kernel vs the XLA path.

Loads the cached 1024-world terrain scene, traces the 9 benchmark viewpoints'
primary rays at 640x360 with trace_rays_paged, and compares against
trace_rays_chunked (round-1 production path).
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=9)
    ap.add_argument("--xla", action="store_true", help="also time XLA path")
    ap.add_argument("--secondary", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="compare hit/t between paths")
    ap.add_argument("--rounds", type=int, default=96)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--march", type=int, default=12)
    ap.add_argument("--phases", type=int, default=2)
    ap.add_argument("--fanout", type=int, default=4)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".bench_cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(cache, "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from brickmap_tpu import scene as scene_mod
    from brickmap_tpu.app.benchmark import SUN_POSITION, benchmark_cameras
    from brickmap_tpu.config import BrickmapConfig, GridConfig, RenderConfig
    from brickmap_tpu.ops import sunsky as ss
    from brickmap_tpu.pallas.paged import build_paged_scene
    from brickmap_tpu.pallas.traverse3 import trace_rays_paged
    from brickmap_tpu.render import pathtrace

    cfg = BrickmapConfig(
        grid=GridConfig(grid_size=1024, grid_height=256),
        render=RenderConfig(width=args.width, height=args.height, max_bounces=0,
                            max_top_steps=768),
    )
    w, h = cfg.render.width, cfg.render.height
    n = w * h

    cache_path = os.path.join(cache, "scene_small.npz")
    t0 = time.time()
    sc = scene_mod.load_scene(cache_path)
    print(f"scene loaded {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    psc_np = build_paged_scene(sc, cfg.grid)
    print(f"paged build {time.time()-t0:.1f}s  "
          f"poolT {psc_np.poolT.nbytes/1e6:.0f} MB "
          f"meta {psc_np.meta.nbytes/1e6:.0f} MB", file=sys.stderr)
    t0 = time.time()
    psc = jax.tree.map(jnp.asarray, psc_np)
    float(np.asarray(psc.sc_dist).ravel()[0])
    print(f"upload {time.time()-t0:.1f}s", file=sys.stderr)

    jsc = scene_mod.VoxelScene(
        index_volume=jnp.asarray(sc.index_volume),
        pool_words=jnp.asarray(sc.pool_words),
        pool_base=jnp.asarray(sc.pool_base),
        block_words=jnp.asarray(sc.block_words),
    )

    sun_dir = ss.sun_direction_from_position(jnp.asarray(SUN_POSITION))
    scale = 1024.0 / 4096.0

    perm, _ = pathtrace._tile_permutation(w, h)
    perm_j = jnp.asarray(perm)

    def primaries(cam, key):
        arrays = pathtrace.camera_arrays_for(cam, sun_dir, w, h)
        st = pathtrace._primary_state(key, arrays, cfg, w, h,
                                      pixel_order=perm_j)
        return st["origins"], st["dirs"], \
            jnp.asarray(cam.brick_position, jnp.int32)

    totals = {"paged": 0.0, "xla": 0.0}
    rays = {"paged": 0, "xla": 0}
    for vi, cam in enumerate(benchmark_cameras(scale)[:args.views]):
        key = jax.random.PRNGKey(vi)
        o, d, cb = primaries(cam, key)

        r = trace_rays_paged(o, d, psc, cb, cfg.grid,
                             max_page_rounds=args.rounds,
                             march_steps=args.march,
                             phase_iters=args.phases,
                             pages_per_round=args.fanout)
        nh = int(np.asarray(r["hit"]).sum())
        t0 = time.perf_counter()
        r = trace_rays_paged(o, d, psc, cb, cfg.grid,
                             max_page_rounds=args.rounds,
                             march_steps=args.march,
                             phase_iters=args.phases,
                             pages_per_round=args.fanout)
        nh = int(np.asarray(r["hit"]).sum())
        dt = time.perf_counter() - t0
        totals["paged"] += dt
        rays["paged"] += n
        nex = int(np.asarray(r["exhausted"]).sum())
        print(f"view {vi}: paged {n/dt/1e6:8.2f} Mrays/s ({dt*1e3:7.1f} ms) "
              f"hits {nh} exhausted {nex} rounds {int(r['iters'])}")

        if args.secondary:
            # Cosine-hemisphere bounce rays from the primary hits + sun
            # shadow rays: the wave's incoherent workloads.
            from brickmap_tpu.render.sampling import cone_sample, cosine_hemisphere
            hit = r["hit"]
            hp = o + d * r["t"][:, None] + r["normal"] * 2e-3
            nrm = jnp.where(jnp.sum(r["normal"]**2, 1, keepdims=True) > 0,
                            r["normal"], -d)
            key2 = jax.random.PRNGKey(100 + vi)
            bdir = cosine_hemisphere(key2, nrm)
            bo = jnp.where(hit[:, None], hp, o)
            bd = jnp.where(hit[:, None], bdir, d)
            rb = trace_rays_paged(bo, bd, psc, cb, cfg.grid,
                                  max_page_rounds=args.rounds,
                                  march_steps=args.march,
                                  phase_iters=args.phases,
                                  pages_per_round=args.fanout)
            int(np.asarray(rb["hit"]).sum())
            t0 = time.perf_counter()
            rb = trace_rays_paged(bo, bd, psc, cb, cfg.grid,
                                  max_page_rounds=args.rounds,
                                  march_steps=args.march,
                                  phase_iters=args.phases,
                                  pages_per_round=args.fanout)
            nhb = int(np.asarray(rb["hit"]).sum())
            dtb = time.perf_counter() - t0
            sdir = cone_sample(jax.random.PRNGKey(7), jnp.asarray(
                [0.0, 0.0, 1.0]), 0.0003, shape=(n,))
            t0 = time.perf_counter()
            rs = trace_rays_paged(bo, sdir, psc, cb, cfg.grid,
                                  max_page_rounds=args.rounds,
                                  march_steps=args.march,
                                  phase_iters=args.phases,
                                  pages_per_round=args.fanout)
            nhs = int(np.asarray(rs["hit"]).sum())
            dts = time.perf_counter() - t0
            print(f"        bounce {n/dtb/1e6:8.2f} Mrays/s ({dtb*1e3:7.1f} ms)"
                  f" hits {nhb} rounds {int(rb['iters'])}")
            print(f"        shadow {n/dts/1e6:8.2f} Mrays/s ({dts*1e3:7.1f} ms)"
                  f" hits {nhs} rounds {int(rs['iters'])}")

        if args.xla:
            from brickmap_tpu.ops.traverse import trace_rays_chunked

            rx = trace_rays_chunked(
                o, d, jsc.index_volume, jsc.block_words, jsc.pool_words,
                jsc.pool_base, cb, cfg.grid,
                max_outer=cfg.render.max_top_steps)
            int(np.asarray(rx["hit"]).sum())
            t0 = time.perf_counter()
            rx = trace_rays_chunked(
                o, d, jsc.index_volume, jsc.block_words, jsc.pool_words,
                jsc.pool_base, cb, cfg.grid,
                max_outer=cfg.render.max_top_steps)
            nhx = int(np.asarray(rx["hit"]).sum())
            dtx = time.perf_counter() - t0
            totals["xla"] += dtx
            rays["xla"] += n
            print(f"        xla   {n/dtx/1e6:8.2f} Mrays/s ({dtx*1e3:7.1f} ms)"
                  f" hits {nhx}")
            if args.check:
                hm = np.asarray(r["hit"]) == np.asarray(rx["hit"])
                tm = np.abs(np.asarray(r["t"]) - np.asarray(rx["t"]))
                both = np.asarray(r["hit"]) & np.asarray(rx["hit"])
                print(f"        match: hit {hm.mean()*100:.3f}%  "
                      f"t maxdiff {tm[both].max() if both.any() else 0:.4f}")

    print(f"TOTAL paged: {rays['paged']/totals['paged']/1e6:.2f} Mrays/s")
    if args.xla:
        print(f"TOTAL xla:   {rays['xla']/totals['xla']/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
