"""Bounce-1 structural A/B: page fanout (NP), pool fanout (NPP), and
resorted-rescue demand collapse, on the exact view-0 bounce-1 ray set.

Follow-up to probe_bounce1.py: the tile-rounds tail (p99 = 410) against
NPP=1 (ONE pool subpage served per round) suggests descend serialization
is the tail; NP/NPP widening trades DMA for rounds.  Also measures whether
re-sorting budget-exhausted lanes by their CURRENT page collapses their
round demand (the rescue's effectiveness).

Run: PYTHONPATH=/root/repo:/root/.axon_site python notes/probe_bounce1b.py
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
    from brickmap_tpu.app.benchmark import SUN_POSITION, benchmark_cameras
    from brickmap_tpu.config import BrickmapConfig, GridConfig, RenderConfig
    from brickmap_tpu.ops import sunsky as ss
    from brickmap_tpu.pallas.paged import build_paged_scene_device
    from brickmap_tpu.pallas.traverse3 import trace_rays_paged
    from brickmap_tpu.render import pathtrace as pt

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(leaf.reshape(-1)[:1].astype(jnp.float32))[0])

    grid = GridConfig()
    sc = scene_mod.load_scene(os.path.join(CACHE, "scene_full.npz"))
    meta = np.load(os.path.join(CACHE, "paged_full_meta.npy"))
    scd = np.load(os.path.join(CACHE, "paged_full_scd.npy"))
    scene = build_paged_scene_device(sc, grid, meta=meta, sc_dist=scd)
    sync(scene.poolT)

    render = RenderConfig(width=1920, height=1080, max_bounces=3,
                          max_top_steps=2048, paged_rounds=192)
    cfg = BrickmapConfig(grid=grid, render=render)
    w, h = render.width, render.height
    sun_dir = ss.sun_direction_from_position(jnp.asarray(SUN_POSITION))
    cam = benchmark_cameras(1.0)[0]
    arrays = pt.camera_arrays_for(cam, sun_dir, w, h)
    cam_brick = jnp.asarray(cam.brick_position, jnp.int32)
    key = jax.random.PRNGKey(0)

    perm, _ = pt._tile_permutation(w, h)
    k_pix, k_loop = jax.random.split(key)
    st = pt._primary_state(k_pix, arrays, cfg, w, h,
                           pixel_order=jnp.asarray(perm))
    k_loop, k_b = jax.random.split(k_loop)
    res = pt._trace_stage(st, scene, cam_brick, cfg,
                          pt._ladder_buckets(2 * w * h)[-2])
    st = pt._shade_stage(jnp.int32(0), k_b, st, res,
                         arrays["sun_direction"], cfg)
    sync(st["origins"])

    o_all = np.concatenate([np.asarray(st["origins"]),
                            np.asarray(st["sh_o"])])
    d_all = np.concatenate([np.asarray(st["dirs"]), np.asarray(st["sh_d"])])
    live = np.concatenate([np.asarray(st["active"]),
                           np.asarray(st["sh_active"])])
    oc, dc = o_all[live], d_all[live]
    s16 = float(grid.brick_size * grid.supergrid_cell_size)

    def sort_pack(oc, dc):
        q = np.clip((oc / s16).astype(np.int64), 0,
                    max(grid.supergrid_xy, grid.supergrid_z) - 1)
        page = q[:, 0] + q[:, 1] * grid.supergrid_xy \
            + q[:, 2] * grid.supergrid_xy ** 2
        octant = ((dc[:, 0] > 0) + 2 * (dc[:, 1] > 0)
                  + 4 * (dc[:, 2] > 0)).astype(np.int64)
        order = np.argsort(page * 8 + octant, kind="stable")
        oc, dc = oc[order], dc[order]
        pad = (-oc.shape[0]) % 1024
        oc = np.concatenate([oc, np.full((pad, 3), -10.0, np.float32)])
        dc = np.concatenate([dc, np.full((pad, 3), -1.0, np.float32)])
        return jnp.asarray(oc), jnp.asarray(dc)

    oj, dj = sort_pack(oc, dc)
    n_rays = oj.shape[0]
    print(f"bounce-1 set: {n_rays} lanes", flush=True)

    def call(budget, np_, npp, oo=None, dd=None):
        return trace_rays_paged(
            oo if oo is not None else oj, dd if dd is not None else dj,
            scene, cam_brick, grid, max_page_rounds=budget,
            march_steps=render.paged_march, phase_iters=render.paged_phases,
            transit_iters=render.paged_transit, pages_per_round=np_,
            pool_fanout=npp, prefetch=render.paged_prefetch)

    results = {}
    for (np_, npp) in ((4, 1), (4, 2), (4, 4), (8, 1), (8, 2)):
        for budget in (64, 192):
            r = call(budget, np_, npp)
            sync(r["hit"])
            best = 1e9
            exh = int(np.asarray(r["exhausted"]).sum())
            for _ in range(2):
                t0 = time.perf_counter()
                r = call(budget, np_, npp)
                sync(r["hit"])
                best = min(best, time.perf_counter() - t0)
            results[(np_, npp, budget)] = (best, exh)
            print(f"NP{np_} NPP{npp} budget {budget:4d}: {best*1e3:8.1f} ms"
                  f"  {n_rays/best/1e6:6.2f} Mrays/s  exh {exh}", flush=True)

    # Resorted rescue: budget-64 base stragglers, resumed + re-sorted.
    r = call(64, 4, 1)
    exh = np.asarray(r["exhausted"])
    resume = np.asarray(r["resume_t"])
    onp, dnp = np.asarray(oj), np.asarray(dj)
    off = np.where(exh, np.maximum(resume - 2.0, 0.0), 0.0)
    o2 = (onp + dnp * off[:, None])[exh]
    d2 = dnp[exh]
    print(f"rescue set: {o2.shape[0]} lanes", flush=True)
    o2j, d2j = sort_pack(o2, d2)
    r2 = call(2048, 4, 1, o2j, d2j)
    sync(r2["hit"])
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        r2 = call(2048, 4, 1, o2j, d2j)
        sync(r2["hit"])
        best = min(best, time.perf_counter() - t0)
    print(f"resorted rescue (2048 budget): {best*1e3:8.1f} ms  "
          f"max rounds {int(np.asarray(r2['iters']))}  "
          f"exh {int(np.asarray(r2['exhausted']).sum())}", flush=True)
    b64 = results[(4, 1, 64)][0]
    print(f"=> budget64 + resorted rescue total ~ {(b64+best)*1e3:.1f} ms vs"
          f" budget192 {results[(4, 1, 192)][0]*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
