"""Bounce-1 round-demand and per-round cost on the real TPU (round 5).

Reconstructs view 0's bounce-1 ray set (the dominant wave phase), compacts
and (page, octant)-sorts it exactly like the production wave, then:

  1. pulls the per-tile ROUNDS histogram at a big budget (demand);
  2. times the raw kernel at budgets 32/64/128/192 (cost slope per round).

This decides which structural lever pays: two-tile state, vote width, or
budget/rescue splits.

Run: PYTHONPATH=/root/repo:/root/.axon_site python notes/probe_bounce1.py
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
    print("scene on device", flush=True)

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
    print("bounce-1 state ready", flush=True)

    # Compact + sort like _compact_trace, on host for clarity.
    o_all = np.concatenate([np.asarray(st["origins"]),
                            np.asarray(st["sh_o"])])
    d_all = np.concatenate([np.asarray(st["dirs"]), np.asarray(st["sh_d"])])
    live = np.concatenate([np.asarray(st["active"]),
                           np.asarray(st["sh_active"])])
    oc, dc = o_all[live], d_all[live]
    print(f"bounce-1 live lanes: {oc.shape[0]}", flush=True)
    s16 = float(grid.brick_size * grid.supergrid_cell_size)
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
    oj, dj = jnp.asarray(oc), jnp.asarray(dc)

    # Demand: per-tile rounds at a huge budget.
    r = trace_rays_paged(oj, dj, scene, cam_brick, grid,
                         max_page_rounds=2048, march_steps=render.paged_march,
                         phase_iters=render.paged_phases,
                         transit_iters=render.paged_transit,
                         pages_per_round=render.paged_fanout,
                         pool_fanout=render.paged_pool_fanout,
                         prefetch=render.paged_prefetch)
    # Per-tile rounds: the kernel writes the same round count to every lane
    # of a tile; sample lane 0 of each tile.
    rounds = np.asarray(r["iters"])  # max; also pull per-lane via exhausted?
    print(f"max rounds needed: {rounds}", flush=True)

    # Pull per-tile rounds by re-calling with the rounds output intact.
    from brickmap_tpu.pallas.traverse3 import _paged_call
    from brickmap_tpu.ops.traverse import aabb_clip

    ok, tminn, clipped, en = aabb_clip(oj, dj, grid)
    t_tiles = oj.shape[0] // 1024

    def comp(a, k, fill=0.0):
        return a[:, k].astype(jnp.float32).reshape(t_tiles, 8, 128)

    o_cells = clipped / float(grid.brick_size)
    comps = [comp(o_cells, 0), comp(o_cells, 1), comp(o_cells, 2),
             comp(dj, 0), comp(dj, 1), comp(dj, 2),
             comp(en, 0), comp(en, 1), comp(en, 2),
             ok.astype(jnp.int32).reshape(t_tiles, 8, 128)]
    out = _paged_call(jnp.asarray(cam_brick, jnp.int32), scene.sc_dist,
                      scene.meta, scene.poolT, tuple(comps), grid,
                      2048, render.paged_march, render.paged_phases,
                      render.paged_transit, render.paged_fanout,
                      render.paged_pool_fanout, True, True, False,
                      render.paged_prefetch)
    tile_rounds = np.asarray(out[6][:, 0, 0])
    print("tile rounds percentiles:", flush=True)
    for p in (50, 75, 90, 95, 99, 100):
        print(f"  p{p}: {np.percentile(tile_rounds, p):.0f}", flush=True)

    # Cost slope: kernel time vs budget.
    for budget in (32, 64, 128, 192):
        def call():
            return trace_rays_paged(
                oj, dj, scene, cam_brick, grid, max_page_rounds=budget,
                march_steps=render.paged_march,
                phase_iters=render.paged_phases,
                transit_iters=render.paged_transit,
                pages_per_round=render.paged_fanout,
                pool_fanout=render.paged_pool_fanout,
                prefetch=render.paged_prefetch)

        r = call()
        sync(r["hit"])
        best = 1e9
        exh = int(np.asarray(r["exhausted"]).sum())
        for _ in range(2):
            t0 = time.perf_counter()
            r = call()
            sync(r["hit"])
            best = min(best, time.perf_counter() - t0)
        n_rays = oj.shape[0]
        print(f"budget {budget:4d}: {best*1e3:8.1f} ms  "
              f"{n_rays/best/1e6:6.2f} Mrays/s  exhausted {exh}",
              flush=True)


if __name__ == "__main__":
    main()
