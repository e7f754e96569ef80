#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Headline: Mrays/s per chip, forward path tracing at 1920x1080, 3 bounces,
over the reference's 9 scripted viewpoints on the simplex-terrain world
(BASELINE.md; resolution main.cpp:49, world variables.h:7-8, viewpoints
performance_measure.h:4-25).  The traversal is the hierarchical Pallas
kernel over the paged scene (brickmap_tpu/pallas/traverse3.py).

Default workload is the full 4096^2x512 world; --small switches to the
1024-world (faster prep) at the same resolution.  If full-world preparation
fails (memory/time), the small world is used and tagged in the output.

Extra fields: fwd+bwd differentiable-render throughput and per-view stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")


def _load_world(tag: str, cfg, scene_mod):
    cache_path = os.path.join(CACHE, f"scene_{tag}.npz")
    t0 = time.time()
    if os.path.exists(cache_path):
        sc = scene_mod.load_scene(cache_path)
        print(f"scene loaded from cache in {time.time()-t0:.1f}s",
              file=sys.stderr)
    else:
        sc = scene_mod.generate_terrain_scene(cfg.grid)
        scene_mod.save_scene(cache_path, sc)
        print(f"scene generated in {time.time()-t0:.1f}s", file=sys.stderr)
    return sc


def _paged_for(tag: str, sc, cfg):
    """Paged tables for the Pallas kernel: meta/sc_dist disk-cached, poolT
    expanded ON DEVICE from the compact scene (the 2.1 GB host-built poolT
    cost 315 s through the remote tunnel in r2; the compact pool rows +
    loaded-cell addresses are ~12x smaller)."""
    from brickmap_tpu.pallas.paged import (
        build_paged_scene, build_paged_scene_device)

    base = os.path.join(CACHE, f"paged_{tag}")
    t0 = time.time()
    if os.path.exists(base + "_meta.npy"):
        meta = np.load(base + "_meta.npy")
        scd = np.load(base + "_scd.npy")
        print(f"paged meta loaded in {time.time()-t0:.1f}s", file=sys.stderr)
    else:
        host = build_paged_scene(sc, cfg.grid, include_pool=False)
        meta, scd = host.meta, host.sc_dist
        np.save(base + "_meta.npy", np.asarray(meta))
        np.save(base + "_scd.npy", np.asarray(scd))
        print(f"paged meta built in {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    dev = build_paged_scene_device(sc, cfg.grid, meta=meta, sc_dist=scd)
    float(np.asarray(dev.poolT[0, 0, :1])[0])
    print(f"paged tables on device in {time.time()-t0:.1f}s "
          f"(poolT {dev.poolT.nbytes/1e6:.0f} MB)", file=sys.stderr)
    return dev


AUX = {}


def _run_aux(name: str, timeout: float = 1800.0):
    """Run one aux bench as ``python bench.py --aux <name>`` and parse the
    final ``AUX_RESULT <float>`` line (None on any failure)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--aux", name],
            capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        sys.stderr.write(proc.stderr[-2000:])
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith("AUX_RESULT "):
                return float(line.split()[1])
        print(f"aux bench {name} produced no result (rc={proc.returncode})",
              file=sys.stderr)
    except Exception as e:
        print(f"aux bench {name} failed: {e}", file=sys.stderr)
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="1024^2x256 world instead of the full 4096^2x512")
    ap.add_argument("--full", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--waves", type=int, default=1)
    ap.add_argument("--skip-bwd", action="store_true")
    ap.add_argument("--xla-path", action="store_true",
                    help="benchmark the XLA lockstep traversal instead of "
                         "the Pallas kernel")
    ap.add_argument("--aux", choices=sorted(AUX), help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.aux:
        _aux_main(args.aux)
        return

    import jax

    # Persistent compilation cache: later bench runs (and the driver's) reuse
    # compiled executables when supported by the backend.
    try:
        os.makedirs(os.path.join(CACHE, "xla"), exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(CACHE, "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from brickmap_tpu import scene as scene_mod
    from brickmap_tpu.app.benchmark import run_forward_benchmark
    from brickmap_tpu.config import BrickmapConfig, GridConfig, RenderConfig

    os.makedirs(CACHE, exist_ok=True)
    render = RenderConfig(width=1920, height=1080, max_bounces=3,
                          max_top_steps=2048, paged_rounds=192)

    def prep(tag):
        if tag == "small":
            cfg = BrickmapConfig(
                grid=GridConfig(grid_size=1024, grid_height=256),
                render=render)
            scale = 1024.0 / 4096.0
        else:
            cfg = BrickmapConfig(grid=GridConfig(), render=render)
            scale = 1.0
        sc = _load_world(tag, cfg, scene_mod)
        if args.xla_path:
            scene = scene_mod.VoxelScene(
                index_volume=jnp.asarray(sc.index_volume),
                pool_words=jnp.asarray(sc.pool_words),
                pool_base=jnp.asarray(sc.pool_base),
                block_words=jnp.asarray(sc.block_words))
        else:
            scene = _paged_for(tag, sc, cfg)
        return cfg, scene, scale

    tag = "small" if args.small else "full"
    try:
        cfg, scene, scale = prep(tag)
    except Exception as e:
        print(f"{tag}-world prep failed ({e}); falling back to small",
              file=sys.stderr)
        tag = "small"
        cfg, scene, scale = prep(tag)

    fwd = run_forward_benchmark(scene, cfg, waves_per_view=args.waves,
                                scale=scale, verbose=True)

    # Aux benches run in SUBPROCESSES: a TPU worker crash (transient tunnel
    # faults happen) then cannot poison this process or the other benches —
    # each subprocess gets a fresh worker and the persistent compile cache.
    pallas_mrays = _run_aux("brick")
    fwd_bwd_mrays = None
    sparse_bwd_mrays = None
    if not args.skip_bwd:
        fwd_bwd_mrays = _run_aux("bwd")
        sparse_bwd_mrays = _run_aux("sparse-bwd")

    result = {
        "metric": "Mrays/s/chip fwd path tracing "
                  f"{cfg.render.width}x{cfg.render.height} "
                  f"{cfg.render.max_bounces}b, 9-viewpoint avg, "
                  f"{tag} world",
        "value": round(fwd["mrays_per_s"], 3),
        "unit": "Mrays/s",
        "vs_baseline": None,  # reference publishes no numbers (BASELINE.md)
        "fwd_bwd_mrays_per_s": round(fwd_bwd_mrays, 3) if fwd_bwd_mrays else None,
        "sparse_fwd_bwd_mrays_per_s": round(sparse_bwd_mrays, 3)
        if sparse_bwd_mrays else None,
        "pallas_brick_mrays_per_s": round(pallas_mrays, 1) if pallas_mrays else None,
        "per_view_mrays": [round(r["mrays_per_s"], 2) for r in fwd["per_view"]],
        "exhausted_rays": fwd["total_exhausted"],
        "avg_ms": round(sum(r["avg_ms"] for r in fwd["per_view"])
                        / len(fwd["per_view"]), 2),
        "world": tag,
        "traversal": "xla" if args.xla_path else "pallas_paged",
    }
    print(json.dumps(result))


def _aux_main(name: str) -> None:
    """Subprocess entry for one aux bench: prints ``AUX_RESULT <float>``."""
    import jax

    try:
        os.makedirs(os.path.join(CACHE, "xla"), exist_ok=True)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(CACHE, "xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from brickmap_tpu.config import BrickmapConfig, GridConfig, RenderConfig

    cfg = BrickmapConfig(
        grid=GridConfig(),
        render=RenderConfig(width=1920, height=1080, max_bounces=3))
    print(f"AUX_RESULT {AUX[name](cfg)}")


def _bwd_bench(cfg):
    """fwd+bwd differentiable render throughput over a 64^3 dense grid at the
    benchmark resolution (config-5 style gradients)."""
    import jax.numpy as jnp

    from brickmap_tpu.diff.render import l2_loss_and_grads

    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.uniform(0, 1, (64, 64, 64)).astype(np.float32))
    alb = jnp.asarray(rng.uniform(0, 1, (64, 64, 64, 3)).astype(np.float32))
    n = cfg.render.width * cfg.render.height
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (np.array([32, 32, 32]) - dirs * 96).astype(np.float32)
    bg = np.zeros((n, 3), np.float32)
    tgt = np.full((n, 3), 0.5, np.float32)
    args_j = (jnp.asarray(origins), jnp.asarray(dirs), occ, alb,
              jnp.asarray(bg), jnp.asarray(tgt))
    out = l2_loss_and_grads(*args_j, max_steps=192)
    float(out[0])  # force completion (block_until_ready is unreliable
    # through the remote tunnel)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = l2_loss_and_grads(*args_j, max_steps=192)
        float(out[0])
    dt = time.perf_counter() - t0
    return reps * n / dt / 1e6


def _sparse_bwd_bench(cfg):
    """fwd+bwd over the SPARSE brick pool at benchmark resolution: Pallas
    segment recording + bounded-K replay gradients (diff/sparse.py)."""
    import jax
    import jax.numpy as jnp

    from brickmap_tpu import scene as scene_mod
    from brickmap_tpu.config import GridConfig
    from brickmap_tpu.diff.sparse import (
        cell_pool_map, l2_loss_and_grads_sparse, pool_fields_from_bitmask)
    from brickmap_tpu.pallas.paged import build_paged_scene

    grid = GridConfig(grid_size=1024, grid_height=256)
    sc = scene_mod.load_scene(os.path.join(CACHE, "scene_small.npz")) \
        if os.path.exists(os.path.join(CACHE, "scene_small.npz")) \
        else scene_mod.generate_terrain_scene(grid)
    psc = jax.tree.map(jnp.asarray, build_paged_scene(sc, grid))
    cellmap = jnp.asarray(cell_pool_map(sc, grid))
    occ, alb = pool_fields_from_bitmask(sc)
    occ_j = jnp.asarray(occ * 0.8)
    alb_j = jnp.asarray(alb * 0.6)

    rng = np.random.default_rng(0)
    n = cfg.render.width * cfg.render.height
    # Downward rays over the terrain (the inverse-rendering workload).
    ox = rng.uniform(64, 960, n).astype(np.float32)
    oy = rng.uniform(64, 960, n).astype(np.float32)
    oz = np.full(n, 250.0, np.float32)
    origins = np.stack([ox, oy, oz], 1)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs[:, 2] = -np.abs(dirs[:, 2]) - 1.0
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    bg = jnp.zeros((n, 3), jnp.float32)
    tgt = jnp.full((n, 3), 0.4, jnp.float32)

    def run():
        loss, grads = l2_loss_and_grads_sparse(
            jnp.asarray(origins), jnp.asarray(dirs), psc, cellmap, occ_j,
            alb_j, bg, tgt, grid, k_segments=8)
        return float(loss)

    run()
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return n / best / 1e6


def _pallas_brick_bench():
    """Config-1 class microbenchmark: the fused Pallas 8^3 brick-DDA kernel
    (the register-resident architecture the hierarchical kernel builds on)."""
    import jax.numpy as jnp

    from brickmap_tpu import bits
    from brickmap_tpu.pallas.brick import trace_single_brick

    rng = np.random.default_rng(0)
    dense = rng.random((8, 8, 8)) < 0.12
    words = jnp.asarray(np.asarray(
        bits.brick_words_from_dense(dense[None])[0], np.uint32))
    n = 1 << 21  # 2M rays
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    start = np.array([4.0, 4.0, 4.0]) - dirs * 20
    with np.errstate(divide="ignore"):
        tenter = np.minimum((0.0 - start) / dirs,
                            (8.0 - start) / dirs).max(1) + 1e-3
    origins = (start + dirs * tenter[:, None]).astype(np.float32)
    o, d = jnp.asarray(origins), jnp.asarray(dirs)
    r = trace_single_brick(o, d, words)
    int(np.asarray(r["hit"]).sum())  # forced completion
    best = 1e9
    for rep in range(3):
        o2 = o + rep * 1e-5
        t0 = time.perf_counter()
        r = trace_single_brick(o2, d, words)
        int(np.asarray(r["hit"]).sum())
        best = min(best, time.perf_counter() - t0)
    return n / best / 1e6


AUX.update({
    "bwd": _bwd_bench,
    "sparse-bwd": _sparse_bwd_bench,
    "brick": lambda cfg: _pallas_brick_bench(),
})


if __name__ == "__main__":
    main()
