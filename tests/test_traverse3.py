"""Hierarchical Pallas kernel (pallas/traverse3.py) vs the scalar oracle.

Runs the fused kernel in interpret mode on CPU against the exact same
ray-for-ray parity checks as the XLA traversal (tests/test_traverse.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from brickmap_tpu import scene as scene_mod
from brickmap_tpu.config import GridConfig
from brickmap_tpu.ops import dda_ref
from brickmap_tpu.pallas.paged import build_paged_scene
from brickmap_tpu.pallas.traverse3 import trace_rays_paged

GRID1 = GridConfig(grid_size=128, grid_height=128)   # one page
GRID4 = GridConfig(grid_size=256, grid_height=128)   # 2x2x1 pages
CAM = np.array([0, 0, 0], np.int64)


@pytest.fixture(scope="module")
def box_scene():
    dense = np.zeros((128, 128, 128), bool)
    dense[16:48, 32:96, 32:96] = True
    sc = scene_mod.scene_from_dense(dense, GRID1)
    return sc, build_paged_scene(sc, GRID1)


@pytest.fixture(scope="module")
def noise_scene():
    rng = np.random.default_rng(105)
    dense = rng.random((128, 128, 128)) < 0.015
    sc = scene_mod.scene_from_dense(dense, GRID1)
    return sc, build_paged_scene(sc, GRID1)


@pytest.fixture(scope="module")
def multipage_scene():
    """2x2x1 pages with an empty page gap (exercises page votes + transit)."""
    dense = np.zeros((128, 256, 256), bool)
    dense[16:48, 16:80, 16:80] = True        # page (0,0,0)
    dense[40:90, 180:240, 150:250] = True    # pages (1,*,0)
    sc = scene_mod.scene_from_dense(dense, GRID4)
    return sc, build_paged_scene(sc, GRID4)


def run_both(sc, psc, origins, directions, cam=CAM, grid=GRID1, **kw):
    res = trace_rays_paged(
        jnp.asarray(origins, jnp.float32),
        jnp.asarray(directions, jnp.float32),
        psc, jnp.asarray(cam, jnp.int32), grid, interpret=True, **kw)
    refs = [dda_ref.intersect_voxel(o, d, sc, grid, cam)
            for o, d in zip(origins, directions)]
    return res, refs


def assert_match(res, refs, origins, directions, atol=2e-2):
    hits = np.asarray(res["hit"])
    ts = np.asarray(res["t"])
    ns = np.asarray(res["normal"])
    exh = np.asarray(res["exhausted"])
    assert not exh.any(), f"{exh.sum()} lanes exhausted the page-round budget"
    for i, r in enumerate(refs):
        assert bool(hits[i]) == r.hit, (
            f"ray {i}: o={origins[i]} d={directions[i]} "
            f"vec={bool(hits[i])} ref={r.hit}")
        if r.hit:
            assert abs(float(ts[i]) - r.distance) < atol, (
                f"ray {i}: o={origins[i]} d={directions[i]} "
                f"t {float(ts[i])} vs {r.distance}")
            np.testing.assert_allclose(ns[i], r.normal, atol=1e-5,
                                       err_msg=f"ray {i} normal")


def random_rays(rng, n, lo, hi):
    origins = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    directions = rng.normal(size=(n, 3)).astype(np.float32)
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)
    return origins, directions


def test_paged_meta_ess_nibbles(noise_scene):
    """Meta rows 10-13 pack the index volume's Chebyshev skip distances
    (bits 28:20), 4-bit nibbles 8-per-word, clamped to 15; 0 == occupied."""
    from brickmap_tpu.config import BRICK_DIST_MASK, BRICK_DIST_SHIFT

    sc, psc = noise_scene
    iv = np.asarray(sc.index_volume)
    meta = np.asarray(psc.meta).view(np.uint32)
    occ = (iv & np.uint32(0xE000_0000)) != 0
    dist = ((iv & np.uint32(BRICK_DIST_MASK)) >> BRICK_DIST_SHIFT).astype(int)
    want = np.where(occ, 0, np.minimum(dist, 15))

    s = 16
    cz, cy, cx = iv.shape
    cell_rng = np.random.default_rng(7)
    for _ in range(200):
        z, y, x = (int(cell_rng.integers(0, d)) for d in (cz, cy, cx))
        sc_id = (x // s) + (y // s) * (cx // s) + (z // s) * (cx // s) ** 2
        lin = ((z % s) * s + (y % s)) * s + (x % s)
        word = meta[sc_id, 10 + (lin >> 3) // 128, (lin >> 3) % 128]
        nib = (word >> np.uint32((lin & 7) * 4)) & np.uint32(15)
        assert int(nib) == int(want[z, y, x]), (z, y, x)


def test_paged_matches_oracle_box(box_scene, rng):
    sc, psc = box_scene
    origins, directions = random_rays(rng, 48, [-20, -20, -20],
                                      [148, 148, 148])
    res, refs = run_both(sc, psc, origins, directions)
    assert_match(res, refs, origins, directions)


def test_paged_matches_oracle_noise(noise_scene, rng):
    sc, psc = noise_scene
    origins, directions = random_rays(rng, 48, [0, 0, 0], [128, 128, 128])
    res, refs = run_both(sc, psc, origins, directions)
    assert_match(res, refs, origins, directions)


def test_paged_axis_aligned_and_degenerate(box_scene):
    sc, psc = box_scene
    origins = np.array([
        [0.5, 64.0, 30.0], [127.5, 64.0, 30.0], [64.0, 0.5, 30.0],
        [64.0, 64.0, 100.0], [0.5, 64.0, 100.0], [64.0, 64.0, 0.5],
        [-10.0, 64.0, 30.0], [64.0, 64.0, 30.0],
    ], np.float32)
    directions = np.array([
        [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, 0, -1],
        [1, 0, 0], [0, 0, 1], [1, 0, 0], [1, 0, 0],
    ], np.float32)
    res, refs = run_both(sc, psc, origins, directions)
    assert_match(res, refs, origins, directions)


def test_paged_lod_distances(box_scene, rng):
    sc, psc = box_scene
    origins, directions = random_rays(rng, 24, [0, 0, 0], [128, 128, 128])
    for cam in ([0, 0, 0], [400, 0, 0], [900, 0, 0]):
        cam = np.asarray(cam, np.int64)
        res, refs = run_both(sc, psc, origins, directions, cam=cam)
        assert_match(res, refs, origins, directions)


def test_paged_multipage(multipage_scene, rng):
    sc, psc = multipage_scene
    origins, directions = random_rays(rng, 64, [-20, -20, -20],
                                      [276, 276, 148])
    res, refs = run_both(sc, psc, origins, directions, grid=GRID4)
    assert_match(res, refs, origins, directions)


def test_paged_requests_streaming():
    dense = np.zeros((128, 128, 128), bool)
    dense[16:48, 32:96, 32:96] = True
    sc = scene_mod.scene_from_dense(dense, GRID1, residency="streaming")
    psc = build_paged_scene(sc, GRID1)
    origins = np.array([[0.5, 64.0, 30.0], [64.0, 64.0, 100.0]], np.float32)
    directions = np.array([[1, 0, 0], [0, 0, -1]], np.float32)
    res, refs = run_both(sc, psc, origins, directions)
    req = np.asarray(res["request"])
    rp = np.asarray(res["request_pos"])
    for i, r in enumerate(refs):
        assert bool(req[i]) == (r.request is not None)
        if r.request is not None:
            assert tuple(rp[i]) == r.request
    assert_match(res, refs, origins, directions)


def test_paged_budget_exhaustion_flag(box_scene):
    """A tiny page-round budget must be reported, not a silent miss."""
    sc, psc = box_scene
    origins = np.array([[0.5, 64.0, 30.0]], np.float32)
    directions = np.array([[1.0, 0.0, 0.0]], np.float32)
    res = trace_rays_paged(
        jnp.asarray(origins), jnp.asarray(directions), psc,
        jnp.asarray(CAM, jnp.int32), GRID1, interpret=True,
        max_page_rounds=1, march_steps=1, phase_iters=1)
    assert bool(np.asarray(res["exhausted"])[0])
    assert not bool(np.asarray(res["hit"])[0])


def test_device_paged_build_matches_host(noise_scene):
    """build_paged_scene_device (compact upload + on-device poolT expansion)
    must reproduce the host-built tables bit-for-bit."""
    from brickmap_tpu.pallas.paged import build_paged_scene_device

    sc, psc_host = noise_scene
    psc_dev = build_paged_scene_device(sc, GRID1)
    np.testing.assert_array_equal(np.asarray(psc_dev.meta),
                                  np.asarray(psc_host.meta))
    np.testing.assert_array_equal(np.asarray(psc_dev.sc_dist),
                                  np.asarray(psc_host.sc_dist))
    np.testing.assert_array_equal(
        np.asarray(psc_dev.poolT).astype(np.float32),
        np.asarray(psc_host.poolT).astype(np.float32))


def test_paged_prefetch_modes_agree(multipage_scene, rng):
    """prefetch=False (round-2 single-buffer DMA scheme) must be a pure
    scheduling change: identical results to the double-buffered default."""
    import jax

    sc, psc_np = multipage_scene
    psc = jax.tree.map(jnp.asarray, psc_np)
    n = 64
    origins = rng.uniform([5, 5, 100], [250, 250, 120], (n, 3)).astype(
        np.float32)
    directions = rng.normal(size=(n, 3)).astype(np.float32)
    directions[:, 2] = -np.abs(directions[:, 2]) - 0.3
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)
    a = trace_rays_paged(jnp.asarray(origins), jnp.asarray(directions), psc,
                         jnp.asarray(CAM, jnp.int32), GRID4, interpret=True,
                         prefetch=True)
    b = trace_rays_paged(jnp.asarray(origins), jnp.asarray(directions), psc,
                         jnp.asarray(CAM, jnp.int32), GRID4, interpret=True,
                         prefetch=False)
    for k in ("hit", "t", "normal", "request", "exhausted"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)


def test_tile_rows16_parity(multipage_scene, rng):
    """tile_rows=16 (two-tile (16,128) kernel state) must be a pure
    scheduling change: page votes are per-tile so ROUND counts differ, but
    with an ample budget every ray's hit/t/normal/request must match the
    default (8,128) tiling exactly."""
    import jax

    # Late-suite XLA CPU compiles segfault when the process holds every
    # earlier module's executables (see test_pool_slab_and_fanout_parity);
    # this test compiles two fresh kernel variants, so drop caches first.
    jax.clear_caches()
    sc, psc_np = multipage_scene
    psc = jax.tree.map(jnp.asarray, psc_np)
    n = 96
    origins = rng.uniform([5, 5, 100], [250, 250, 120], (n, 3)).astype(
        np.float32)
    directions = rng.normal(size=(n, 3)).astype(np.float32)
    directions[:, 2] = -np.abs(directions[:, 2]) - 0.3
    directions /= np.linalg.norm(directions, axis=1, keepdims=True)
    a = trace_rays_paged(jnp.asarray(origins), jnp.asarray(directions), psc,
                         jnp.asarray(CAM, jnp.int32), GRID4, interpret=True,
                         tile_rows=8)
    b = trace_rays_paged(jnp.asarray(origins), jnp.asarray(directions), psc,
                         jnp.asarray(CAM, jnp.int32), GRID4, interpret=True,
                         tile_rows=16)
    assert not np.asarray(a["exhausted"]).any()
    assert not np.asarray(b["exhausted"]).any()
    for k in ("hit", "t", "normal", "request"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)


def test_pool_slab_and_fanout_parity(box_scene, rng):
    """Non-default pool slab size / fanout must not change results — a vote
    key vs lookup key mismatch starves descends silently (round-5 bug:
    stale quarter-page vote key with slab-granular lookups exhausted every
    descend-waiting lane).  One comparison (default 512-cell x2 slabs vs
    the old 1024-cell single slab) keeps this to a single extra compile —
    a late-suite XLA CPU compile segfaulted when this test compiled three
    variants at the end of the full run.
    """
    import jax

    # Late-suite compiles segfault XLA CPU when the process holds every
    # earlier module's executables; drop them first (recompiles are cheap
    # relative to a crash).
    jax.clear_caches()
    sc, psc_host = box_scene
    psc = jax.tree.map(jnp.asarray, psc_host)
    grid = GRID1
    n = 512
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (np.array([64, 64, 40]) - dirs * 120).astype(np.float32)
    o, d = jnp.asarray(origins), jnp.asarray(dirs)
    cam = jnp.zeros(3, jnp.int32)
    base = trace_rays_paged(o, d, psc, cam, grid, interpret=True)
    v = trace_rays_paged(o, d, psc, cam, grid, interpret=True,
                         pool_slab=1024, pool_fanout=1)
    np.testing.assert_array_equal(np.asarray(base["hit"]),
                                  np.asarray(v["hit"]))
    np.testing.assert_allclose(np.asarray(base["t"]),
                               np.asarray(v["t"]), atol=1e-4)
    assert not np.asarray(v["exhausted"]).any()
    assert not np.asarray(base["exhausted"]).any()
