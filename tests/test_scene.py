"""Scene builder tests: pool/index consistency, terrain oracle, persistence."""

import numpy as np

from brickmap_tpu import bits, noise, scene as scene_mod
from brickmap_tpu.config import GridConfig

SMALL = GridConfig(grid_size=128, grid_height=128)   # 16^3 bricks, 1 superchunk
MULTI = GridConfig(grid_size=256, grid_height=128)   # 2x2x1 superchunks


def dense_voxel_lookup(sc, grid, x, y, z):
    """Occupancy of world voxel (x,y,z) via index word + pool, host-side."""
    b = grid.brick_size
    iv = np.asarray(sc.index_volume)
    word = iv[z // b, y // b, x // b]
    if not (word & 0xE0000000) or not (word & 0x80000000):
        return False
    s = grid.supergrid_cell_size
    sc_id = ((x // b) // s) + ((y // b) // s) * grid.supergrid_xy \
        + ((z // b) // s) * grid.supergrid_xy * grid.supergrid_xy
    gslot = int(np.asarray(sc.pool_base)[sc_id]) + int(word & 0xFFF)
    words = np.asarray(sc.pool_words)[gslot]
    return bool(
        bits.test_voxel_bit(words[None], np.array([x % b]), np.array([y % b]),
                            np.array([z % b]))[0]
    )


def test_from_dense_roundtrip(rng):
    grid = SMALL
    dense = rng.random((128, 128, 128)) < 0.02
    sc = scene_mod.scene_from_dense(dense, grid)
    pts = rng.integers(0, 128, size=(300, 3))
    for x, y, z in pts:
        assert dense_voxel_lookup(sc, grid, x, y, z) == dense[z, y, x], (x, y, z)


def test_from_dense_multi_superchunk(rng):
    grid = MULTI
    dense = rng.random((128, 256, 256)) < 0.01
    sc = scene_mod.scene_from_dense(dense, grid)
    assert sc.pool_base.shape == (grid.num_superchunks,)
    pts = rng.integers(0, [256, 256, 128], size=(200, 3))
    for x, y, z in pts:
        assert dense_voxel_lookup(sc, grid, x, y, z) == dense[z, y, x]


def test_lod_byte_consistency(rng):
    grid = SMALL
    dense = rng.random((128, 128, 128)) < 0.05
    sc = scene_mod.scene_from_dense(dense, grid)
    iv = np.asarray(sc.index_volume)
    # Check a handful of non-empty bricks: lod byte == coarse occupancy of dense.
    nz = np.argwhere((iv & 0xE0000000) != 0)
    for bz, by, bx in nz[:50]:
        blk = dense[bz * 8:(bz + 1) * 8, by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
        expect = int(bits.lod_byte_from_dense(blk[None])[0])
        got = int(bits.index_lod_byte(iv[bz, by, bx]))
        assert got == expect


def test_terrain_matches_height_oracle(rng):
    grid = GridConfig(grid_size=256, grid_height=128)
    sc = scene_mod.generate_terrain_scene(grid)
    pts = rng.integers(0, [256, 256, 128], size=(300, 3))
    for x, y, z in pts:
        h = float(noise.terrain_height(
            np.float32(x), np.float32(y), grid.grid_height))
        assert dense_voxel_lookup(sc, grid, x, y, z) == (z < h), (x, y, z, h)


def test_terrain_surface_sparsity():
    grid = GridConfig(grid_size=256, grid_height=128)
    sc = scene_mod.generate_terrain_scene(grid)
    info = scene_mod.scene_summary(sc, grid)
    assert info["nonempty_bricks"] == info["loaded_bricks"] == info["num_bricks"]
    # Terrain fills roughly half the world: far fewer bricks than the dense count.
    assert 0 < info["num_bricks"] < grid.cells * grid.cells * grid.cells_height


def test_streaming_residency_init():
    grid = SMALL
    dense = np.zeros((128, 128, 128), bool)
    dense[:32] = True
    sc = scene_mod.scene_from_dense(dense, grid, residency="streaming")
    iv = np.asarray(sc.index_volume)
    nonempty = (iv & 0xE0000000) != 0
    assert nonempty.any()
    # Reference GPU init: unloaded | lod, never loaded (Scene.cpp:157-164).
    assert not bits.index_is_loaded(iv[nonempty]).any()
    assert bits.index_is_unloaded(iv[nonempty]).all()
    assert (bits.index_slot(iv[nonempty]) == 0).all()


def test_save_load_roundtrip(tmp_path, rng):
    grid = SMALL
    dense = rng.random((128, 128, 128)) < 0.02
    sc = scene_mod.scene_from_dense(dense, grid)
    p = str(tmp_path / "scene.npz")
    scene_mod.save_scene(p, sc)
    sc2 = scene_mod.load_scene(p)
    np.testing.assert_array_equal(sc.index_volume, sc2.index_volume)
    np.testing.assert_array_equal(sc.pool_words, sc2.pool_words)
    np.testing.assert_array_equal(sc.pool_base, sc2.pool_base)
