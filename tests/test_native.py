"""Native (C++) worldgen vs the NumPy implementation."""

import numpy as np
import pytest

from brickmap_tpu import native, noise

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_simplex_matches_numpy(rng):
    pts = rng.uniform(-60, 60, size=(300, 2)).astype(np.float32)
    want = noise.simplex2(pts[:, 0], pts[:, 1])
    got = np.array([native.simplex2_at(float(x), float(y)) for x, y in pts])
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-5)


def test_terrain_heights_match(rng):
    g, h = 256, 128
    got = native.terrain_heights(g, h, octaves=8, feature_scale=512.0)
    xs = np.arange(g, dtype=np.float32)
    wy, wx = np.meshgrid(xs, xs, indexing="ij")
    want = np.asarray(noise.terrain_height(wx, wy, h, octaves=8,
                                           feature_scale=512.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_native_scene_equivalent(rng):
    """Scenes built from native vs NumPy heights agree brick-for-brick except
    at float-rounding height boundaries (quantified, must be ~none)."""
    from brickmap_tpu import scene as scene_mod
    from brickmap_tpu.config import GridConfig

    grid = GridConfig(grid_size=256, grid_height=128)
    a = scene_mod.generate_terrain_scene(grid, use_native=True,
                                         feature_scale=512.0)
    b = scene_mod.generate_terrain_scene(grid, use_native=False,
                                         feature_scale=512.0)
    diff = (np.asarray(a.index_volume) != np.asarray(b.index_volume)).mean()
    assert diff < 1e-3, f"{diff:.2e} of index words differ"
