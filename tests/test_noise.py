"""Simplex noise: vectorized vs scalar oracle, determinism, terrain semantics."""

import jax.numpy as jnp
import numpy as np

from brickmap_tpu import noise


def test_vectorized_matches_scalar_oracle(rng):
    pts = rng.uniform(-50, 50, size=(200, 2)).astype(np.float32)
    vec = noise.simplex2(pts[:, 0], pts[:, 1])
    ref = np.array([noise.simplex2_scalar(float(x), float(y)) for x, y in pts])
    np.testing.assert_allclose(vec, ref, rtol=2e-4, atol=2e-5)


def test_lattice_matches_scalar_oracle():
    xs = np.arange(-5, 6).astype(np.float32)
    v = noise.simplex2(xs, np.zeros_like(xs))
    ref = np.array([noise.simplex2_scalar(float(x), 0.0) for x in xs])
    np.testing.assert_allclose(v, ref, rtol=1e-4, atol=1e-5)


def test_range_bounded(rng):
    pts = rng.uniform(-1000, 1000, size=(5000, 2)).astype(np.float32)
    v = noise.simplex2(pts[:, 0], pts[:, 1])
    assert np.abs(v).max() <= 1.01


def test_jnp_matches_numpy(rng):
    pts = rng.uniform(-50, 50, size=(100, 2)).astype(np.float32)
    a = noise.simplex2(pts[:, 0], pts[:, 1])
    b = noise.simplex2(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]))
    np.testing.assert_allclose(a, np.asarray(b), rtol=1e-5, atol=1e-6)


def test_fbm_normalization(rng):
    pts = rng.uniform(-100, 100, size=(500, 2)).astype(np.float32)
    v = noise.fbm2(pts[:, 0], pts[:, 1], octaves=8)
    assert np.abs(v).max() <= 1.01
    # One octave degenerates to plain noise.
    one = noise.fbm2(pts[:, 0], pts[:, 1], octaves=1)
    np.testing.assert_allclose(one, noise.simplex2(pts[:, 0], pts[:, 1]),
                               rtol=1e-5, atol=1e-6)


def test_terrain_height_range_and_determinism(rng):
    wx = rng.uniform(0, 4096, size=256).astype(np.float32)
    wy = rng.uniform(0, 4096, size=256).astype(np.float32)
    h1 = noise.terrain_height(wx, wy, grid_height=512)
    h2 = noise.terrain_height(wx, wy, grid_height=512)
    np.testing.assert_array_equal(h1, h2)
    assert (h1 >= 0).all() and (h1 <= 512).all()
    # fBm(x/2048)*256+256 semantics (Scene.cpp:53-55)
    manual = noise.fbm2(wx / 2048.0, wy / 2048.0, octaves=8) * 256.0 + 256.0
    np.testing.assert_allclose(h1, manual, rtol=1e-6)
