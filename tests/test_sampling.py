"""Sampler distribution tests."""

import jax
import jax.numpy as jnp
import numpy as np

from brickmap_tpu.render import sampling


def test_stratified_range_and_coverage():
    u = np.asarray(sampling.stratified_2d(jax.random.PRNGKey(0), 4096))
    assert u.shape == (4096, 2)
    assert (u >= 0).all() and (u < 1).all()
    # All 16 strata hit.
    sx = (u[:, 0] * 4).astype(int)
    sy = (u[:, 1] * 4).astype(int)
    assert len(set(map(tuple, np.stack([sx, sy], 1)))) == 16


def test_concentric_disk():
    u = jax.random.uniform(jax.random.PRNGKey(1), (5000, 2))
    p = np.asarray(sampling.concentric_disk(u))
    r = np.linalg.norm(p, axis=1)
    assert (r <= 1.0 + 1e-6).all()
    assert abs(p.mean()) < 0.02
    # Area-preserving: fraction inside r<0.5 should be ~0.25.
    assert abs((r < 0.5).mean() - 0.25) < 0.03
    # Degenerate center sample maps to 0.
    z = sampling.concentric_disk(jnp.asarray([[0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(z), 0.0, atol=1e-7)


def test_orthonormal_basis():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(100, 3)).astype(np.float32)
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    u, v = sampling.orthonormal_basis(jnp.asarray(w))
    u, v = np.asarray(u), np.asarray(v)
    for a, b in [(u, w), (v, w), (u, v)]:
        assert np.abs((a * b).sum(1)).max() < 1e-5
    np.testing.assert_allclose(np.linalg.norm(u, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_cosine_hemisphere():
    n = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (20000, 1)).astype(np.float32))
    d = np.asarray(sampling.cosine_hemisphere(jax.random.PRNGKey(3), n))
    cos = d[:, 2]
    assert (cos >= -1e-6).all()
    # E[cos] = 2/3 for cosine-weighted hemisphere.
    assert abs(cos.mean() - 2 / 3) < 0.01
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)


def test_cone_sample():
    axis = jnp.asarray([0.3, -0.5, 0.8])
    axis = axis / jnp.linalg.norm(axis)
    extent = 0.05
    d = np.asarray(sampling.cone_sample(
        jax.random.PRNGKey(4), axis, extent, shape=(5000,)))
    cos = d @ np.asarray(axis)
    # ry = 1 - u*extent in [1-extent, 1] exactly equals cos(angle to axis).
    assert (cos >= 1 - extent - 1e-5).all()
    assert (cos <= 1 + 1e-6).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # Roughly uniform in ry.
    assert abs(((1 - cos) / extent).mean() - 0.5) < 0.03
