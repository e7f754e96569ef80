"""Chunked-gradient path must match the single-chunk path."""

import jax.numpy as jnp
import numpy as np

from brickmap_tpu.diff.render import l2_loss_and_grads


def test_chunked_grads_match(rng):
    occ = rng.uniform(0.1, 0.7, (8, 8, 8)).astype(np.float32)
    alb = rng.uniform(0.2, 0.9, (8, 8, 8, 3)).astype(np.float32)
    n = 100  # not a multiple of the chunk -> exercises padding
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (np.array([4, 4, 4]) - dirs * 14).astype(np.float32)
    bg = np.zeros((n, 3), np.float32)
    tgt = np.full((n, 3), 0.4, np.float32)
    args = (jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(occ),
            jnp.asarray(alb), jnp.asarray(bg), jnp.asarray(tgt))
    l1, (do1, da1) = l2_loss_and_grads(*args, max_steps=32,
                                       rays_per_chunk=1 << 20)
    l2, (do2, da2) = l2_loss_and_grads(*args, max_steps=32, rays_per_chunk=32)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(do1), np.asarray(do2), rtol=1e-4,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(da1), np.asarray(da2), rtol=1e-4,
                               atol=1e-7)
