"""Sampling primitives: stratified pixel jitter, DoF disk, sun cone, BSDF.

Behavioral equivalents of the reference's device samplers, rebuilt on JAX's
counter-based threefry RNG instead of per-thread xorshift state
(``kernel.cu:19-33`` — per-lane mutable seeds don't fit the functional model;
statistical parity is what matters for a Monte Carlo estimator, and tests check
distributions, not bit streams).

* stratified 4x4 pixel jitter      — kernel.cu:40-61
* concentric disk (thin-lens DoF)  — kernel.cu:85-103
* naive orthonormal basis          — kernel.cu:76-84
* cosine-weighted hemisphere       — kernel.cu:287-296
* solar cone sample                — sunsky.cu:163-184
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = [
    "stratified_2d",
    "concentric_disk",
    "orthonormal_basis",
    "cosine_hemisphere",
    "cone_sample",
    "ortho_vector",
]


@partial(jax.jit, static_argnames=("n", "width", "height"))
def stratified_2d(key, n: int, width: int = 4, height: int = 4):
    """[n, 2] stratified samples on [0,1]^2: random stratum + jitter within it.

    Mirrors Random2DStratifiedSample (kernel.cu:40-61): each sample picks one of
    the width*height strata uniformly, then jitters uniformly inside it.
    """
    k1, k2 = jax.random.split(key)
    stratum = jax.random.randint(k1, (n,), 0, width * height)
    sx = (stratum % width).astype(jnp.float32)
    sy = ((stratum // width) % height).astype(jnp.float32)
    jitter = jax.random.uniform(k2, (n, 2))
    return jnp.stack([
        (sx + jitter[:, 0]) / width,
        (sy + jitter[:, 1]) / height,
    ], axis=1)


@jax.jit
def concentric_disk(u):
    """Map [n,2] uniform samples to the unit disk, area-preserving
    (ConcentricSampleDisk, kernel.cu:85-103)."""
    off = 2.0 * u - 1.0
    x, y = off[..., 0], off[..., 1]
    zero = (x == 0) & (y == 0)
    use_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(use_x, x, y)
    safe_x = jnp.where(x == 0, 1.0, x)
    safe_y = jnp.where(y == 0, 1.0, y)
    theta = jnp.where(
        use_x,
        (jnp.pi / 4) * (y / safe_x),
        (jnp.pi / 2) - (jnp.pi / 4) * (x / safe_y),
    )
    pt = r[..., None] * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    return jnp.where(zero[..., None], 0.0, pt)


def orthonormal_basis(w):
    """(u, v) completing unit [..., 3] w to an orthonormal frame
    (computeOrthonormalBasisNaive, kernel.cu:76-84)."""
    near_x = jnp.abs(w[..., 0]) > 0.9
    pick = jnp.where(
        near_x[..., None],
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
        jnp.asarray([1.0, 0.0, 0.0], jnp.float32),
    )
    u = jnp.cross(pick, w)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    v = jnp.cross(w, u)
    return u, v


@jax.jit
def cosine_hemisphere(key, normal):
    """Cosine-weighted bounce directions about [..., 3] normals
    (shade kernel, kernel.cu:287-296)."""
    shape = normal.shape[:-1]
    k1, k2 = jax.random.split(key)
    r1 = 2.0 * jnp.pi * jax.random.uniform(k1, shape)
    r2 = jax.random.uniform(k2, shape)
    r2s = jnp.sqrt(r2)
    u, v = orthonormal_basis(normal)
    d = (u * (jnp.cos(r1) * r2s)[..., None]
         + v * (jnp.sin(r1) * r2s)[..., None]
         + normal * jnp.sqrt(1.0 - r2)[..., None])
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def ortho_vector(v):
    """Any vector orthogonal to v (ortho, sunsky.cu:163-166)."""
    use_x = jnp.abs(v[..., 0]) > jnp.abs(v[..., 2])
    a = jnp.stack([-v[..., 1], v[..., 0], jnp.zeros_like(v[..., 0])], axis=-1)
    b = jnp.stack([jnp.zeros_like(v[..., 0]), -v[..., 2], v[..., 1]], axis=-1)
    return jnp.where(use_x[..., None], a, b)


@partial(jax.jit, static_argnames="shape")
def cone_sample(key, direction, extent, shape=()):
    """Uniform directions in a cone of given extent about ``direction``
    (getConeSample, sunsky.cu:170-184). ``direction``: [3] or [..., 3]."""
    direction = jnp.asarray(direction, jnp.float32)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    if direction.ndim == 1 and shape:
        direction = jnp.broadcast_to(direction, (*shape, 3))
    o1 = ortho_vector(direction)
    o1 = o1 / jnp.linalg.norm(o1, axis=-1, keepdims=True)
    o2 = jnp.cross(direction, o1)
    o2 = o2 / jnp.linalg.norm(o2, axis=-1, keepdims=True)

    out_shape = direction.shape[:-1]
    k1, k2 = jax.random.split(key)
    rx = jax.random.uniform(k1, out_shape) * 2.0 * jnp.pi
    ry = 1.0 - jax.random.uniform(k2, out_shape) * extent
    oneminus = jnp.sqrt(1.0 - ry * ry)
    return (jnp.cos(rx)[..., None] * oneminus[..., None] * o1
            + jnp.sin(rx)[..., None] * oneminus[..., None] * o2
            + ry[..., None] * direction)
