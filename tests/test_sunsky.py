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
    np.testing.assert_allclose(np.linalg.norm(SUN), 1.0, rtol=2e-5)


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
                               rtol=2e-5)


def test_sun_radiance_positive_above_horizon():
    v = np.asarray(ss.sun(jnp.asarray(SUN)[None, :], jnp.asarray(SUN), CFG))
    assert (v > 0).all()


def test_sky_factor_scales():
    d = norm([0.3, 0.2, 0.9])
    a = ss.sky(jnp.asarray(d)[None], jnp.asarray(SUN), CFG)
    b = ss.sky(jnp.asarray(d)[None], jnp.asarray(SUN),
               SunSkyConfig(sky_factor=2.0))
    np.testing.assert_allclose(np.asarray(b), 2 * np.asarray(a), rtol=2e-5)


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


# ---------------------------------------------------------------------------
# Tabulated reference goldens (SURVEY.md section 4: "tabulate reference
# values, assert allclose").  Computed in double precision by an independent
# scalar transcription of /root/reference/src/sunsky.cu:10-161 with the
# constants of sunsky.cuh:24-42 (see _scalar_oracle below, which regenerates
# them at test time as well).
# ---------------------------------------------------------------------------

GOLD_VIEWS = [
    (0.0, 0.0, 1.0),
    tuple(norm([1.0, 0.0, 0.2])),
    tuple(norm([-0.5, 0.3, 0.05])),
    tuple(norm([0.2, -0.8, 0.55])),
    None,  # filled with the exact sun direction below
    tuple(norm([0.1, 0.1, -0.3])),
]

SKY_GOLD = np.array([
    (0.007609113870041512, 0.018532002320531826, 0.03846709465171637),
    (0.054247548934366376, 0.11325225434679355, 0.1731400573309357),
    (0.09392486447545782, 0.149501824127906, 0.16592880406937408),
    (0.01264014177634361, 0.029823157182210396, 0.05798242226547634),
    (0.40381893265935814, 0.542616649419899, 0.6309853105881849),
    (0.1312533074244576, 0.13779679695211253, 0.14163326749899838),
])

SUNSKY_GOLD = np.array([
    (0.007609113870041512, 0.018532002320531826, 0.03846709465171637),
    (0.054247548934366376, 0.11325225434679355, 0.1731400573309357),
    (0.09392486447545782, 0.149501824127906, 0.16592880406937408),
    (0.01264014177634361, 0.029823157182210396, 0.05798242226547634),
    (0.7507127134539968, 0.8243480849181605, 0.8143557370399086),
    (0.1312533074244576, 0.13779679695211253, 0.14163326749899838),
])

SUN_GOLD = np.array([
    (38306.51492259483, 35916.56142396449, 31444.756434486542),
    (31921.548473581628, 22983.92203131898, 11667.384909610106),
    (23794.09763801426, 11194.286680434403, 2360.971687060012),
    (36963.65805601501, 32911.91246137156, 25898.95269609496),
    (34689.37807946386, 28173.14354982615, 18337.042645172372),
    (0.0, 0.0, 0.0),
])


def _scalar_oracle(view, sun):
    """Double-precision transcription of sunsky.cu:10-161 (sun, sky, sunsky).

    Independent of brickmap_tpu.ops.sunsky — straight from the reference
    formulas, scalar math module only."""
    import math

    pi = math.pi
    cfg = CFG
    rayleigh = (5.176821e-6, 1.2785348e-5, 2.8530756e-5)  # sunsky.cu:41
    c = (0.2 * cfg.turbidity) * 10e-18                    # sunsky.cu:16
    mie = [0.434 * c * pi * ((2.0 * pi) / cfg.primary_wavelengths[i])
           ** (cfg.v - 2.0) * cfg.k[i] * cfg.mie_coefficient
           for i in range(3)]
    cvs = sum(view[i] * sun[i] for i in range(3))
    sun_e = cfg.sun_intensity * max(
        0.0, 1.0 - math.exp(-((cfg.cutoff_angle - math.acos(sun[2]))
                              / cfg.steepness)))          # sunsky.cu:24-26
    zen = max(0.0, view[2])                               # sunsky.cu:49
    fex = [math.exp(-(rayleigh[i] * cfg.rayleigh_zenith_length / zen
                      + mie[i] * cfg.mie_zenith_length / zen))
           if zen > 0 else 0.0 for i in range(3)]         # sunsky.cu:56
    rph = (3.0 / (16.0 * pi)) * (1.0 + cvs * cvs)         # sunsky.cu:11
    g = cfg.mie_directional_g
    hg = (1.0 / (4.0 * pi)) * ((1.0 - g * g)
                               / (1.0 - 2.0 * g * cvs + g * g) ** 1.5)
    some = [sun_e * (rayleigh[i] * rph + mie[i] * hg)
            / (rayleigh[i] + mie[i]) for i in range(3)]
    skyt = [some[i] * (1.0 - fex[i]) for i in range(3)]
    mixf = min(max((1.0 - sun[2]) ** 5, 0.0), 1.0)        # sunsky.cu:110
    skyt = [skyt[i] * ((1.0 - mixf) + math.sqrt(some[i] * fex[i]) * mixf)
            for i in range(3)]
    sky_v = [cfg.sky_factor * 0.01 * s for s in skyt]

    sadc = cfg.sun_angular_diameter_cos
    t = min(max((cvs - sadc) / 0.00002, 0.0), 1.0)        # sunsky.cu:156
    disc = t * t * (3.0 - 2.0 * t)
    sunsky_v = [0.01 * (sun_e * 19000.0 * fex[i] * disc * 1e-5 + skyt[i])
                for i in range(3)]
    # sunsky.cu:70 degenerate disc: cos_sadc < (cvs ? 1 : 0)
    d2 = (1.0 if sadc < 1.0 else 0.0) if cvs != 0.0 else \
        (1.0 if sadc < 0.0 else 0.0)
    sun_v = [0.01 * sun_e * 19000.0 * fex[i] * d2 for i in range(3)]
    return sky_v, sunsky_v, sun_v


def _gold_views():
    views = [np.asarray(SUN, np.float64) if v is None
             else np.asarray(v, np.float64) for v in GOLD_VIEWS]
    return np.stack(views)


def test_golden_regression():
    """Implementation must reproduce the frozen reference-formula values."""
    views = _gold_views()
    dirs = jnp.asarray(views, jnp.float32)
    sky = np.asarray(ss.sky(dirs, jnp.asarray(SUN), CFG))
    sunsky = np.asarray(ss.sunsky(dirs, jnp.asarray(SUN), CFG))
    sun = np.asarray(ss.sun(dirs, jnp.asarray(SUN), CFG))
    np.testing.assert_allclose(sky, SKY_GOLD, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(sunsky, SUNSKY_GOLD, rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(sun, SUN_GOLD, rtol=2e-4, atol=1e-7)


def test_goldens_match_scalar_oracle():
    """The frozen tables above ARE the scalar transcription's output (so a
    golden edit can't silently drift from the reference formulas), and the
    vectorized implementation matches the oracle on a random sphere sweep."""
    views = _gold_views()
    # rtol 2e-5, not exact: SUN here is the float32 device value while the
    # frozen tables were generated with a float64 sun direction.
    for i, v in enumerate(views):
        sky_v, sunsky_v, sun_v = _scalar_oracle(v, np.asarray(SUN, np.float64))
        np.testing.assert_allclose(sky_v, SKY_GOLD[i], rtol=2e-5)
        np.testing.assert_allclose(sunsky_v, SUNSKY_GOLD[i], rtol=2e-5)
        np.testing.assert_allclose(sun_v, SUN_GOLD[i], rtol=2e-5)

    rng = np.random.default_rng(7)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    got_sky = np.asarray(ss.sky(jnp.asarray(dirs, jnp.float32),
                                jnp.asarray(SUN), CFG))
    got_sunsky = np.asarray(ss.sunsky(jnp.asarray(dirs, jnp.float32),
                                      jnp.asarray(SUN), CFG))
    for i, v in enumerate(dirs):
        sky_v, sunsky_v, _ = _scalar_oracle(v, np.asarray(SUN, np.float64))
        np.testing.assert_allclose(got_sky[i], sky_v, rtol=5e-4, atol=1e-7)
        np.testing.assert_allclose(got_sunsky[i], sunsky_v, rtol=5e-4,
                                   atol=1e-7)
