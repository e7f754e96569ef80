"""Preetham-style analytic sun/sky radiance, vectorized in jnp.

Behavioral port of the reference's adapted GLSL scattering model
(``/root/reference/src/sunsky.cu:10-161``; constants ``sunsky.cuh:24-42``):
Rayleigh + Mie (Henyey–Greenstein) extinction and in-scattering with zenith
optical lengths, horizon sun-intensity falloff, and a smoothstep solar disc.

Three radiance variants, same roles as the reference:

* :func:`sun`     — NEE radiance along a sampled sun-cone direction (sunsky.cu:32-74)
* :func:`sky`     — sky radiance for bounce-miss rays (sunsky.cu:76-114)
* :func:`sunsky`  — sky + solar disc for primary-miss rays (sunsky.cu:116-161)

All functions take view directions [..., 3] and a sun direction [3]; everything
is float32 and shape-polymorphic (works inside Pallas kernels too).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SunSkyConfig

__all__ = ["sun", "sky", "sunsky", "sun_direction_from_position", "cone_extent"]

_UP = (0.0, 0.0, 1.0)


def sun_direction_from_position(sun_position):
    """Spherical-coordinate sun direction from the UI's 2-D sun position.

    Mirrors kernel.cu:393: ``fromSpherical((pos - (0, 0.5)) * (6.28, 3.14))``.
    """
    p = (jnp.asarray(sun_position, jnp.float32)
         - jnp.asarray([0.0, 0.5], jnp.float32)) \
        * jnp.asarray([6.28, 3.14], jnp.float32)
    d = jnp.stack([
        jnp.cos(p[0]) * jnp.sin(p[1]),
        jnp.sin(p[0]) * jnp.sin(p[1]),
        jnp.cos(p[1]),
    ])
    return d / jnp.linalg.norm(d)


def cone_extent(cfg: SunSkyConfig) -> float:
    """Solar-cone extent used for NEE sampling: 1 - cos(angular diameter)."""
    return 1.0 - cfg.sun_angular_diameter_cos


def _rayleigh_phase(cos_vs):
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_vs ** 2)


def _hg_phase(cos_vs, g):
    return (1.0 / (4.0 * jnp.pi)) * (
        (1.0 - g ** 2) / (1.0 - 2.0 * g * cos_vs + g ** 2) ** 1.5
    )


def _total_mie(cfg: SunSkyConfig):
    wavelengths = jnp.asarray(cfg.primary_wavelengths, jnp.float32)
    k = jnp.asarray(cfg.k, jnp.float32)
    c = (0.2 * cfg.turbidity) * 10e-18
    return 0.434 * c * jnp.pi * (2.0 * jnp.pi / wavelengths) ** (cfg.v - 2.0) * k


def _sun_intensity(cos_zenith, cfg: SunSkyConfig):
    return cfg.sun_intensity * jnp.maximum(
        0.0,
        1.0 - jnp.exp(-((cfg.cutoff_angle - jnp.arccos(cos_zenith))
                        / cfg.steepness)),
    )


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _common(view_dir, sun_dir, cfg: SunSkyConfig):
    """Shared scattering core of sun/sky/sunsky (sunsky.cu:33-67 et al.).

    Returns (sun_e, fex [...,3], sky_term [...,3], cos_view_sun).
    """
    view_dir = jnp.asarray(view_dir, jnp.float32)
    sun_dir = jnp.asarray(sun_dir, jnp.float32)
    up = jnp.asarray(_UP, jnp.float32)

    cos_view_sun = jnp.sum(view_dir * sun_dir, axis=-1)
    cos_sun_up = jnp.sum(sun_dir * up, axis=-1)
    cos_up_view = jnp.sum(view_dir * up, axis=-1)

    sun_e = _sun_intensity(cos_sun_up, cfg)

    rayleigh = jnp.asarray([5.176821e-6, 1.2785348e-5, 2.8530756e-5],
                           jnp.float32)
    mie = _total_mie(cfg) * cfg.mie_coefficient

    zenith = jnp.maximum(0.0, cos_up_view)
    # 1/0 -> inf -> exp(-inf) = 0 below the horizon, as in the reference.
    rayleigh_len = cfg.rayleigh_zenith_length / zenith
    mie_len = cfg.mie_zenith_length / zenith

    fex = jnp.exp(-(rayleigh * rayleigh_len[..., None]
                    + mie * mie_len[..., None]))

    rayleigh_to_eye = rayleigh * _rayleigh_phase(cos_view_sun)[..., None]
    mie_to_eye = mie * _hg_phase(cos_view_sun, cfg.mie_directional_g)[..., None]

    some = sun_e[..., None] * ((rayleigh_to_eye + mie_to_eye)
                               / (rayleigh + mie))
    sky_term = some * (1.0 - fex)
    horizon_mix = jnp.clip((1.0 - cos_sun_up) ** 5, 0.0, 1.0)
    sky_term = sky_term * (
        (1.0 - horizon_mix) + jnp.sqrt(some * fex) * horizon_mix
    )
    return sun_e, fex, sky_term, cos_view_sun


@partial(jax.jit, static_argnames="cfg")
def sun(view_dir, sun_dir, cfg: SunSkyConfig = SunSkyConfig()):
    """Solar radiance along a sampled cone direction (sunsky.cu:32-74)."""
    sun_e, fex, _, cos_vs = _common(view_dir, sun_dir, cfg)
    # Reference quirk (sunsky.cu:70): the disc test degenerates to
    # "cos_sadc < (cos_vs != 0 ? 1 : 0)", i.e. 1 whenever the angle is nonzero.
    disc = jnp.where(
        cos_vs != 0.0,
        jnp.float32(cfg.sun_angular_diameter_cos < 1.0),
        jnp.float32(cfg.sun_angular_diameter_cos < 0.0),
    )
    return 0.01 * (sun_e[..., None] * 19000.0 * fex) * disc[..., None]


@partial(jax.jit, static_argnames="cfg")
def sky(view_dir, sun_dir, cfg: SunSkyConfig = SunSkyConfig()):
    """Sky radiance for bounce-miss rays (sunsky.cu:76-114)."""
    _, _, sky_term, _ = _common(view_dir, sun_dir, cfg)
    return cfg.sky_factor * 0.01 * sky_term


@partial(jax.jit, static_argnames="cfg")
def sunsky(view_dir, sun_dir, cfg: SunSkyConfig = SunSkyConfig()):
    """Sky + smoothstep solar disc for primary-miss rays (sunsky.cu:116-161)."""
    sun_e, fex, sky_term, cos_vs = _common(view_dir, sun_dir, cfg)
    sadc = cfg.sun_angular_diameter_cos
    disc = _smoothstep(sadc, sadc + 0.00002, cos_vs)
    sun_term = (sun_e[..., None] * 19000.0 * fex) * disc[..., None] * 1e-5
    return 0.01 * (sun_term + sky_term)
