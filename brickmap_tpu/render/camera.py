"""Camera model and primary-ray generation.

Mirrors the reference's fly camera (``camera.h:3-24``, ``camera.cpp:48-54``) and
primary-ray kernel (``kernel.cu:154-222``): pinhole + thin-lens DoF with
stratified 4x4 in-pixel jitter, and the launcher's 1.5*aspect-scaled basis
(``kernel.cu:384-385``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import concentric_disk, stratified_2d

__all__ = ["Camera", "camera_basis", "camera_arrays_for", "primary_rays",
           "primary_rays_from_arrays"]


@dataclass(frozen=True)
class Camera:
    position: tuple = (512.0, 512.0, 300.0)   # camera.h:4
    direction: tuple = (1.0, 0.0, 0.0)
    up: tuple = (0.0, 0.0, 1.0)
    focal_distance: float = 1.0
    lens_radius: float = 0.0

    @classmethod
    def from_angles(cls, position, horizontal: float, vertical: float,
                    **kw) -> "Camera":
        """Direction from yaw/pitch (camera.cpp:49-53)."""
        d = np.array([
            math.cos(vertical) * math.sin(horizontal),
            math.cos(vertical) * math.cos(horizontal),
            math.sin(vertical),
        ])
        d /= np.linalg.norm(d)
        return cls(position=tuple(float(p) for p in position),
                   direction=tuple(d), **kw)

    def replace(self, **kw) -> "Camera":
        return replace(self, **kw)

    @property
    def brick_position(self):
        """Truncated camera position in brick units — the traversal's LoD
        origin (kernel.cu:418 passes camera.position / 8 as ivec3)."""
        return tuple(int(p / 8.0) for p in self.position)


def camera_basis(camera: Camera, width: int, height: int):
    """(right, up) screen basis scaled by 1.5*aspect / 1.5 (kernel.cu:384-385)."""
    d = np.asarray(camera.direction, np.float32)
    up = np.asarray(camera.up, np.float32)
    right = np.cross(d, up)
    right = right / np.linalg.norm(right) * 1.5 * (width / height)
    up2 = np.cross(right, d)
    up2 = up2 / np.linalg.norm(up2) * 1.5
    return right.astype(np.float32), up2.astype(np.float32)


def camera_arrays_for(camera: Camera, sun_direction, width: int, height: int):
    """Pack the traced (non-static) camera inputs for the render programs."""
    right, up2 = camera_basis(camera, width, height)
    d = jnp.asarray(camera.direction, jnp.float32)
    return {
        "position": jnp.asarray(camera.position, jnp.float32),
        "direction": d / jnp.linalg.norm(d),
        "right": jnp.asarray(right),
        "up": jnp.asarray(up2),
        "focal_distance": jnp.float32(camera.focal_distance),
        "lens_radius": jnp.float32(camera.lens_radius),
        "sun_direction": jnp.asarray(sun_direction, jnp.float32),
    }


def primary_rays_from_arrays(key, camera_arrays, idx, width: int, height: int,
                             focal_slider_scale: float = 3.0):
    """Camera rays for explicit pixel indices ``idx`` -> (origins, dirs).

    The single implementation behind both the batch renderer and the tests:
    stratified 4x4 in-pixel jitter + thin-lens DoF per kernel.cu:170-198
    (including the ``ImGui_slider_hack`` 3x focal scale).
    """
    n = idx.shape[0]
    x = (idx % width).astype(jnp.float32)
    y = (idx // width).astype(jnp.float32)

    k1, k2 = jax.random.split(key)
    jitter = stratified_2d(k1, n)
    px = x - jitter[:, 0]
    py = y - jitter[:, 1]
    ni = px / width - 0.5
    nj = (height - py) / height - 0.5

    origin = camera_arrays["position"]
    to_focal = (camera_arrays["direction"][None, :]
                + ni[:, None] * camera_arrays["right"]
                + nj[:, None] * camera_arrays["up"])
    to_focal = to_focal / jnp.linalg.norm(to_focal, axis=1, keepdims=True)
    converge = origin + (camera_arrays["focal_distance"]
                         * focal_slider_scale) * to_focal

    lens_uv = jax.random.uniform(k2, (n, 2))
    p_lens = camera_arrays["lens_radius"] * concentric_disk(lens_uv)
    origins = (origin[None, :]
               + camera_arrays["right"][None, :] * p_lens[:, 0:1]
               + camera_arrays["up"][None, :] * p_lens[:, 1:2])
    dirs = converge - origins
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    return origins, dirs


def primary_rays(key, camera: Camera, width: int, height: int,
                 focal_slider_scale: float = 3.0):
    """Camera rays for every pixel: ([N,3] origins, [N,3] dirs, [N] pixel ids).

    Convenience wrapper over :func:`primary_rays_from_arrays` (row-major
    pixel order)."""
    idx = jnp.arange(width * height, dtype=jnp.int32)
    arrays = camera_arrays_for(camera, jnp.zeros(3, jnp.float32), width,
                               height)
    origins, dirs = primary_rays_from_arrays(
        key, arrays, idx, width, height, focal_slider_scale)
    return origins, dirs, idx
