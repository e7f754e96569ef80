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

__all__ = ["Camera", "camera_basis", "primary_rays"]


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


def primary_rays(key, camera: Camera, width: int, height: int,
                 focal_slider_scale: float = 3.0):
    """Camera rays for every pixel: ([N,3] origins, [N,3] dirs, [N] pixel ids).

    Pixel (x, y) maps to index y*width + x; jitter/DoF per kernel.cu:170-198
    (including the ``ImGui_slider_hack`` 3x focal scale).
    """
    n = width * height
    right, up2 = camera_basis(camera, width, height)
    right = jnp.asarray(right)
    up2 = jnp.asarray(up2)
    cam_dir = jnp.asarray(camera.direction, jnp.float32)
    cam_dir = cam_dir / jnp.linalg.norm(cam_dir)
    origin = jnp.asarray(camera.position, jnp.float32)

    idx = jnp.arange(n, dtype=jnp.int32)
    x = (idx % width).astype(jnp.float32)
    y = (idx // width).astype(jnp.float32)

    k1, k2 = jax.random.split(key)
    jitter = stratified_2d(k1, n)
    px = x - jitter[:, 0]
    py = y - jitter[:, 1]

    ni = px / width - 0.5
    nj = (height - py) / height - 0.5

    to_focal = cam_dir[None, :] + ni[:, None] * right + nj[:, None] * up2
    to_focal = to_focal / jnp.linalg.norm(to_focal, axis=1, keepdims=True)

    converge = origin + (camera.focal_distance * focal_slider_scale) * to_focal

    lens_uv = jax.random.uniform(k2, (n, 2))
    p_lens = camera.lens_radius * concentric_disk(lens_uv)
    new_origin = (origin[None, :] + right[None, :] * p_lens[:, 0:1]
                  + up2[None, :] * p_lens[:, 1:2])
    direction = converge - new_origin
    direction = direction / jnp.linalg.norm(direction, axis=1, keepdims=True)
    return new_origin, direction, idx
