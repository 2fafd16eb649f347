"""Pinhole camera model: projection, back-projection, vertex/range images.

Equivalent of the reference's hydra InputPacket→InputData conversion computing
range and vertex images (SURVEY.md §2.3, active_window.cpp:275
`conversions::parseInputPacket`), designed as pure batched JAX ops.

Conventions: depth image is z-depth along the optical axis (meters, float32),
image shape [H, W]; camera frame is x-right, y-down, z-forward; `T_w_c=(R,t)`
maps camera points to world.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Camera:
    height: int
    width: int
    fx: float
    fy: float
    cx: float
    cy: float
    min_range: float = 0.1
    max_range: float = 5.0

    @property
    def intrinsics(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], dtype=np.float32
        )

    def pixel_rays(self) -> jnp.ndarray:
        """Unit-z ray directions per pixel in camera frame: [H, W, 3]."""
        u = jnp.arange(self.width, dtype=jnp.float32) + 0.5
        v = jnp.arange(self.height, dtype=jnp.float32) + 0.5
        uu, vv = jnp.meshgrid(u, v)
        x = (uu - self.cx) / self.fx
        y = (vv - self.cy) / self.fy
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def back_project(self, depth: jnp.ndarray) -> jnp.ndarray:
        """Depth [H, W] -> camera-frame vertex image [H, W, 3]."""
        return self.pixel_rays() * depth[..., None]

    def range_image(self, depth: jnp.ndarray) -> jnp.ndarray:
        """Euclidean range (distance to camera center) per pixel [H, W]."""
        norms = jnp.linalg.norm(self.pixel_rays(), axis=-1)
        return depth * norms

    def vertex_image_world(self, depth: jnp.ndarray, R_w_c: jnp.ndarray, t_w_c: jnp.ndarray):
        """Depth + pose -> world-frame vertex image [H, W, 3]."""
        pts_c = self.back_project(depth)
        return pts_c @ R_w_c.T + t_w_c

    def project(self, points_c: jnp.ndarray):
        """Camera-frame points [..., 3] -> (u [..,], v [..], z [..]), float pixel coords."""
        z = points_c[..., 2]
        safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
        u = points_c[..., 0] / safe_z * self.fx + self.cx
        v = points_c[..., 1] / safe_z * self.fy + self.cy
        return u, v, z

    def in_image(self, u, v, margin: float = 0.0):
        return (
            (u >= margin)
            & (u <= self.width - 1 - margin)
            & (v >= margin)
            & (v <= self.height - 1 - margin)
        )


def bilinear_sample(image: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear interpolation of image [H, W] (or [H, W, C]) at float coords."""
    H, W = image.shape[0], image.shape[1]
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, W - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, H - 2)
    du = jnp.clip(u - u0, 0.0, 1.0)
    dv = jnp.clip(v - v0, 0.0, 1.0)
    if image.ndim == 3:
        du, dv = du[..., None], dv[..., None]
    i00 = image[v0, u0]
    i01 = image[v0, u0 + 1]
    i10 = image[v0 + 1, u0]
    i11 = image[v0 + 1, u0 + 1]
    return (
        i00 * (1 - du) * (1 - dv)
        + i01 * du * (1 - dv)
        + i10 * (1 - du) * dv
        + i11 * du * dv
    )


def nearest_sample(image: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor lookup (for label/id images)."""
    H, W = image.shape[0], image.shape[1]
    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    return image[vi, ui]
