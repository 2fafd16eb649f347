"""SE(3)/SO(3) utilities in JAX (float32, batched, jit-friendly).

Poses are (R, t) with R: [..., 3, 3], t: [..., 3], mapping sensor/body points
into world: p_w = R @ p_s + t. Also exp/log maps used by the pose-graph
backend (Gauss-Newton on SE(3) with right-multiplicative increments).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_TINY = 1e-12


def _safe_theta(w):
    """Differentiable-at-zero rotation angle: [..., 3] -> ([...,1,1] theta,
    [...,1,1] theta^2). Gradients are exact for theta > sqrt(_TINY) and zero
    (not NaN) at w = 0 — required because the factor-graph optimizer takes
    jacfwd of exp/log at the origin."""
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta = jnp.sqrt(jnp.maximum(theta2, _TINY))
    return theta, theta2


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [..., 3] -> [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation."""
    theta, t2 = _safe_theta(w)
    K = hat(w)
    K2 = K @ K
    # wide Taylor branch: 1-cos(theta) is float32-degenerate below ~3e-2
    small = t2 < 1e-3
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 3] axis-angle."""
    # atan2 formulation: |w_skew| = 2 sin(theta), trace = 1 + 2 cos(theta).
    # arccos has an infinite derivative at theta=0, which poisons jacfwd at
    # the origin (the factor-graph linearization point); atan2 is smooth there.
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    w_skew = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(w_skew * w_skew, axis=-1), _TINY))
    theta = jnp.arctan2(sin_theta, cos_theta)
    small = (sin_theta[..., None] < 1e-5)
    safe_sin = jnp.where(small, 1.0, sin_theta[..., None])
    scale = jnp.where(
        small,
        0.5 + theta[..., None] ** 2 / 12.0,
        theta[..., None] / (2.0 * safe_sin),
    )
    return scale * w_skew


def se3_exp(xi: jnp.ndarray):
    """[..., 6] (rho, w) -> (R [...,3,3], t [...,3]). rho = translation part."""
    rho, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    theta, t2 = _safe_theta(w)
    K = hat(w)
    K2 = K @ K
    small = t2 < 1e-3
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / (theta * theta))
    c = jnp.where(
        small, 1.0 / 6.0 - t2 / 120.0, (theta - jnp.sin(theta)) / (theta * theta * theta)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    V = eye + b * K + c * K2
    t = (V @ rho[..., None])[..., 0]
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> [..., 6] (rho, w)."""
    w = so3_log(R)
    theta, t2 = _safe_theta(w)
    K = hat(w)
    K2 = K @ K
    # V^{-1} = I - K/2 + (1/theta^2)(1 - theta sin / (2 (1-cos))) K^2
    # The Taylor branch must cover all theta where 1-cos(theta) is degenerate
    # in float32 (catastrophic near 1.0): switch at theta ~ 3e-2.
    small = t2 < 1e-3
    denom = jnp.where(small, 1.0, jnp.maximum(2.0 * (1.0 - jnp.cos(theta)), 1e-9))
    coef = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        (1.0 - theta * jnp.sin(theta) / denom) / jnp.maximum(theta * theta, 1e-12),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    Vinv = eye - 0.5 * K + coef * K2
    rho = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, w], axis=-1)


def compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): first apply b, then a."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform_points(R, t, points):
    """Apply pose to points [..., N, 3] (R,t broadcast over leading dims)."""
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def between(Ra, ta, Rb, tb):
    """Relative pose a^{-1} ∘ b (the 'between' factor measurement model)."""
    Ri, ti = inverse(Ra, ta)
    return compose(Ri, ti, Rb, tb)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) unit quaternion -> [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def interpolate_pose(Ra, ta, Rb, tb, alpha):
    """Geodesic interpolation between two poses (alpha in [0,1])."""
    Rrel, trel = between(Ra, ta, Rb, tb)
    xi = se3_log(Rrel, trel)
    Ri, ti = se3_exp(alpha * xi)
    return compose(Ra, ta, Ri, ti)
