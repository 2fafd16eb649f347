"""Robust point-cloud registration: GNC-TLS (TEASER++-parity slot).

The reference verifies loop-closure candidates with TEASER++ robust
registration (hydra LCD, khronos_ros/config/mapper/uHumans2.yaml:298-307
teaser params; SURVEY.md §2.3). TEASER's ingredients are (a) truncated-least-
squares (TLS) estimation solved by graduated non-convexity (GNC, Yang et al.)
and (b) combinatorial inlier pruning. The TPU-native design keeps (a) —
GNC-TLS with a closed-form weighted-Horn solve per iteration, a fixed
`lax.scan` schedule (no data-dependent control flow) — and replaces the
combinatorial max-clique with the GNC weights themselves, which handle the
same >50%-outlier regimes for the correspondence counts LCD produces
(hundreds of points): everything stays one fused XLA program.

Two entry points:
  - `gnc_tls_register(src, dst, noise_bound)`: known putative correspondences
    (src[i] <-> dst[i]); returns (R, t, weights, cost).
  - `robust_icp(src, dst, R0, t0, noise_bound)`: correspondences unknown —
    outer NN-association rounds (like ICP) with a GNC-TLS weighted solve
    inside, initialized from odometry. This is the LCD verify slot.

Conventions match loop_closure.py: the returned (R, t) maps src points into
the dst frame, dst ≈ R @ src + t.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _weighted_horn(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray):
    """Closed-form weighted alignment (Horn/Umeyama, no scale).

    src, dst: [N, 3]; w: [N] nonneg. Returns (R, t) with dst ~= R src + t.
    """
    wsum = jnp.maximum(w.sum(), 1e-9)
    mu_s = (w[:, None] * src).sum(0) / wsum
    mu_d = (w[:, None] * dst).sum(0) / wsum
    H = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.float32(1.0), jnp.float32(1.0), det]))
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return R, t


def _gnc_tls_weights(r2: jnp.ndarray, mu: jnp.ndarray, c2: jnp.ndarray) -> jnp.ndarray:
    """GNC-TLS weight update (Yang et al. 2020, eq. 14).

    r2: squared residuals; c2: squared truncation (noise bound); mu: GNC
    control parameter (mu -> inf recovers hard TLS).
    """
    lo = mu / (mu + 1.0) * c2
    hi = (mu + 1.0) / mu * c2
    w_mid = jnp.sqrt(c2 * mu * (mu + 1.0) / jnp.maximum(r2, 1e-12)) - mu
    w = jnp.where(r2 <= lo, 1.0, jnp.where(r2 >= hi, 0.0, w_mid))
    return jnp.clip(w, 0.0, 1.0)


@partial(jax.jit, static_argnames=("iters",))
def gnc_tls_register(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    noise_bound: float,
    valid=None,
    iters: int = 32,
):
    """Robust SE(3) fit over putative correspondences src[i] <-> dst[i].

    valid: optional [N] mask for padded entries. Returns (R, t, w, inlier_rms)
    where w are final GNC-TLS weights in [0, 1] (0 = rejected outlier) and
    inlier_rms is the weighted residual RMS.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    N = src.shape[0]
    vmask = jnp.ones((N,), jnp.float32) if valid is None else jnp.asarray(valid, jnp.float32)
    c2 = jnp.float32(noise_bound) ** 2

    # init: unweighted fit; mu from the max residual (GNC schedule start)
    R, t = _weighted_horn(src, dst, vmask)
    r2 = jnp.sum((src @ R.T + t - dst) ** 2, axis=-1) * vmask
    r2max = jnp.maximum(r2.max(), c2 * (1.0 + 1e-3))
    mu0 = c2 / (2.0 * r2max - c2)

    def step(carry, _):
        R, t, mu = carry
        r2 = jnp.sum((src @ R.T + t - dst) ** 2, axis=-1)
        w = _gnc_tls_weights(r2, mu, c2) * vmask
        R, t = _weighted_horn(src, dst, w)
        return (R, t, jnp.minimum(mu * 1.4, 1e6)), None

    (R, t, _), _ = jax.lax.scan(step, (R, t, mu0), None, length=iters)
    # final polish: hard-TLS inlier set, unweighted refit (TEASER's last step)
    for _ in range(2):
        r2 = jnp.sum((src @ R.T + t - dst) ** 2, axis=-1)
        w = _gnc_tls_weights(r2, jnp.float32(1e6), c2) * vmask
        # keep the previous estimate if the hard inlier set is degenerate
        wr, tr = _weighted_horn(src, dst, w)
        ok = w.sum() >= 3.0
        R = jnp.where(ok, wr, R)
        t = jnp.where(ok, tr, t)
    r2 = jnp.sum((src @ R.T + t - dst) ** 2, axis=-1)
    w = _gnc_tls_weights(r2, jnp.float32(1e6), c2) * vmask  # hard TLS verdict
    wsum = jnp.maximum(w.sum(), 1e-9)
    inlier_rms = jnp.sqrt((w * r2).sum() / wsum)
    return R, t, w, inlier_rms


@partial(jax.jit, static_argnames=("outer_iters", "gnc_iters"))
def robust_icp(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    noise_bound: float = 0.1,
    outer_iters: int = 12,
    gnc_iters: int = 12,
):
    """ICP with a GNC-TLS robust core: outer rounds re-associate by nearest
    neighbor under the current estimate; the inner solve downweights
    wrong associations instead of trusting them (plain point-to-point ICP's
    failure mode under partial overlap). Returns (R, t, inlier_rms,
    inlier_fraction)."""
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    c2 = jnp.float32(noise_bound) ** 2
    # anneal the truncation over outer rounds: loose early (capture region
    # with a coarse initialization), tight late (precision)
    c2_sched = c2 * jnp.geomspace(4.0, 1.0, outer_iters).astype(jnp.float32)

    def outer(carry, c2_round):
        R, t = carry
        moved = src @ R.T + t
        d2 = jnp.sum((moved[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
        nn = jnp.argmin(d2, axis=1)
        target = dst[nn]

        def inner(c2_carry, _):
            R, t, mu = c2_carry
            r2 = jnp.sum((src @ R.T + t - target) ** 2, axis=-1)
            w = _gnc_tls_weights(r2, mu, c2_round)
            R, t = _weighted_horn(src, target, w)
            return (R, t, jnp.minimum(mu * 1.6, 1e6)), None

        r2 = jnp.sum((src @ R.T + t - target) ** 2, axis=-1)
        r2max = jnp.maximum(r2.max(), c2_round * (1.0 + 1e-3))
        mu0 = c2_round / (2.0 * r2max - c2_round)
        (R, t, _), _ = jax.lax.scan(inner, (R, t, mu0), None, length=gnc_iters)
        return (R, t), None

    (R, t), _ = jax.lax.scan(
        outer,
        (jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32)),
        c2_sched,
    )
    moved = src @ R.T + t
    d2 = jnp.sum((moved[:, None, :] - dst[None, :, :]) ** 2, axis=-1)
    r2 = jnp.min(d2, axis=1)
    w = _gnc_tls_weights(r2, jnp.float32(1e6), c2)
    wsum = jnp.maximum(w.sum(), 1e-9)
    inlier_rms = jnp.sqrt((w * r2).sum() / wsum)
    inlier_fraction = w.mean()
    return R, t, inlier_rms, inlier_fraction
