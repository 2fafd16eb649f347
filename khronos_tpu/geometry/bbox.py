"""Axis-aligned bounding boxes with IoU / intersection tests (batched JAX+numpy).

Equivalent of spark_dsg::BoundingBox usage in the reference (SURVEY.md §2.3;
tracker IoU gating max_iou_tracker.cpp:589-593, merge proposal bbox-intersect
gate update_khronos_objects_functor.cpp:61-107).

A bbox is a pair (min [..., 3], max [..., 3]); an invalid/empty box has
min > max (we use +inf/-inf sentinels from `empty()`).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def empty(dtype=np.float32):
    return np.full((3,), np.inf, dtype), np.full((3,), -np.inf, dtype)


def from_points(points, valid=None):
    """Points [..., N, 3] (+ optional bool mask [..., N]) -> (min, max)."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    if valid is not None:
        big = xp.where(valid[..., None], points, xp.inf)
        small = xp.where(valid[..., None], points, -xp.inf)
        return big.min(axis=-2), small.max(axis=-2)
    return points.min(axis=-2), points.max(axis=-2)


def is_valid(bmin, bmax):
    return (bmin <= bmax).all(axis=-1)


def volume(bmin, bmax):
    xp = jnp if isinstance(bmin, jnp.ndarray) else np
    ext = xp.clip(bmax - bmin, 0.0, None)
    return ext[..., 0] * ext[..., 1] * ext[..., 2]


def intersects(amin, amax, bmin, bmax):
    return ((amin <= bmax) & (bmin <= amax)).all(axis=-1)


def intersection_volume(amin, amax, bmin, bmax):
    xp = jnp if isinstance(amin, jnp.ndarray) else np
    lo = xp.maximum(amin, bmin)
    hi = xp.minimum(amax, bmax)
    return volume(lo, hi)


def iou(amin, amax, bmin, bmax):
    """Volumetric IoU; broadcasts, so pairwise matrices come from [N,1,3]x[1,M,3]."""
    inter = intersection_volume(amin, amax, bmin, bmax)
    union = volume(amin, amax) + volume(bmin, bmax) - inter
    xp = jnp if isinstance(amin, jnp.ndarray) else np
    return xp.where(union > 0, inter / xp.where(union > 0, union, 1.0), 0.0)


def pairwise_iou(amin, amax, bmin, bmax):
    """[N,3] boxes vs [M,3] boxes -> [N, M] IoU matrix."""
    return iou(amin[:, None, :], amax[:, None, :], bmin[None, :, :], bmax[None, :, :])


def merge(amin, amax, bmin, bmax):
    xp = jnp if isinstance(amin, jnp.ndarray) else np
    return xp.minimum(amin, bmin), xp.maximum(amax, bmax)


def contains(bmin, bmax, points):
    return ((points >= bmin) & (points <= bmax)).all(axis=-1)


class BboxGrid:
    """Uniform-cell spatial bucket over axis-aligned boxes.

    Neighbor-candidate generation in O(cells touched) per query instead of
    O(n) — the host-side analog of the reference's spatial_hash Grid used to
    keep per-object scans flat as object counts grow (the reference avoids
    all-pairs scans by reporting re-observed objects from the ray hash,
    ray_verificator.cpp:163-182). Consumers: merge-proposal candidate
    generation and the twin-presence veto (VERDICT r3 task 9).
    """

    def __init__(self, mins: np.ndarray, maxs: np.ndarray, cell: float = 0.0):
        mins = np.asarray(mins, np.float32).reshape(-1, 3)
        maxs = np.asarray(maxs, np.float32).reshape(-1, 3)
        self.mins, self.maxs = mins, maxs
        if cell <= 0.0:
            # default: median box diagonal (floored) — boxes touch a handful
            # of cells each regardless of scene scale
            if len(mins):
                diag = np.linalg.norm(np.maximum(maxs - mins, 0.0), axis=1)
                cell = float(max(np.median(diag), 0.5))
            else:
                cell = 1.0
        self.cell = cell
        self._buckets: dict = {}
        for i in range(len(mins)):
            for key in self._cells_of(mins[i], maxs[i]):
                self._buckets.setdefault(key, []).append(i)

    def _cells_of(self, mn, mx):
        lo = np.floor(mn / self.cell).astype(np.int64)
        hi = np.floor(mx / self.cell).astype(np.int64)
        for x in range(lo[0], hi[0] + 1):
            for y in range(lo[1], hi[1] + 1):
                for z in range(lo[2], hi[2] + 1):
                    yield (x, y, z)

    def candidates(self, qmn, qmx) -> np.ndarray:
        """Sorted indices of boxes sharing a grid cell with the query box
        (superset of all boxes intersecting it). Sorted so consumers iterate
        pairs in the same deterministic order as a row-major all-pairs scan
        — merge-proposal chains are order-sensitive."""
        out: set = set()
        for key in self._cells_of(np.asarray(qmn, np.float32), np.asarray(qmx, np.float32)):
            b = self._buckets.get(key)
            if b:
                out.update(b)
        return np.sort(np.fromiter(out, np.int64, len(out)))
