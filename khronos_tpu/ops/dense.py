"""Dense 3D grid ops: separable pooling stencils and label propagation.

These are the TPU-native replacements for the reference's voxel-neighborhood
searches (spatial_hash NeighborSearch, 6/18/26 connectivity) and stack-based
region growing (free_space_motion_detector.cpp:205-272): fixed-iteration
label propagation over a dense grid instead of data-dependent flood fill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pool1d(x: jnp.ndarray, axis: int, reducer, pad_value) -> jnp.ndarray:
    """3-wide reduction window along one axis (edge-padded with pad_value)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, constant_values=pad_value)
    n = x.shape[axis]
    lo = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    mid = jax.lax.slice_in_dim(xp, 1, n + 1, axis=axis)
    hi = jax.lax.slice_in_dim(xp, 2, n + 2, axis=axis)
    return reducer(reducer(lo, mid), hi)


def max_pool3(x: jnp.ndarray, pad_value=None) -> jnp.ndarray:
    """26-neighborhood (3x3x3) max, separable. x: [..., X, Y, Z]."""
    if pad_value is None:
        pad_value = jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    r = jnp.maximum
    for axis in (-3, -2, -1):
        x = _pool1d(x, axis % x.ndim, r, pad_value)
    return x


def min_pool3(x: jnp.ndarray, pad_value=None) -> jnp.ndarray:
    """26-neighborhood (3x3x3) min, separable."""
    if pad_value is None:
        pad_value = jnp.finfo(x.dtype).max if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max
    r = jnp.minimum
    for axis in (-3, -2, -1):
        x = _pool1d(x, axis % x.ndim, r, pad_value)
    return x


def all_pool3(mask: jnp.ndarray, pad_value=False) -> jnp.ndarray:
    """True where the full 3x3x3 neighborhood of a bool grid is True."""
    return min_pool3(mask.astype(jnp.int32), pad_value=1 if pad_value else 0) > 0


def any_pool3(mask: jnp.ndarray) -> jnp.ndarray:
    """True where any of the 3x3x3 neighborhood is True."""
    return max_pool3(mask.astype(jnp.int32), pad_value=0) > 0


def dilate(mask: jnp.ndarray, iterations: int) -> jnp.ndarray:
    for _ in range(iterations):
        mask = any_pool3(mask)
    return mask


@functools.partial(jax.jit, static_argnames=("iterations",))
def propagate_labels_3d(
    labels: jnp.ndarray, growable: jnp.ndarray, iterations: int
) -> jnp.ndarray:
    """Connected-component growth by iterated 26-neighbor max-label propagation.

    labels: int32 grid, -1 = unlabeled (seed cells carry unique positive ids).
    growable: bool grid — cells labels may spread into (seeds should be True).
    After `iterations` rounds, connected growable regions containing >=1 seed
    share the max seed label within reach; components merge to the max label
    where they touch. Deterministic and fixed-shape (TPU-friendly), replacing
    the reference's stack-based region growing.
    """
    labels = jnp.where(growable, labels, -1)

    def body(_, lab):
        spread = max_pool3(lab, pad_value=-1)
        return jnp.where(growable, jnp.maximum(lab, spread), -1)

    return jax.lax.fori_loop(0, iterations, body, labels)


@functools.partial(jax.jit, static_argnames=("iterations",))
def propagate_labels_2d(labels: jnp.ndarray, growable: jnp.ndarray, iterations: int, full_connectivity: bool = True) -> jnp.ndarray:
    """2D variant (image connected components), 8- or 4-connected."""
    labels = jnp.where(growable, labels, -1)

    def spread8(lab):
        out = lab
        for axis in (0, 1):
            out = _pool1d(out, axis, jnp.maximum, -1)
        return out

    def spread4(lab):
        a = _pool1d(lab, 0, jnp.maximum, -1)
        b = _pool1d(lab, 1, jnp.maximum, -1)
        return jnp.maximum(a, b)

    spread = spread8 if full_connectivity else spread4

    def body(_, lab):
        return jnp.where(growable, jnp.maximum(lab, spread(lab)), -1)

    return jax.lax.fori_loop(0, iterations, body, labels)


def compact_labels(labels_flat: jnp.ndarray, max_clusters: int):
    """Map arbitrary int labels (-1 = none) to compact ids [0, max_clusters).

    Returns (compact_labels_flat, unique_labels[max_clusters] with -1 fill,
    n_clusters). Fixed-shape (jit-safe).
    """
    uniq = jnp.unique(labels_flat, size=max_clusters + 1, fill_value=-1)
    # uniq is sorted; -1 occupies the front if present. Build id map by search.
    is_real = uniq >= 0
    reals = jnp.where(is_real, uniq, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(reals)
    sorted_reals = reals[order]
    n = jnp.sum(is_real)
    idx = jnp.searchsorted(sorted_reals, labels_flat)
    idx = jnp.clip(idx, 0, max_clusters - 1)
    hit = sorted_reals[idx] == labels_flat
    compact = jnp.where((labels_flat >= 0) & hit, idx, -1)
    uniq_out = jnp.where(sorted_reals[:max_clusters] == jnp.iinfo(jnp.int32).max, -1, sorted_reals[:max_clusters])
    return compact, uniq_out, n


def _shift3(arr: jnp.ndarray, offset, fill):
    """Shift a 3D grid by integer offset (data moves by +offset), fill edges."""
    out = arr
    for axis, o in enumerate(offset):
        if o == 0:
            continue
        n = out.shape[axis]
        pad = [(0, 0)] * out.ndim
        pad[axis] = (max(o, 0), max(-o, 0))
        padded = jnp.pad(out, pad, constant_values=fill)
        out = jax.lax.slice_in_dim(padded, max(-o, 0), max(-o, 0) + n, axis=axis)
    return out


_FACE_OFFSETS_3D = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)]


@functools.partial(jax.jit, static_argnames=("iterations",))
def propagate_labels_keyed_3d(
    labels: jnp.ndarray, key: jnp.ndarray, growable: jnp.ndarray, iterations: int
) -> jnp.ndarray:
    """Label propagation constrained to neighbors with equal `key` (6-conn).

    Used for per-class connected components (ConnectedSemantics 3D mode,
    reference connected_semantics.cpp:70-144): labels only spread between
    voxels of the same semantic class.
    """
    labels = jnp.where(growable, labels, -1)

    def body(_, lab):
        best = lab
        for off in _FACE_OFFSETS_3D:
            nl = _shift3(lab, off, -1)
            nk = _shift3(key, off, jnp.int32(-2))
            best = jnp.maximum(best, jnp.where(nk == key, nl, -1))
        return jnp.where(growable, best, -1)

    return jax.lax.fori_loop(0, iterations, body, labels)


@functools.partial(jax.jit, static_argnames=("iterations", "full_connectivity"))
def propagate_labels_keyed_2d(
    labels: jnp.ndarray,
    key: jnp.ndarray,
    growable: jnp.ndarray,
    iterations: int,
    full_connectivity: bool = True,
) -> jnp.ndarray:
    """2D image variant (ConnectedSemantics 2D mode, 4/8-connectivity)."""
    labels = jnp.where(growable, labels, -1)
    if full_connectivity:
        offsets = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1) if (di, dj) != (0, 0)]
    else:
        offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]

    def shift2(arr, off, fill):
        out = arr
        for axis, o in enumerate(off):
            if o == 0:
                continue
            n = out.shape[axis]
            pad = [(0, 0)] * out.ndim
            pad[axis] = (max(o, 0), max(-o, 0))
            padded = jnp.pad(out, pad, constant_values=fill)
            out = jax.lax.slice_in_dim(padded, max(-o, 0), max(-o, 0) + n, axis=axis)
        return out

    def body(_, lab):
        best = lab
        for off in offsets:
            nl = shift2(lab, off, -1)
            nk = shift2(key, off, jnp.int32(-2))
            best = jnp.maximum(best, jnp.where(nk == key, nl, -1))
        return jnp.where(growable, best, -1)

    return jax.lax.fori_loop(0, iterations, body, labels)
