"""Cluster compaction, statistics, and point subsampling (device, fixed-shape).

Shared by the motion/object detectors and the fused per-frame program: raw
propagated labels -> compact ids -> segment-reduced stats -> renumbered id
image -> per-cluster point subsamples. Everything returns fixed shapes so the
whole frame step stays one compiled program with a single packed host pull.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def unique_smallest(flat: jnp.ndarray, k: int) -> jnp.ndarray:
    """The k smallest distinct non-negative values of an int vector,
    ascending, INT32_MAX-padded. One sort + one top_k — no scatter/gather
    (on the v5e backend every scatter/gather costs ~0.6 ms regardless of
    size, while a 77k sort costs ~0.08 ms)."""
    s = jnp.sort(flat)
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
    sentinel = jnp.iinfo(jnp.int32).max
    cand = jnp.where(first & (s >= 0), s, sentinel)
    return -jax.lax.top_k(-cand, k)[0]  # ascending k smallest


def compact_labels(raw: jnp.ndarray, max_clusters: int, num_values: int = None) -> jnp.ndarray:
    """Raw int labels (-1 = none) -> compact ids in [0, max_clusters), -1 none.

    Ids are assigned in ascending raw-value order; when more than max_clusters
    distinct values exist, the smallest max_clusters are kept.

    Design: extract the <= max_clusters distinct values with sort + top_k,
    then rank every pixel by COMPARING against the unique table
    ([N, max_clusters] elementwise) — zero scatters/gathers. The previous
    dense presence-table path (scatter-max + blockwise cumsum + gather over
    `num_values` cells) measured ~3.3 ms/call on v5e because random
    scatter/gather runs at ~0.1 Gelem/s there; the compare form is ~0.3 ms.
    `num_values` is accepted for backward compatibility and ignored."""
    del num_values
    flat = raw.reshape(-1)
    uniq = unique_smallest(flat, max_clusters)  # [MC] ascending, MAX-padded
    sentinel = jnp.iinfo(jnp.int32).max
    valid_u = uniq < sentinel
    eq = raw[..., None] == uniq
    rank = ((uniq < raw[..., None]) & valid_u).sum(-1)
    return jnp.where(eq.any(-1), rank, -1)


def cluster_stats(
    compact: jnp.ndarray,  # [H, W] ids in [0, MC) or -1
    points_w: jnp.ndarray,  # [H, W, 3]
    extra: jnp.ndarray = None,  # [H, W] extra int (e.g. class) -> segment max
    max_clusters: int = 32,
):
    """Per-cluster (counts, centroid_sums, bbox_min, bbox_max[, extra_max]).

    ONE scatter total: on the v5e backend every scatter costs ~0.67 ms
    regardless of payload (the index stream dominates), so counts and
    centroid sums are computed as a [MC, N] x [N, 4] MXU matmul over the
    cluster one-hot (exact: counts <= N < 2^24 in f32), and only the
    order-statistics (bbox min/max, extra) use a segment-max — with bbox_min
    riding negated and `extra` (small int, e.g. semantic class) as another
    max column."""
    MC = max_clusters
    flat = compact.reshape(-1)
    seg = jnp.where(flat >= 0, flat, MC)
    n = MC + 1
    on = flat >= 0
    pts = points_w.reshape(-1, 3)
    m = on[:, None]
    onehot = (flat[:, None] == jnp.arange(MC, dtype=flat.dtype)).astype(jnp.float32)
    pts4 = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1)
    added = jax.lax.dot_general(
        onehot, jnp.where(m, pts4, 0.0),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [MC, 4]
    sums = added[:, :3]
    counts = added[:, 3].astype(jnp.int32)
    maxcols = [jnp.where(m, pts, -jnp.inf), jnp.where(m, -pts, -jnp.inf)]
    if extra is not None:
        maxcols.append(
            jnp.where(on, extra.reshape(-1), -1).astype(jnp.float32)[:, None]
        )
    maxed = jax.ops.segment_max(
        jnp.concatenate(maxcols, axis=1), seg, num_segments=n
    )[:-1]
    bb_max = maxed[:, 0:3]
    bb_min = -maxed[:, 3:6]
    if extra is None:
        return counts, sums, bb_min, bb_max
    # empty clusters carry the -inf max identity; map them to -1 before the
    # int cast (float->int of -inf is implementation-defined)
    ex = jnp.where(counts > 0, maxed[:, 6], -1.0).astype(jnp.int32)
    return counts, sums, bb_min, bb_max, ex


def filter_and_renumber(
    compact: jnp.ndarray, keep: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop clusters where ~keep; renumber survivors 1..N (0 = background).

    Returns (id_image int32 [H, W], out_ids [MC] mapping compact k -> new id
    or 0). The image-wide LUT lookup is a compare-and-reduce over the MC
    axis, not a gather (fixed ~0.55 ms/gather on the v5e backend)."""
    out_ids = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)), 0)
    mc = keep.shape[0]
    onehot = compact[..., None] == jnp.arange(mc, dtype=compact.dtype)
    img = (onehot * out_ids).sum(-1).astype(jnp.int32)
    return img, out_ids


def exclusive_cumsum_2d(x: jnp.ndarray, rows: int = 128) -> jnp.ndarray:
    """Exclusive prefix sum along axis 0 of [N, C] ints, blockwise two-pass
    (vectorizes across both the row blocks and the C lanes; a flat serial
    scan is the slow path on TPU — see exclusive_cumsum_1d).

    The block COUNT is a fixed power of two (not the block size): under an
    SPMD mesh the leading axis then stays divisible by the shard count, so
    the within-block cumsum partitions cleanly and only the [rows, C]
    per-block totals cross shards. The previous fixed block SIZE gave 75
    blocks at the production shape — indivisible by any mesh — and XLA
    replicated the whole [N, C] input (a 19.7 MB all-gather at N=8, the
    largest collective of the partitioned frame step, SCALING.json r4)."""
    n, c = x.shape
    block = -(-n // rows)
    pad = rows * block - n
    m = jnp.pad(x.astype(jnp.int32), ((0, pad), (0, 0))).reshape(rows, block, c)
    within = jnp.cumsum(m, axis=1)
    row_tot = within[:, -1, :]
    offs = jnp.cumsum(row_tot, axis=0) - row_tot
    excl = within + offs[:, None, :] - m
    return excl.reshape(-1, c)[:n]


@functools.partial(jax.jit, static_argnames=("k", "max_clusters"))
def cluster_point_samples(
    compact: jnp.ndarray,  # [H, W]
    points_w: jnp.ndarray,  # [H, W, 3]
    k: int = 64,
    max_clusters: int = 32,
):
    """Evenly-strided subsample of up to k pixel points per cluster.

    Returns (samples [MC, k, 3], valid [MC, k]); slots [0, min(count, k))
    are filled per cluster. Each pixel's rank within its cluster comes from
    a blockwise segmented running count over the cluster one-hot, and the
    selected pixels land in their slots through ONE scatter — the previous
    argsort + searchsorted + double-gather pipeline cost ~1.4 ms/call on
    v5e where scatters/gathers have a fixed ~0.6 ms cost."""
    MC = max_clusters
    flat = compact.reshape(-1).astype(jnp.int32)
    pts = points_w.reshape(-1, 3)
    on = flat >= 0
    # int8 one-hot: when the pixel axis is sharded over a device mesh, the
    # global prefix count forces this [N, MC] array across shards — at s32
    # it was the largest all-gather of the partitioned frame step (19.7 MB
    # of the 54 MB at N=8, SCALING.json r4). exclusive_cumsum_2d widens to
    # s32 internally, so counts are exact.
    onehot = (flat[:, None] == jnp.arange(MC, dtype=jnp.int32)).astype(jnp.int8)
    oh32 = onehot.astype(jnp.int32)
    rank = (exclusive_cumsum_2d(onehot) * oh32).sum(-1)  # [N] rank in cluster
    counts = oh32.sum(0)  # [MC]
    cnt = (counts[None, :] * oh32).sum(-1)  # own cluster's count per pixel
    small = cnt <= k
    cnt_safe = jnp.maximum(cnt, 1)
    slot_big = (rank * k) // cnt_safe
    sel_big = (rank == 0) | (slot_big > ((rank - 1) * k) // cnt_safe)
    slot = jnp.where(small, rank, slot_big)
    sel = on & (small | sel_big) & (slot < k)
    row = jnp.where(sel, flat, MC)
    col = jnp.where(sel, slot, 0)
    # .add, not .set: slots are unique per selected pixel (rank-based), so
    # add-on-zeros is identical — and unlike set it is commutative, letting
    # the SPMD partitioner do shard-local partial scatters + a small
    # all-reduce of the [MC+1, k, 3] output instead of all-gathering the
    # full [N,3] points + indices (17 MB of the N=8 collective bill)
    contrib = jnp.where(sel[:, None], pts, 0.0)
    samples = jnp.zeros((MC + 1, k, 3), pts.dtype).at[row, col].add(contrib)[:MC]
    valid = jnp.arange(k)[None, :] < jnp.minimum(counts, k)[:, None]
    return jnp.where(valid[..., None], samples, 0.0), valid


@functools.partial(jax.jit, static_argnames=("max_clusters", "num_voxels"))
def cluster_voxel_counts(
    compact: jnp.ndarray,  # [H, W] compact cluster ids (-1 none)
    vox_lin: jnp.ndarray,  # [H, W] int32 linear voxel index per pixel
    max_clusters: int = 32,
    num_voxels: int = None,
):
    """Number of distinct voxels per cluster, computed from PIXELS.

    With `num_voxels` (the linear-index bound): scatter-max a presence byte
    into a dense [MC+1, num_voxels] table and row-reduce — no sort at all
    (a few MB of HBM traffic, well under 1 ms). Otherwise: sort (cluster,
    voxel) keys over the image (~300k) instead of compacting the full voxel
    grid (~1M sort — measured 80+ ms on TPU) and count first-occurrences per
    cluster segment."""
    MC = max_clusters
    flat_c = compact.reshape(-1).astype(jnp.int32)
    flat_v = vox_lin.reshape(-1).astype(jnp.int32)
    if num_voxels is not None:
        on = flat_c >= 0
        row = jnp.where(on, flat_c, MC)
        col = jnp.clip(flat_v, 0, num_voxels - 1)
        table = (
            jnp.zeros((MC + 1, num_voxels), jnp.uint8)
            .at[row, col]
            .max(on.astype(jnp.uint8))
        )
        return table.sum(axis=1, dtype=jnp.int32)[:-1]
    # int32 keys (x64 is disabled): cluster id (<64) in the high bits, voxel
    # linear index (< 2^21 voxels, i.e. grids up to ~2M cells) in the low bits
    SHIFT = 21
    sentinel = jnp.iinfo(jnp.int32).max
    key = flat_c * (1 << SHIFT) + jnp.minimum(flat_v, (1 << SHIFT) - 1)
    key = jnp.where(flat_c >= 0, key, sentinel)
    s = jnp.sort(key)
    first = jnp.concatenate([jnp.ones((1,), jnp.bool_), s[1:] != s[:-1]])
    valid = s != sentinel
    seg = jnp.where(valid, s >> SHIFT, MC)
    return jax.ops.segment_sum(
        (first & valid).astype(jnp.int32), seg, num_segments=MC + 1
    )[:-1]


def exclusive_cumsum_1d(x: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Exclusive prefix sum of an int vector, blockwise two-pass.

    A flat `jnp.cumsum` over ~1M elements lowers to a serial scan on TPU
    (measured ~28 ms per 1.2M on v5e); reshaping to [rows, block] makes the
    inner scan vectorize across rows (sublanes) and leaves only a tiny
    row-offset scan — ~1 ms for the same input."""
    n = x.shape[0]
    rows = -(-n // block)
    pad = rows * block - n
    m = jnp.pad(x.astype(jnp.int32), (0, pad)).reshape(rows, block)
    within = jnp.cumsum(m, axis=1)
    row_tot = within[:, -1]
    offs = jnp.cumsum(row_tot) - row_tot  # exclusive row offsets
    incl = within + offs[:, None]
    excl = incl - m
    return excl.reshape(-1)[:n]


def compact_indices(mask_flat: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Indices of True elements (ascending), -1 padded, via cumsum+scatter.

    Replaces `jnp.nonzero(size=...)` on large masks: the sort-based lowering
    costs ~90 ms per 1M elements on v5e while scatter runs in well under a
    millisecond."""
    n = mask_flat.shape[0]
    pos = exclusive_cumsum_1d(mask_flat.astype(jnp.int32))
    slot = jnp.where(mask_flat & (pos < capacity), pos, capacity)
    out = jnp.full((capacity + 1,), -1, jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return out[:capacity]


def compact_rows(values: jnp.ndarray, mask: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Rows of `values` [N, D] where mask, packed ascending into
    [capacity, D] (zero padded), via cumsum+scatter (no sort)."""
    pos = exclusive_cumsum_1d(mask.astype(jnp.int32))
    slot = jnp.where(mask & (pos < capacity), pos, capacity)
    out = jnp.zeros((capacity + 1, values.shape[1]), values.dtype).at[slot].set(values)
    return out[:capacity]
