"""Free-space motion detection (Dynablox-derived) on the dense active volume.

Equivalent of the reference FreeSpaceMotionDetector (khronos/src/active_window/
motion_detection/free_space_motion_detector.cpp): depth pixels landing in
ever-free voxels seed dynamic clusters (cpp:158-203); seeds region-grow through
this scan's occupied voxels (cpp:205-272); nearby clusters merge
(min_separation_distance, cpp:274-355); size filters (cpp:365-379); cluster ids
written into the dynamic image (cpp:381-399).

TPU design: the multithreaded image-strip fan-out and stack-based region
growing become one fixed-shape jitted program — scatter the scan into the
grid, iterate 26-neighbor label propagation over a 1-voxel-dilated scan mask
(which also merges clusters separated by < min_separation_distance voxels),
then segment-reduce per-cluster stats. Host receives only small per-cluster
arrays plus the dynamic image.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from khronos_tpu.config import check_ge, check_gt, register
from khronos_tpu.geometry.camera import Camera
from khronos_tpu.map.active_volume import VolumeConfig, VolumeState
from khronos_tpu.ops.dense import dilate, max_pool3, propagate_labels_3d

MAX_CLUSTERS = 64


class MeasurementCluster(NamedTuple):
    """Host-side per-cluster record (mirrors khronos MeasurementCluster)."""

    cluster_id: int  # id as written in the image (1-based)
    num_pixels: int
    num_voxels: int
    centroid: np.ndarray  # [3]
    bbox_min: np.ndarray
    bbox_max: np.ndarray
    category_id: int = -1  # semantic clusters only
    feature: np.ndarray = None  # open-set clusters only


@register("motion_detector", "FreeSpaceMotionDetector")
@dataclasses.dataclass
class FreeSpaceMotionDetectorConfig:
    min_cluster_size: int = 500  # pixels (uHumans2.yaml:54)
    max_cluster_size: int = 100000  # pixels
    min_separation_distance: int = 2  # voxels (uHumans2.yaml:55)
    max_range: float = 5.0  # m
    min_z: float = -1.0e9  # m, ground removal off by default
    grow_iterations: int = 16  # label-propagation rounds (~1.6 m reach @ 0.1 m)
    # semantic motion seeding (fused mode): dynamic-labeled pixels seed
    # motion clusters directly, without requiring ever-free history —
    # removes the free-space detector's structural blind spot in
    # freshly-first-observed areas (the Dynablox warm-up: a voxel must be
    # SEEN free before occupancy there can read as motion; a human standing
    # in never-before-observed space is invisible to it). Off by default
    # for reference parity (Dynablox-style geometry-only detection,
    # motion_detection.cpp seeds = ever-free & occupied); quality configs
    # enable it. Costs nothing: the dyn bit packs into the same single
    # pixel->voxel scatter-max the seed-scan/class write already does.
    seed_dynamic_labels: bool = False

    def check(self):
        check_gt(self.min_cluster_size, 0, "min_cluster_size")
        check_ge(self.min_separation_distance, 0, "min_separation_distance")

    def create(self, volume_config: VolumeConfig, camera: Camera):
        return FreeSpaceMotionDetector(self, volume_config, camera)


@functools.partial(
    jax.jit, static_argnames=("voxel_size", "grow_iterations", "merge_dilation")
)
def _detect_device(
    state: VolumeState,
    points_w: jnp.ndarray,  # [H, W, 3] world-frame vertex image
    valid: jnp.ndarray,  # [H, W] valid depth & range mask
    voxel_size: float,
    grow_iterations: int,
    merge_dilation: int,
):
    shape = state.tsdf.shape
    H, W = valid.shape
    idx = jnp.floor(points_w / voxel_size).astype(jnp.int32) - state.origin
    in_grid = ((idx >= 0) & (idx < jnp.asarray(shape, jnp.int32))).all(axis=-1) & valid
    ci = jnp.where(in_grid, idx[..., 0], 0)
    cj = jnp.where(in_grid, idx[..., 1], 0)
    ck = jnp.where(in_grid, idx[..., 2], 0)

    # scan occupancy: voxels containing ≥1 point this frame
    scan = jnp.zeros(shape, jnp.bool_).at[ci, cj, ck].max(in_grid)
    # seeds: scan voxels flagged ever-free
    seeds = scan & state.ever_free

    # Growth is restricted to SEED voxels (reference
    # free_space_motion_detector.cpp:249-258: the stack only extends through
    # ever-free voxels); dilating the seed mask lets labels hop the
    # min_separation_distance gap so nearby clusters merge (cpp:274-355).
    growable = dilate(seeds, merge_dilation) if merge_dilation > 0 else seeds

    lin = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * (shape[1] * shape[2])
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1) * shape[2]
        + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    )
    labels0 = jnp.where(seeds, lin, -1)
    labels = propagate_labels_3d(labels0, growable, grow_iterations)
    # one boundary layer: adjacent occupied scan voxels join the cluster but do
    # not extend it (cpp:259-268)
    spread = max_pool3(labels)
    labels = jnp.where(labels >= 0, labels, jnp.where(scan, spread, -1))
    labels = jnp.where(scan, labels, -1)  # only real scan voxels carry ids

    # per-pixel raw label
    pix_label = jnp.where(in_grid, labels[ci, cj, ck], -1)

    # compact ids via sorted unique of pixel labels
    uniq = jnp.unique(pix_label.reshape(-1), size=MAX_CLUSTERS + 1, fill_value=-1)
    sentinel = jnp.iinfo(jnp.int32).max
    reals = jnp.sort(jnp.where(uniq >= 0, uniq, sentinel))
    pos = jnp.clip(jnp.searchsorted(reals, pix_label), 0, MAX_CLUSTERS - 1)
    hit = (pix_label >= 0) & (reals[pos] == pix_label)
    compact = jnp.where(hit, pos, -1)  # [H, W] in [0, MAX_CLUSTERS)

    # per-cluster stats (segment reductions over pixels)
    flat = compact.reshape(-1)
    ones = (flat >= 0).astype(jnp.int32)
    seg = jnp.where(flat >= 0, flat, MAX_CLUSTERS)
    pix_counts = jax.ops.segment_sum(ones, seg, num_segments=MAX_CLUSTERS + 1)[:-1]
    pts = points_w.reshape(-1, 3)
    sums = jax.ops.segment_sum(
        jnp.where((flat >= 0)[:, None], pts, 0.0), seg, num_segments=MAX_CLUSTERS + 1
    )[:-1]
    bb_min = jax.ops.segment_min(
        jnp.where((flat >= 0)[:, None], pts, jnp.inf), seg, num_segments=MAX_CLUSTERS + 1
    )[:-1]
    bb_max = jax.ops.segment_max(
        jnp.where((flat >= 0)[:, None], pts, -jnp.inf), seg, num_segments=MAX_CLUSTERS + 1
    )[:-1]
    # voxel counts from pixel (cluster, voxel) keys (see ops.clusters)
    from khronos_tpu.ops.clusters import cluster_voxel_counts

    vox_lin = (ci * shape[1] + cj) * shape[2] + ck
    vox_counts = cluster_voxel_counts(compact, vox_lin, MAX_CLUSTERS)

    return compact, pix_counts, vox_counts, sums, bb_min, bb_max


class FreeSpaceMotionDetector:
    def __init__(self, config: FreeSpaceMotionDetectorConfig, volume_config: VolumeConfig, camera: Camera):
        self.config = config
        self.volume_config = volume_config
        self.camera = camera

    def process(self, state: VolumeState, frame) -> List[MeasurementCluster]:
        """Fill frame.dynamic_image (+ frame.dynamic_clusters). Returns clusters.

        frame: FrameData with depth + pose set; uses the *pre-integration*
        volume state (ever-free from previous frames), matching the reference
        pipeline order (active_window.cpp:118-174).
        """
        cam = self.camera
        depth = frame.depth
        points_w = cam.vertex_image_world(depth, frame.R_w_c, frame.t_w_c)
        z_ok = points_w[..., 2] >= self.config.min_z
        valid = (depth > cam.min_range) & (depth <= min(cam.max_range, self.config.max_range)) & z_ok
        compact, pix_counts, vox_counts, sums, bb_min, bb_max = _detect_device(
            state,
            points_w,
            valid,
            self.volume_config.voxel_size,
            self.config.grow_iterations,
            max(0, self.config.min_separation_distance - 1),
        )
        pix_counts = np.asarray(pix_counts)
        vox_counts = np.asarray(vox_counts)
        sums = np.asarray(sums)
        bb_min_np = np.asarray(bb_min)
        bb_max_np = np.asarray(bb_max)

        keep = (pix_counts >= self.config.min_cluster_size) & (
            pix_counts <= self.config.max_cluster_size
        )
        # remap: kept cluster k -> output id (1-based); dropped -> 0
        out_ids = np.zeros(MAX_CLUSTERS + 1, np.int32)
        clusters: List[MeasurementCluster] = []
        next_id = 1
        for k in range(MAX_CLUSTERS):
            if keep[k]:
                out_ids[k] = next_id
                clusters.append(
                    MeasurementCluster(
                        cluster_id=next_id,
                        num_pixels=int(pix_counts[k]),
                        num_voxels=int(vox_counts[k]),
                        centroid=sums[k] / max(int(pix_counts[k]), 1),
                        bbox_min=bb_min_np[k],
                        bbox_max=bb_max_np[k],
                    )
                )
                next_id += 1
        remap = jnp.asarray(out_ids)
        compact_safe = jnp.where(compact >= 0, compact, MAX_CLUSTERS)
        frame.dynamic_image = remap[compact_safe]
        frame.dynamic_clusters = clusters
        return clusters
