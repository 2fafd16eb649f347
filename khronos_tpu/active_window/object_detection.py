"""Semantic object detection: connected components of object-labeled pixels.

Equivalent of the reference ConnectedSemantics detector (khronos/src/
active_window/object_detection/connected_semantics.cpp): 3D mode bins pixels
by (semantic class, voxel) and region-grows per class in voxel space
(cpp:70-144); 2D mode flood-fills the label image with 4/8 connectivity
(cpp:146-198); min-size filtering (cpp:200-217). Uses a global label-space
`isObject()` gate (cpp:134, hydra GlobalInfo labelspace).

TPU design: per-class connected components as keyed label propagation
(fixed-iteration, 6-conn in 3D / 8-conn in 2D) over either the scan voxel
grid or the image; cluster stats via segment reductions.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from khronos_tpu.config import check_gt, register
from khronos_tpu.geometry.camera import Camera
from khronos_tpu.map.active_volume import VolumeConfig, VolumeState
from khronos_tpu.active_window.motion_detection import MAX_CLUSTERS, MeasurementCluster
from khronos_tpu.ops.dense import propagate_labels_keyed_2d, propagate_labels_keyed_3d


@dataclasses.dataclass
class LabelSpace:
    """Closed-set label space: which class ids count as trackable objects
    (hydra GlobalInfo labelspace equivalent). Everything else is background."""

    num_classes: int = 32
    object_labels: Tuple[int, ...] = ()
    dynamic_labels: Tuple[int, ...] = ()  # classes expected to move (e.g. human)

    def is_object_lut(self) -> np.ndarray:
        lut = np.zeros(self.num_classes + 1, np.bool_)
        for l in self.object_labels:
            lut[l] = True
        return lut

    def is_dynamic_lut(self) -> np.ndarray:
        lut = np.zeros(self.num_classes + 1, np.bool_)
        for l in self.dynamic_labels:
            lut[l] = True
        return lut


@register("object_detector", "ConnectedSemantics")
@dataclasses.dataclass
class ConnectedSemanticsConfig:
    min_cluster_size: int = 50  # pixels (uHumans2.yaml:62)
    use_3d: bool = True
    use_full_connectivity: bool = True  # 2D mode connectivity
    grid_size: float = 0.1  # m; 3D binning resolution (uHumans2.yaml:65)
    max_range: float = 5.0
    grow_iterations: int = 20

    def check(self):
        check_gt(self.min_cluster_size, 0, "min_cluster_size")
        check_gt(self.grid_size, 0.0, "grid_size")

    def create(self, volume_config: VolumeConfig, camera: Camera, label_space: LabelSpace):
        return ConnectedSemantics(self, volume_config, camera, label_space)


@functools.partial(jax.jit, static_argnames=("grid_shape", "grid_size", "iterations"))
def _detect_3d(
    origin: jnp.ndarray,
    points_w: jnp.ndarray,
    pix_class: jnp.ndarray,  # [H,W] int32, -1 = not an object pixel
    valid: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    grid_size: float,
    iterations: int,
):
    idx = jnp.floor(points_w / grid_size).astype(jnp.int32) - origin
    in_grid = ((idx >= 0) & (idx < jnp.asarray(grid_shape, jnp.int32))).all(axis=-1)
    ok = valid & in_grid & (pix_class >= 0)
    ci = jnp.where(ok, idx[..., 0], 0)
    cj = jnp.where(ok, idx[..., 1], 0)
    ck = jnp.where(ok, idx[..., 2], 0)

    # voxel class = max class id of pixels landing in it (-1 = none)
    vclass = jnp.full(grid_shape, -1, jnp.int32).at[ci, cj, ck].max(
        jnp.where(ok, pix_class, -1)
    )
    growable = vclass >= 0
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, grid_shape, 0) * (grid_shape[1] * grid_shape[2])
        + jax.lax.broadcasted_iota(jnp.int32, grid_shape, 1) * grid_shape[2]
        + jax.lax.broadcasted_iota(jnp.int32, grid_shape, 2)
    )
    labels = propagate_labels_keyed_3d(jnp.where(growable, lin, -1), vclass, growable, iterations)
    # per-pixel label: only if pixel class matches the voxel's winning class
    pl = jnp.where(ok & (vclass[ci, cj, ck] == pix_class), labels[ci, cj, ck], -1)
    return pl


@functools.partial(jax.jit, static_argnames=("iterations", "full_connectivity"))
def _detect_2d(pix_class: jnp.ndarray, valid: jnp.ndarray, iterations: int, full_connectivity: bool):
    H, W = pix_class.shape
    ok = valid & (pix_class >= 0)
    lin = (
        jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
        + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    )
    return propagate_labels_keyed_2d(
        jnp.where(ok, lin, -1), pix_class, ok, iterations, full_connectivity
    )


@functools.partial(jax.jit, static_argnames=())
def _cluster_stats(pix_label: jnp.ndarray, pix_class: jnp.ndarray, points_w: jnp.ndarray):
    """Compact raw pixel labels and segment-reduce per-cluster stats."""
    flat = pix_label.reshape(-1)
    uniq = jnp.unique(flat, size=MAX_CLUSTERS + 1, fill_value=-1)
    sentinel = jnp.iinfo(jnp.int32).max
    reals = jnp.sort(jnp.where(uniq >= 0, uniq, sentinel))
    pos = jnp.clip(jnp.searchsorted(reals, flat), 0, MAX_CLUSTERS - 1)
    hit = (flat >= 0) & (reals[pos] == flat)
    compact = jnp.where(hit, pos, -1)

    seg = jnp.where(compact >= 0, compact, MAX_CLUSTERS)
    n = MAX_CLUSTERS + 1
    ones = (compact >= 0).astype(jnp.int32)
    counts = jax.ops.segment_sum(ones, seg, num_segments=n)[:-1]
    pts = points_w.reshape(-1, 3)
    msk = (compact >= 0)[:, None]
    sums = jax.ops.segment_sum(jnp.where(msk, pts, 0.0), seg, num_segments=n)[:-1]
    bb_min = jax.ops.segment_min(jnp.where(msk, pts, jnp.inf), seg, num_segments=n)[:-1]
    bb_max = jax.ops.segment_max(jnp.where(msk, pts, -jnp.inf), seg, num_segments=n)[:-1]
    cls = jax.ops.segment_max(
        jnp.where(compact >= 0, pix_class.reshape(-1), -1), seg, num_segments=n
    )[:-1]
    return compact.reshape(pix_label.shape), counts, sums, bb_min, bb_max, cls


class ConnectedSemantics:
    def __init__(
        self,
        config: ConnectedSemanticsConfig,
        volume_config: VolumeConfig,
        camera: Camera,
        label_space: LabelSpace,
    ):
        self.config = config
        self.volume_config = volume_config
        self.camera = camera
        self.label_space = label_space
        self._is_object = jnp.asarray(label_space.is_object_lut())

    def process(self, state: VolumeState, frame) -> List[MeasurementCluster]:
        """Fill frame.object_image (+ frame.semantic_clusters)."""
        cam = self.camera
        depth = frame.depth
        valid = (depth > cam.min_range) & (depth <= min(cam.max_range, self.config.max_range))
        labels = frame.labels
        safe = jnp.clip(labels, 0, self._is_object.shape[0] - 1)
        pix_class = jnp.where((labels >= 0) & self._is_object[safe], labels, -1)

        if self.config.use_3d:
            points_w = cam.vertex_image_world(depth, frame.R_w_c, frame.t_w_c)
            pl = _detect_3d(
                state.origin,
                points_w,
                pix_class,
                valid,
                tuple(state.tsdf.shape),
                self.volume_config.voxel_size,
                self.config.grow_iterations,
            )
        else:
            points_w = cam.vertex_image_world(depth, frame.R_w_c, frame.t_w_c)
            pl = _detect_2d(
                pix_class, valid, self.config.grow_iterations, self.config.use_full_connectivity
            )

        compact, counts, sums, bb_min, bb_max, cls = _cluster_stats(pl, pix_class, points_w)
        counts_np = np.asarray(counts)
        sums_np = np.asarray(sums)
        bbmin_np = np.asarray(bb_min)
        bbmax_np = np.asarray(bb_max)
        cls_np = np.asarray(cls)

        keep = counts_np >= self.config.min_cluster_size
        out_ids = np.zeros(MAX_CLUSTERS + 1, np.int32)
        clusters: List[MeasurementCluster] = []
        next_id = 1
        for k in range(MAX_CLUSTERS):
            if keep[k]:
                out_ids[k] = next_id
                clusters.append(
                    MeasurementCluster(
                        cluster_id=next_id,
                        num_pixels=int(counts_np[k]),
                        num_voxels=0,
                        centroid=sums_np[k] / max(int(counts_np[k]), 1),
                        bbox_min=bbmin_np[k],
                        bbox_max=bbmax_np[k],
                        category_id=int(cls_np[k]),
                    )
                )
                next_id += 1
        remap = jnp.asarray(out_ids)
        compact_safe = jnp.where(compact >= 0, compact, MAX_CLUSTERS)
        frame.object_image = remap[compact_safe]
        frame.semantic_clusters = clusters
        return clusters
