"""Open-set object detection: forward externally-segmented instances.

Equivalent of the reference InstanceForwarding detector (khronos/src/
active_window/object_detection/instance_forwarding.cpp): an upstream open-set
segmenter (FastSAM + CLIP in the reference's semantic_inference stack)
provides an instance image and per-instance embedding vectors; this detector
filters instances by range, pixel count, bbox volume, and the best
background-prompt similarity (skip if max cosine to any `background`
embedding > max_background_score, cpp:94-104), then attaches the per-instance
feature vectors (cpp:137-147). Downstream, the tracker's cosine gate
(min_cosine_sim) and the scene graph's per-object features carry the open-set
semantics (SURVEY.md §7.8).

TPU design: the filter set is one batched device pass (segment stats + a
[instances x background-prompts] cosine matrix).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from khronos_tpu.config import check_ge, check_gt, register
from khronos_tpu.geometry.camera import Camera
from khronos_tpu.map.active_volume import VolumeConfig, VolumeState
from khronos_tpu.active_window.motion_detection import MAX_CLUSTERS, MeasurementCluster

OPENSET_CATEGORY = -2  # semantic_category marker for open-set objects


@register("object_detector", "InstanceForwarding")
@dataclasses.dataclass
class InstanceForwardingConfig:
    min_cluster_size: int = 50  # pixels
    max_range: float = 5.0  # m
    min_bbox_volume: float = 0.0  # m^3
    max_bbox_volume: float = 10.0  # m^3
    max_background_score: float = 0.6  # cosine vs background prompts
    max_instances: int = MAX_CLUSTERS
    # embedding dimensionality for the FUSED device path (0 = taken from the
    # background embeddings when set, or features disabled)
    feature_dim: int = 0

    def check(self):
        check_gt(self.min_cluster_size, 0, "min_cluster_size")
        check_ge(self.max_background_score, 0.0, "max_background_score")

    def create(self, volume_config: VolumeConfig, camera: Camera, label_space=None):
        return InstanceForwarding(self, volume_config, camera)


@functools.partial(jax.jit, static_argnames=("max_instances",))
def _stats_device(instances, points_w, valid, max_instances: int):
    MI = max_instances
    flat = jnp.where(valid, instances, 0).reshape(-1)  # 0 = background
    seg = jnp.where((flat >= 1) & (flat <= MI), flat - 1, MI)
    n = MI + 1
    on = seg < MI
    counts = jax.ops.segment_sum(on.astype(jnp.int32), seg, num_segments=n)[:-1]
    pts = points_w.reshape(-1, 3)
    m = on[:, None]
    sums = jax.ops.segment_sum(jnp.where(m, pts, 0.0), seg, num_segments=n)[:-1]
    bb_min = jax.ops.segment_min(jnp.where(m, pts, jnp.inf), seg, num_segments=n)[:-1]
    bb_max = jax.ops.segment_max(jnp.where(m, pts, -jnp.inf), seg, num_segments=n)[:-1]
    return counts, sums, bb_min, bb_max


@jax.jit
def _background_scores(features: jnp.ndarray, background: jnp.ndarray) -> jnp.ndarray:
    """Best cosine similarity of each instance feature [N, D] to any
    background-prompt embedding [B, D]."""
    fn = features / jnp.maximum(jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-9)
    bn = background / jnp.maximum(jnp.linalg.norm(background, axis=-1, keepdims=True), 1e-9)
    return jnp.max(fn @ bn.T, axis=-1)


class InstanceForwarding:
    def __init__(
        self,
        config: InstanceForwardingConfig,
        volume_config: VolumeConfig,
        camera: Camera,
        background_embeddings: Optional[np.ndarray] = None,
    ):
        self.config = config
        self.volume_config = volume_config
        self.camera = camera
        # `background` EmbeddingGroup (reference openset stack): prompts like
        # "wall", "floor", "ceiling" encoded by the upstream text encoder
        self.background_embeddings = background_embeddings

    def set_background_embeddings(self, embeddings: np.ndarray) -> None:
        self.background_embeddings = np.asarray(embeddings, np.float32)

    def process(self, state: VolumeState, frame) -> List[MeasurementCluster]:
        """Requires frame.instances ([H,W] int32, 0 = none, ids 1..N stable)
        and frame.label_features ([N, D], row i = feature of instance i+1)."""
        cfg = self.config
        cam = self.camera
        if frame.instances is None:
            frame.object_image = jnp.zeros(frame.depth.shape, jnp.int32)
            frame.semantic_clusters = []
            return []
        depth = frame.depth
        valid = (depth > cam.min_range) & (depth <= min(cam.max_range, cfg.max_range))
        points_w = cam.vertex_image_world(depth, frame.R_w_c, frame.t_w_c)
        counts, sums, bb_min, bb_max = _stats_device(
            frame.instances, points_w, valid, cfg.max_instances
        )
        counts = np.asarray(counts)
        sums = np.asarray(sums)
        bb_min = np.asarray(bb_min)
        bb_max = np.asarray(bb_max)

        features = frame.label_features
        bg_scores = None
        if (
            features is not None
            and self.background_embeddings is not None
            and len(self.background_embeddings)
        ):
            n = min(len(features), cfg.max_instances)
            bg_scores = np.asarray(
                _background_scores(
                    jnp.asarray(features[:n], jnp.float32),
                    jnp.asarray(self.background_embeddings),
                )
            )

        keep_ids = np.zeros(cfg.max_instances + 1, np.int32)
        clusters: List[MeasurementCluster] = []
        next_id = 1
        for k in range(cfg.max_instances):
            if counts[k] < cfg.min_cluster_size:
                continue
            ext = np.clip(bb_max[k] - bb_min[k], 0, None)
            vol = float(np.prod(ext))
            if not (cfg.min_bbox_volume <= vol <= cfg.max_bbox_volume):
                continue
            if bg_scores is not None and k < len(bg_scores) and bg_scores[k] > cfg.max_background_score:
                continue  # looks like background per the prompt group
            feat = None
            if features is not None and k < len(features):
                feat = np.asarray(features[k], np.float32)
            clusters.append(
                MeasurementCluster(
                    cluster_id=next_id,
                    num_pixels=int(counts[k]),
                    num_voxels=0,
                    centroid=sums[k] / max(int(counts[k]), 1),
                    bbox_min=bb_min[k],
                    bbox_max=bb_max[k],
                    category_id=OPENSET_CATEGORY,
                    feature=feat,
                )
            )
            keep_ids[k + 1] = next_id
            next_id += 1
        remap = jnp.asarray(keep_ids)
        inst = jnp.clip(frame.instances, 0, cfg.max_instances)
        frame.object_image = remap[jnp.where(valid, inst, 0)]
        frame.semantic_clusters = clusters
        return clusters
