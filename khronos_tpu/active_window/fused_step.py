"""Fused per-frame device program: the whole active-window hot path in ONE jit.

Motivation (measured on the axon TPU tunnel): every device->host pull costs
~30 ms latency + ~30 MB/s, so the per-stage pulls of the modular path
(detector stats, vertex images, id images) dominate the frame time by 10-100x.
This program fuses motion detection, object detection, TSDF+tracking
integration, and archival into a single compiled step whose only outputs are
the new volume state (stays on device), the id images (stay on device for the
frame buffer / object extraction), and ONE packed float32 stats vector that
the host pulls per frame for the tracker:

  packed layout (float32):
    [0                 : MC*DYN_F]        dynamic cluster stats (DYN_F=12):
                                          centroid xyz, bbox min/max, pixels,
                                          voxels, valid, pad
    [MC*DYN_F          : +MC*SEM_F]       semantic cluster stats (SEM_F=12):
                                          centroid xyz, bbox min/max, pixels,
                                          category, valid, pad
    [...               : +MC*K*3]         dynamic cluster point subsamples
    [...               : +MC*K*3]         semantic cluster point subsamples

This is the SURVEY.md §2.7 design realized: "AW step = one compiled pjit
program per frame"; the reference's per-stage thread pools become kernel
width inside one XLA program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from khronos_tpu.active_window.motion_detection import (
    FreeSpaceMotionDetectorConfig,
    MeasurementCluster,
)
from khronos_tpu.active_window.instance_forwarding import (
    OPENSET_CATEGORY,
    InstanceForwardingConfig,
)
from khronos_tpu.active_window.object_detection import (
    ConnectedSemanticsConfig,
    LabelSpace,
)
from khronos_tpu.geometry.camera import Camera
from khronos_tpu.map import active_volume as av
from khronos_tpu.ops import clusters as cl
from khronos_tpu.ops.dense import (
    dilate,
    max_pool3,
    propagate_labels_3d,
    propagate_labels_keyed_3d,
)

MC = 32  # max clusters per frame per kind
K_SAMPLES = 64  # point subsamples per cluster
DYN_F = 12
SEM_F = 12


def _lin_iota(shape):
    return (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * (shape[1] * shape[2])
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1) * shape[2]
        + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    )


def make_frame_step(
    vol_cfg: av.VolumeConfig,
    camera: Camera,
    md_cfg: FreeSpaceMotionDetectorConfig,
    od_cfg: ConnectedSemanticsConfig,
    label_space: LabelSpace,
    donate: bool = True,
    detection_stride: int = 1,
    crop: bool = True,
    jit: bool = True,
    background_embeddings: Optional[np.ndarray] = None,
    feature_dim: int = 0,
    mesh=None,
    mesh_axis: str = "x",
):
    """Build the fused jitted step:
    step(state, depth, color, labels, R, t, t_now)
      -> (state', dynamic_image, object_image, packed_stats).

    Open-set: when od_cfg is an InstanceForwardingConfig the step instead
    takes step(state, depth, color, labels, instances, features, R, t, t_now)
    with externally-segmented instances [H, W] (0 = none) and per-instance
    embeddings [MC, feature_dim]; the count/volume/background-prompt filters
    (instance_forwarding.cpp:94-104) run on device, and the packed sem-stats
    'category' slot carries the ORIGINAL instance index so the host can
    attach features (unpack_stats(..., features=, openset=True)).

    detection_stride s > 1 runs the DETECTION machinery (pixel->voxel scatter,
    label compaction sort, segment stats — the measured hot spots, ~60 ms of a
    70 ms frame at 480x640 on v5e) on an s-strided image (s^2 fewer pixels);
    TSDF/semantic integration stays full-resolution. Cluster pixel counts and
    size thresholds are then in detection-res pixels. The returned id images
    are nearest-upsampled back to full resolution."""
    # NUMPY constant, not a device array: a pre-created device array captured
    # in a jit closure becomes a hidden buffer parameter, and fusions reading
    # it run ~200x slower on the axon backend (measured: 602k-index gather
    # from a closure-device LUT 7.5 ms vs 0.04 ms from a numpy literal).
    # Numpy constants lower as HLO literals and stay on the fast path.
    is_object_lut = np.asarray(label_space.is_object_lut())
    is_dynamic_lut = np.asarray(label_space.is_dynamic_lut())
    shape = tuple(vol_cfg.grid_shape)
    md_enabled = md_cfg is not None
    seed_dyn = md_enabled and getattr(md_cfg, "seed_dynamic_labels", False)
    openset = isinstance(od_cfg, InstanceForwardingConfig)
    od_enabled = od_cfg is not None and not openset
    if openset:
        if od_cfg.max_instances > MC:
            raise ValueError(f"max_instances {od_cfg.max_instances} > fused cap {MC}")
        bg_emb = None
        if background_embeddings is not None and len(background_embeddings):
            bg = np.asarray(background_embeddings, np.float32)
            # numpy, not device: see is_object_lut note above
            bg_emb = bg / np.maximum(np.linalg.norm(bg, axis=-1, keepdims=True), 1e-9)
            feature_dim = bg.shape[1]
        feature_dim = max(int(feature_dim), 1)
    merge_dilation = max(0, (md_cfg.min_separation_distance - 1) if md_enabled else 0)
    s = int(detection_stride)
    if camera.height % s or camera.width % s:
        raise ValueError(f"detection_stride {s} must divide image {camera.height}x{camera.width}")
    s2 = s * s
    # detection-res camera: det pixel (i, j) <-> full pixel (i*s, j*s)
    cam_d = dataclasses.replace(
        camera,
        height=camera.height // s,
        width=camera.width // s,
        fx=camera.fx / s,
        fy=camera.fy / s,
        cx=camera.cx / s + 0.5 * (s - 1) / s,
        cy=camera.cy / s + 0.5 * (s - 1) / s,
    )
    md_min_px = max(1, round(md_cfg.min_cluster_size / s2)) if md_enabled else 0
    md_max_px = max(1, round(md_cfg.max_cluster_size / s2)) if md_enabled else 0
    od_min_px = max(1, round(od_cfg.min_cluster_size / s2)) if od_cfg is not None else 0

    def _upsample(img):
        return jnp.repeat(jnp.repeat(img, s, axis=0), s, axis=1) if s > 1 else img

    # all grid work (detection scatters/growth + integration) runs in a
    # camera-centered crop: every voxel within max_range is inside it, and
    # the crop is typically ~2x smaller than the full grid. Disabled for
    # spatially-sharded volumes (a dynamic slice across the sharded axis
    # would force cross-device gathers; sharded grids want full-width SPMD).
    crop = av.crop_shape_for_camera(vol_cfg, camera) if crop else tuple(shape)
    cropping = any(c < g for c, g in zip(crop, shape))
    n_crop = crop[0] * crop[1] * crop[2]

    def _dslice(img):
        """Detection-res downsample. Expressed as reshape + static index
        instead of `img[::s, ::s]`: the strided slice lowers to a ~77k
        random gather (~0.8 ms each on v5e), the reshape form to a plain
        slice."""
        if s == 1:
            return img
        fh, fw = img.shape[0], img.shape[1]
        return img.reshape(fh // s, s, fw // s, s)[:, 0, :, 0]

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        _row_shard = NamedSharding(mesh, PartitionSpec(mesh_axis))

        _grid_shard = NamedSharding(mesh, PartitionSpec(mesh_axis))

        def _gshard(x):
            """Pin a grid-shaped array to the volume sharding (leading grid
            axis over the mesh): the detection scatters' outputs otherwise
            come back REPLICATED, which replicates the whole region-growing
            grid path on every device (and all-gathered two full grids per
            step, SCALING.json r4 N=8)."""
            return jax.lax.with_sharding_constraint(x, _grid_shard)

        def _pshard(x):
            """Pin an image-side array to row sharding over the device mesh.
            Without this the whole pixel pipeline (projection, detection
            compares, cluster ranking) replicates on every device — the
            Amdahl term that capped N=8 partitioning efficiency at 0.22 at
            the production operating point (SCALING.json). Constrained here,
            XLA propagates the row sharding through the downstream
            elementwise chains and inserts collectives only where pixel
            streams meet the spatially-sharded grid."""
            return jax.lax.with_sharding_constraint(x, _row_shard)
    else:
        def _pshard(x):
            return x

        def _gshard(x):
            return x

    def _body(state, depth, color, labels, instances, features, R_w_c, t_w_c, t_now):
        depth_d = _pshard(_dslice(depth))
        labels_d = _pshard(_dslice(labels))
        H, W = depth_d.shape
        points_w = _pshard(cam_d.vertex_image_world(depth_d, R_w_c, t_w_c))
        max_r = min(camera.max_range, md_cfg.max_range if md_enabled else camera.max_range)
        valid = (depth_d > camera.min_range) & (depth_d <= max_r)

        start = av.crop_start(vol_cfg, state, t_w_c, crop)
        sub = av.slice_state(state, start, crop) if cropping else state

        idx = jnp.floor(points_w / vol_cfg.voxel_size).astype(jnp.int32) - sub.origin
        in_grid = ((idx >= 0) & (idx < jnp.asarray(crop, jnp.int32))).all(-1) & valid
        ci = _pshard(jnp.where(in_grid, idx[..., 0], 0))
        cj = _pshard(jnp.where(in_grid, idx[..., 1], 0))
        ck = _pshard(jnp.where(in_grid, idx[..., 2], 0))
        # ONE linear scatter index: the pixel->grid reshard then moves a
        # single s32 image instead of three (the scatter-max operand
        # all-gather was 7.4 MB/step at N=8, SCALING.json r4)
        clin = _pshard((ci * crop[1] + cj) * crop[2] + ck)
        lin = _lin_iota(crop)

        # ---------------- pixel -> voxel scatters ----------------
        # When BOTH detectors run, their two grid scatters (seed scan for
        # motion, per-voxel max class for objects) merge into ONE scatter-max
        # of a packed value (0: no pixel, 1: pixel without object class,
        # c+2: object-class pixel) — each scatter costs ~0.67 ms on v5e.
        pix_class = None
        if od_enabled:
            safe_lab = jnp.clip(labels_d, 0, is_object_lut.shape[0] - 1)
            # convert the numpy LUT INSIDE the trace: it stages as an HLO
            # literal (fast); indexing the numpy array with a tracer fails
            pix_class = jnp.where(
                (labels_d >= 0) & jnp.asarray(is_object_lut)[safe_lab], labels_d, -1
            )
        scan = vclass = None
        dyn_hit = None
        if seed_dyn:
            # dynamic-labeled pixel mask; the LUT stages as an HLO literal
            # (see is_object_lut note)
            safe_lab_d = jnp.clip(labels_d, 0, is_dynamic_lut.shape[0] - 1)
            dyn_pix = (labels_d >= 0) & jnp.asarray(is_dynamic_lut)[safe_lab_d]
        if md_enabled and od_enabled:
            val = jnp.where(
                in_grid, jnp.where(pix_class >= 0, pix_class + 2, 1), 0
            )
            if seed_dyn:
                # semantic motion seeding rides the SAME scatter: dyn bit in
                # the LSB, class/pixel code shifted up. Max keeps the highest
                # class code; on a (rare) voxel hit by both an object-class
                # pixel and a dynamic pixel the class wins and the dyn bit is
                # dropped — the human's other voxels still seed and region
                # growing recovers the cluster.
                val = val * 2 + (in_grid & dyn_pix)
                packed_grid = _gshard(
                    jnp.zeros((n_crop,), jnp.int32).at[clin.reshape(-1)]
                    .max(val.reshape(-1)).reshape(crop)
                )
                dyn_hit = (packed_grid & 1) == 1
                packed_grid = packed_grid >> 1
            else:
                packed_grid = _gshard(
                    jnp.zeros((n_crop,), jnp.int32).at[clin.reshape(-1)]
                    .max(val.reshape(-1)).reshape(crop)
                )
            scan = packed_grid >= 1
            vclass = jnp.where(packed_grid >= 2, packed_grid - 2, -1)
        elif md_enabled:
            if seed_dyn:
                val = in_grid.astype(jnp.int32) * 2 + (in_grid & dyn_pix)
                packed_grid = _gshard(
                    jnp.zeros((n_crop,), jnp.int32).at[clin.reshape(-1)]
                    .max(val.reshape(-1)).reshape(crop)
                )
                dyn_hit = (packed_grid & 1) == 1
                scan = packed_grid >= 2
            else:
                scan = _gshard(
                    jnp.zeros((n_crop,), jnp.bool_).at[clin.reshape(-1)]
                    .max(in_grid.reshape(-1)).reshape(crop)
                )

        # ---------------- motion detection ----------------
        if md_enabled:
            seeds = scan & (
                (sub.ever_free | dyn_hit) if seed_dyn else sub.ever_free
            )
            growable = dilate(seeds, merge_dilation) if merge_dilation > 0 else seeds
            mlab = propagate_labels_3d(
                jnp.where(seeds, lin, -1), growable, md_cfg.grow_iterations
            )
            spread = max_pool3(mlab)
            mlab = jnp.where(mlab >= 0, mlab, jnp.where(scan, spread, -1))
            mlab = jnp.where(scan, mlab, -1)
            pix_dyn_raw = jnp.where(in_grid, mlab[ci, cj, ck], -1)
            zko = points_w[..., 2] >= md_cfg.min_z
            pix_dyn_raw = jnp.where(zko, pix_dyn_raw, -1)
            # labels are crop linear indices -> dense-table compaction, no sort
            dyn_compact = cl.compact_labels(pix_dyn_raw, MC, num_values=n_crop)
            d_counts, d_sums, d_bmin, d_bmax = cl.cluster_stats(
                dyn_compact, points_w, max_clusters=MC
            )
            # voxel counts: approximated by the count of LABELED GRID CELLS
            # per cluster is not needed — nothing downstream reads
            # MeasurementCluster.num_voxels (size filters use pixel counts,
            # the tracker re-voxelizes sample points on host), so the dense
            # [MC+1, n_crop] presence-table scatter it used to cost
            # (~2.5 ms/frame at 480x640 on v5e) is dropped outright
            d_vox = jnp.zeros((MC,), jnp.int32)
            d_keep = (d_counts >= md_min_px) & (d_counts <= md_max_px)
            dynamic_image, d_ids = cl.filter_and_renumber(dyn_compact, d_keep)
            d_pts, _ = cl.cluster_point_samples(dyn_compact, points_w, K_SAMPLES, MC)
        else:
            dynamic_image = jnp.zeros((H, W), jnp.int32)
            d_counts = jnp.zeros((MC,), jnp.int32)
            d_vox = jnp.zeros((MC,), jnp.int32)
            d_sums = jnp.zeros((MC, 3))
            d_bmin = jnp.zeros((MC, 3))
            d_bmax = jnp.zeros((MC, 3))
            d_keep = jnp.zeros((MC,), jnp.bool_)
            d_ids = jnp.zeros((MC,), jnp.int32)
            d_pts = jnp.zeros((MC, K_SAMPLES, 3))

        # ---------------- object detection (3D keyed CC) ----------------
        if od_enabled:
            ok = in_grid & (pix_class >= 0)
            oci = jnp.where(ok, ci, 0)
            ocj = jnp.where(ok, cj, 0)
            ock = jnp.where(ok, ck, 0)
            if vclass is None:  # not merged with the motion-detection scatter
                oclin = (oci * crop[1] + ocj) * crop[2] + ock
                vclass = _gshard(
                    jnp.full((n_crop,), -1, jnp.int32).at[oclin.reshape(-1)]
                    .max(jnp.where(ok, pix_class, -1).reshape(-1)).reshape(crop)
                )
            ogrow = vclass >= 0
            olab = propagate_labels_keyed_3d(
                jnp.where(ogrow, lin, -1), vclass, ogrow, od_cfg.grow_iterations
            )
            # ONE packed gather for (olab, vclass) at each pixel's voxel —
            # two separate 77k random gathers cost ~0.7 ms each on v5e.
            # olab is a crop-linear id and vclass < 127, so
            # (olab+1)*128 + (vclass+1) fits int32 exactly for crops under
            # 2^24 voxels; larger grids fall back to two gathers.
            if n_crop < (1 << 24):
                pk = (olab + 1) * 128 + (vclass + 1)
                g = pk[oci, ocj, ock]
                g_class = g % 128 - 1
                g_olab = g // 128 - 1
            else:
                g_class = vclass[oci, ocj, ock]
                g_olab = olab[oci, ocj, ock]
            pix_sem_raw = jnp.where(ok & (g_class == pix_class), g_olab, -1)
            sem_compact = cl.compact_labels(pix_sem_raw, MC, num_values=n_crop)
            s_counts, s_sums, s_bmin, s_bmax, s_cat = cl.cluster_stats(
                sem_compact, points_w, extra=pix_class, max_clusters=MC
            )
            s_keep = s_counts >= od_min_px
            object_image, s_ids = cl.filter_and_renumber(sem_compact, s_keep)
            s_pts, _ = cl.cluster_point_samples(sem_compact, points_w, K_SAMPLES, MC)
        elif openset:
            # -------- open-set instance forwarding (device-side filters) ----
            inst_d = _dslice(instances)
            os_valid = (depth_d > camera.min_range) & (
                depth_d <= min(camera.max_range, od_cfg.max_range)
            )
            sem_compact = jnp.where(
                os_valid & (inst_d >= 1) & (inst_d <= MC), inst_d - 1, -1
            )
            s_counts, s_sums, s_bmin, s_bmax = cl.cluster_stats(
                sem_compact, points_w, max_clusters=MC
            )
            ext = jnp.clip(s_bmax - s_bmin, 0.0, None)
            vol = jnp.where(s_counts > 0, jnp.prod(ext, axis=-1), 0.0)
            s_keep = (
                (s_counts >= od_min_px)
                & (vol >= od_cfg.min_bbox_volume)
                & (vol <= od_cfg.max_bbox_volume)
            )
            if bg_emb is not None:
                fn = features / jnp.maximum(
                    jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-9
                )
                bg_score = jnp.max(fn @ bg_emb.T, axis=-1)  # [MC]
                s_keep = s_keep & (bg_score <= od_cfg.max_background_score)
            object_image, s_ids = cl.filter_and_renumber(sem_compact, s_keep)
            # 'category' slot carries the ORIGINAL instance index (host maps
            # it to the per-frame feature row + OPENSET_CATEGORY)
            s_cat = jnp.arange(MC, dtype=jnp.int32)
            s_pts, _ = cl.cluster_point_samples(sem_compact, points_w, K_SAMPLES, MC)
        else:
            object_image = jnp.zeros((H, W), jnp.int32)
            s_counts = jnp.zeros((MC,), jnp.int32)
            s_sums = jnp.zeros((MC, 3))
            s_bmin = jnp.zeros((MC, 3))
            s_bmax = jnp.zeros((MC, 3))
            s_cat = jnp.full((MC,), -1, jnp.int32)
            s_keep = jnp.zeros((MC,), jnp.bool_)
            s_ids = jnp.zeros((MC,), jnp.int32)
            s_pts = jnp.zeros((MC, K_SAMPLES, 3))

        # ---------------- integrate + archival (full resolution) ----------
        dynamic_image = _upsample(dynamic_image)
        object_image = _upsample(object_image)
        sub = av.integrate_frame(
            vol_cfg, camera, sub, depth, color, labels,
            dynamic_image > 0, R_w_c, t_w_c, t_now,
        )
        state = av.unslice_state(state, sub, start) if cropping else sub
        state = av.update_archival(vol_cfg, state, t_now)

        # ---------------- pack stats ----------------
        f32 = jnp.float32
        d_stats = jnp.concatenate(
            [
                d_sums.astype(f32),
                d_bmin.astype(f32),
                d_bmax.astype(f32),
                d_counts.astype(f32)[:, None],
                d_vox.astype(f32)[:, None],
                d_ids.astype(f32)[:, None],
            ],
            axis=1,
        )  # [MC, 12]
        s_stats = jnp.concatenate(
            [
                s_sums.astype(f32),
                s_bmin.astype(f32),
                s_bmax.astype(f32),
                s_counts.astype(f32)[:, None],
                s_cat.astype(f32)[:, None],
                s_ids.astype(f32)[:, None],
            ],
            axis=1,
        )
        packed = jnp.concatenate(
            [
                d_stats.reshape(-1),
                s_stats.reshape(-1),
                d_pts.astype(f32).reshape(-1),
                s_pts.astype(f32).reshape(-1),
            ]
        )
        return state, dynamic_image, object_image, packed

    if openset:
        def step(state, depth, color, labels, instances, features, R_w_c, t_w_c, t_now):
            return _body(state, depth, color, labels, instances, features, R_w_c, t_w_c, t_now)
    else:
        def step(state, depth, color, labels, R_w_c, t_w_c, t_now):
            return _body(state, depth, color, labels, None, None, R_w_c, t_w_c, t_now)

    if not jit:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def unpack_stats(packed: np.ndarray, features: np.ndarray = None, openset: bool = False):
    """Host-side unpack -> (dyn_clusters, sem_clusters, dyn_points, sem_points).

    Cluster lists contain MeasurementCluster for valid (renumbered id > 0)
    entries; points dict maps output id -> [K, 3] subsample. With
    openset=True the sem 'category' slot is the original instance index:
    clusters get OPENSET_CATEGORY and feature = features[index]."""
    off = 0
    d_stats = packed[off : off + MC * DYN_F].reshape(MC, DYN_F)
    off += MC * DYN_F
    s_stats = packed[off : off + MC * SEM_F].reshape(MC, SEM_F)
    off += MC * SEM_F
    d_pts = packed[off : off + MC * K_SAMPLES * 3].reshape(MC, K_SAMPLES, 3)
    off += MC * K_SAMPLES * 3
    s_pts = packed[off : off + MC * K_SAMPLES * 3].reshape(MC, K_SAMPLES, 3)

    dyn_clusters, sem_clusters = [], []
    dyn_points, sem_points = {}, {}
    for k in range(MC):
        out_id = int(d_stats[k, 11])
        if out_id > 0:
            n = max(int(d_stats[k, 9]), 1)
            dyn_clusters.append(
                MeasurementCluster(
                    cluster_id=out_id,
                    num_pixels=int(d_stats[k, 9]),
                    num_voxels=int(d_stats[k, 10]),
                    centroid=d_stats[k, 0:3] / n,
                    bbox_min=d_stats[k, 3:6],
                    bbox_max=d_stats[k, 6:9],
                )
            )
            npts = min(int(d_stats[k, 9]), K_SAMPLES)
            dyn_points[out_id] = d_pts[k, :npts]
        out_id = int(s_stats[k, 11])
        if out_id > 0:
            n = max(int(s_stats[k, 9]), 1)
            cat = int(s_stats[k, 10])
            feat = None
            if openset:
                if features is not None and 0 <= cat < len(features):
                    feat = np.asarray(features[cat], np.float32)
                cat = OPENSET_CATEGORY
            sem_clusters.append(
                MeasurementCluster(
                    cluster_id=out_id,
                    num_pixels=int(s_stats[k, 9]),
                    num_voxels=0,
                    centroid=s_stats[k, 0:3] / n,
                    bbox_min=s_stats[k, 3:6],
                    bbox_max=s_stats[k, 6:9],
                    category_id=cat,
                    feature=feat,
                )
            )
            npts = min(int(s_stats[k, 9]), K_SAMPLES)
            sem_points[out_id] = s_pts[k, :npts]
    return dyn_clusters, sem_clusters, dyn_points, sem_points
