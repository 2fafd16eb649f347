"""Object extraction: finished tracks -> KhronosObject nodes.

Equivalent of the reference MeshObjectExtractor (khronos/src/active_window/
object_extraction/mesh_object_extractor.cpp):
  - dynamic tracks: per-observation centroid trajectory + mean bbox; dropped
    if total displacement < min_dynamic_displacement (cpp:106-172);
  - static tracks: merged observation bbox -> dedicated small TSDF grid
    (voxel size = fraction of extent or fixed, cpp:200-228) -> re-integrate
    all buffered frames with binary semantics (foreground = pixels of the
    track's semantic cluster, ObjectIntegrator cpp:58-81) -> prune voxels
    whose foreground-confidence (binary likelihood ratio) is below
    min_object_reconstruction_confidence (cpp:245-264, 342-356) -> mesh ->
    volume filters -> mesh shifted into bbox frame (cpp:266-303).

TPU design: the reference's detached worker-pool threads
(object_worker_pool.cpp) become ONE batched jitted program — a fixed-shape
[G,G,G] grid integrated over a lax.scan of (padded) buffered frames; meshing
reuses the marching-tetrahedra tables. Many objects can be reconstructed by
vmap over the track batch (same compiled program).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from khronos_tpu.config import check_gt, register
from khronos_tpu.geometry.camera import Camera
from khronos_tpu.map.meshing import CORNER_OFFSETS, TET_EDGES, TET_TABLE, TETS
from khronos_tpu.stm.scene_graph import KhronosObject
from khronos_tpu.active_window.tracking import Track


@register("object_extractor", "MeshObjectExtractor")
@dataclasses.dataclass
class MeshObjectExtractorConfig:
    min_object_allocation_confidence: float = 0.5
    min_object_volume: float = 0.005  # m^3 (uHumans2.yaml:91)
    max_object_volume: float = 10.0  # m^3
    min_dynamic_displacement: float = 1.0  # m
    min_object_reconstruction_confidence: float = 0.5
    only_extract_reconstructed_objects: bool = True
    # negative: voxel = |value| * max bbox extent; positive: meters (yaml:98)
    object_reconstruction_resolution: float = -0.02
    grid_size: int = 48  # reconstruction grid voxels per side
    max_frames: int = 24  # buffered frames re-integrated per object
    min_num_observations: int = 15  # for track confidence

    def check(self):
        check_gt(self.grid_size, 7, "grid_size")
        check_gt(self.max_frames, 0, "max_frames")

    def create(self, camera: Camera):
        return MeshObjectExtractor(self, camera)


@functools.partial(jax.jit, static_argnames=("G",))
def _reconstruct_device(
    depths,  # [K, H, W]
    object_images,  # [K, H, W] int: per-pixel semantic cluster id
    cluster_ids,  # [K] int: this object's cluster id in each frame
    frame_valid,  # [K] bool (padding)
    Rs,  # [K, 3, 3]
    ts,  # [K, 3]
    fx, fy, cx, cy, width, height,
    origin,  # [3] grid corner world position (m)
    voxel,  # scalar voxel size
    trunc,  # scalar truncation
    min_conf,  # scalar: prune tsdf<0 voxels below this fg-confidence
    G: int,
):
    """Binary-semantic TSDF fusion over K frames into a [G,G,G] grid.

    The foreground test (object_image == cluster_id) happens INSIDE this
    program: as K eager device ops per extraction it cost one dispatch
    round trip each on the dev tunnel (~2.4 s/extract measured in the r4
    endurance profile — the backend stage's dominant term).

    Returns (tsdf, weight, confidence) where confidence = w_fg/(w_fg+w_bg);
    tsdf<0 voxels with confidence < min_conf are pruned to +trunc with
    their weight kept (mesh_object_extractor.cpp:245-264 semantics)."""
    ix = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 2)
    centers = origin + (jnp.stack([ix, iy, iz], -1).astype(jnp.float32) + 0.5) * voxel

    def body(carry, inputs):
        tsdf, w, w_fg, w_bg = carry
        depth, obj_img, cid, ok, R, t = inputs
        fg = obj_img == cid
        pc = jnp.einsum("ji,xyzj->xyzi", R, centers - t)
        z = pc[..., 2]
        safe_z = jnp.where(z > 1e-6, z, 1e-6)
        u = pc[..., 0] / safe_z * fx + cx
        v = pc[..., 1] / safe_z * fy + cy
        in_img = (z > 1e-6) & (u >= 0) & (u <= width - 1) & (v >= 0) & (v <= height - 1)
        ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, width - 1)
        vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, height - 1)
        d = depth[vi, ui]
        is_fg = fg[vi, ui]
        valid_pix = in_img & (d > 0.0) & ok
        rscale = jnp.sqrt(pc[..., 0] ** 2 + pc[..., 1] ** 2 + z * z) / safe_z
        sdf = (d - z) * rscale

        in_band = valid_pix & (jnp.abs(sdf) <= trunc)
        in_front = valid_pix & (sdf > trunc)
        # tsdf from foreground pixels only (ObjectIntegrator binary semantics);
        # free-space carving from any valid pixel seeing through the voxel
        upd = (in_band & is_fg) | in_front
        sdf_c = jnp.clip(sdf, -trunc, trunc)
        w_new = jnp.where(upd, w + 1.0, w)
        tsdf_new = jnp.where(upd, (tsdf * w + sdf_c) / (w + 1.0), tsdf)
        # binary semantic evidence near the surface band
        w_fg_new = w_fg + jnp.where(in_band & is_fg, 1.0, 0.0)
        w_bg_new = w_bg + jnp.where((in_band & ~is_fg) | in_front, 1.0, 0.0)
        return (tsdf_new, w_new, w_fg_new, w_bg_new), None

    G3 = (G, G, G)
    init = (
        jnp.full(G3, trunc, jnp.float32),
        jnp.zeros(G3, jnp.float32),
        jnp.zeros(G3, jnp.float32),
        jnp.zeros(G3, jnp.float32),
    )
    (tsdf, w, w_fg, w_bg), _ = jax.lax.scan(
        body, init, (depths, object_images, cluster_ids, frame_valid, Rs, ts)
    )
    conf = w_fg / jnp.maximum(w_fg + w_bg, 1.0)
    prune = (tsdf < 0.0) & (conf < min_conf)
    tsdf = jnp.where(prune, trunc, tsdf)
    return tsdf, w, conf


MAX_OBJ_TRIS = 32768


@functools.partial(jax.jit, static_argnames=("G",))
def _mesh_small_grid(tsdf, weight, origin, voxel, G: int):
    """Marching tetrahedra over ALL cells of a small grid, compacted on
    device to MAX_OBJ_TRIS (one small host transfer instead of ~50 MB).
    Returns packed [MAX_OBJ_TRIS + 1, 9]; last row = [n_tris, vmin(3),
    vmax(3), 0, 0] where the bbox covers ALL valid triangles (even those
    dropped by the capacity cap, so volume filters see the true extent)."""
    C = G - 1
    off = jnp.asarray(CORNER_OFFSETS)
    ii = jax.lax.broadcasted_iota(jnp.int32, (C, C, C), 0).reshape(-1)[:, None] + off[None, :, 0]
    jj = jax.lax.broadcasted_iota(jnp.int32, (C, C, C), 1).reshape(-1)[:, None] + off[None, :, 1]
    kk = jax.lax.broadcasted_iota(jnp.int32, (C, C, C), 2).reshape(-1)[:, None] + off[None, :, 2]
    sdf = tsdf[ii, jj, kk]  # [C^3, 8]
    wgt = weight[ii, jj, kk]
    pos = origin + (jnp.stack([ii, jj, kk], -1).astype(jnp.float32) + 0.5) * voxel
    cell_ok = (wgt > 0.0).all(axis=1)

    tets = jnp.asarray(TETS)
    t_sdf = sdf[:, tets]
    inside = (t_sdf < 0.0).astype(jnp.int32)
    case = inside[..., 0] + inside[..., 1] * 2 + inside[..., 2] * 4 + inside[..., 3] * 8
    tri_edges = jnp.asarray(TET_TABLE)[case]  # [N,6,2,3]
    tri_valid = (tri_edges[..., 0] >= 0) & cell_ok[:, None, None]
    edge_v = jnp.asarray(TET_EDGES)
    safe_edges = jnp.maximum(tri_edges, 0)
    lv_p = edge_v[safe_edges, 0]
    lv_q = edge_v[safe_edges, 1]
    t_idx = jnp.arange(6)[None, :, None, None]
    gc_p = tets[t_idx, lv_p]
    gc_q = tets[t_idx, lv_q]
    N = sdf.shape[0]
    c_idx = jnp.arange(N)[:, None, None, None]
    sdf_p = sdf[c_idx, gc_p]
    sdf_q = sdf[c_idx, gc_q]
    denom = sdf_p - sdf_q
    t_int = jnp.clip(
        jnp.where(jnp.abs(denom) > 1e-9, sdf_p / jnp.where(denom == 0, 1e-9, denom), 0.5),
        0.0,
        1.0,
    )[..., None]
    pos_p = pos[c_idx, gc_p]
    pos_q = pos[c_idx, gc_q]
    verts = pos_p + t_int * (pos_q - pos_p)
    from khronos_tpu.ops.clusters import compact_rows

    flat_valid = tri_valid.reshape(N * 12)
    flat_verts = verts.reshape(N * 12, 9)
    packed = compact_rows(flat_verts, flat_valid, MAX_OBJ_TRIS)
    n = jnp.minimum(jnp.sum(flat_valid.astype(jnp.int32)), MAX_OBJ_TRIS)
    # bbox over ALL valid triangles (cap-independent)
    tri_pts = flat_verts.reshape(N * 12, 3, 3)
    big = jnp.float32(1e30)
    vmask = flat_valid[:, None, None]
    vmin = jnp.min(jnp.where(vmask, tri_pts, big), axis=(0, 1))
    vmax = jnp.max(jnp.where(vmask, tri_pts, -big), axis=(0, 1))
    meta = jnp.concatenate(
        [n.astype(jnp.float32)[None], vmin, vmax, jnp.zeros(2, jnp.float32)]
    )[None, :]
    return jnp.concatenate([packed, meta], axis=0)


class MeshObjectExtractor:
    def __init__(self, config: MeshObjectExtractorConfig, camera: Camera):
        self.config = config
        self.camera = camera
        self._next_node_id = 1

    # ------------------------------------------------------------------
    def extract(self, track: Track, frame_buffer) -> Optional[KhronosObject]:
        """Turn a finished track into an object node (or None if rejected)."""
        cfg = self.config
        if track.confidence(cfg.min_num_observations) < cfg.min_object_allocation_confidence:
            return None
        if track.is_dynamic:
            return self._extract_dynamic(track)
        return self._extract_static(track, frame_buffer)

    def extract_all(self, tracks: List[Track], frame_buffer) -> List[KhronosObject]:
        out = []
        for t in tracks:
            obj = self.extract(t, frame_buffer)
            if obj is not None:
                out.append(obj)
        return out

    # ------------------------------------------------------------------
    def _extract_dynamic(self, track: Track) -> Optional[KhronosObject]:
        obs = [o for o in track.observations if o.centroid is not None]
        if len(obs) < 2:
            return None
        traj = np.stack([o.centroid for o in obs]).astype(np.float32)
        stamps = [o.stamp_ns for o in obs]
        disp = float(np.linalg.norm(traj - traj[0], axis=1).max())
        if disp < self.config.min_dynamic_displacement:
            return None
        # mean bbox extent, placed at the first centroid
        ext = np.stack([o.bbox_max - o.bbox_min for o in obs]).mean(axis=0)
        bbox_min = traj[0] - ext / 2
        bbox_max = traj[0] + ext / 2
        obj = KhronosObject(
            node_id=self._next_node_id,
            semantic_category=track.semantic_category,
            bbox_min=bbox_min,
            bbox_max=bbox_max,
            first_observed_ns=[track.first_seen_ns],
            last_observed_ns=[track.last_seen_ns],
            mesh_vertices=np.zeros((0, 3), np.float32),
            mesh_faces=np.zeros((0, 3), np.int64),
            mesh_colors=np.zeros((0, 3), np.float32),
            trajectory_stamps_ns=stamps,
            trajectory_positions=traj,
            feature=track.feature,
            confidence=track.confidence(self.config.min_num_observations),
        )
        self._next_node_id += 1
        return obj

    # ------------------------------------------------------------------
    def _extract_static(self, track: Track, frame_buffer) -> Optional[KhronosObject]:
        cfg = self.config
        cam = self.camera
        # observations with a semantic cluster and a buffered frame
        obs = [
            o
            for o in track.observations
            if o.semantic_cluster_id > 0 and frame_buffer.get(o.stamp_ns) is not None
        ]
        if not obs:
            return None
        if len(obs) > cfg.max_frames:
            sel = np.linspace(0, len(obs) - 1, cfg.max_frames).astype(int)
            obs = [obs[i] for i in sel]

        bbox_min = np.min(np.stack([o.bbox_min for o in obs]), axis=0)
        bbox_max = np.max(np.stack([o.bbox_max for o in obs]), axis=0)
        extent = bbox_max - bbox_min
        max_extent = float(extent.max())
        if max_extent <= 0:
            return None
        res = cfg.object_reconstruction_resolution
        if res == 0:
            return None
        voxel = abs(res) * max_extent if res < 0 else res
        voxel = max(voxel, 0.005)
        # grid covers bbox + margin
        margin = 2.5 * voxel
        origin = bbox_min - margin
        G = cfg.grid_size
        needed = (extent + 2 * margin).max() / G
        voxel = max(voxel, float(needed) * 1.001)
        trunc = 2.0 * voxel

        K = cfg.max_frames
        H, W = cam.height, cam.width
        # stack directly from device-resident buffered frames (no host
        # pulls, no eager per-frame ops — the fg test and low-confidence
        # prune live inside _reconstruct_device)
        zero_depth = jnp.zeros((H, W), jnp.float32)
        zero_obj = jnp.zeros((H, W), jnp.int32)
        depth_list, obj_list = [], []
        cids = np.zeros((K,), np.int32)
        Rs = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        ts = np.zeros((K, 3), np.float32)
        ok = np.zeros((K,), np.bool_)
        for k in range(K):
            if k < len(obs):
                o = obs[k]
                fd = frame_buffer.get(o.stamp_ns)
                depth_list.append(fd.depth)
                obj_list.append(fd.object_image)
                cids[k] = o.semantic_cluster_id
                Rs[k] = np.asarray(fd.R_w_c)
                ts[k] = np.asarray(fd.t_w_c)
                ok[k] = True
            else:
                depth_list.append(zero_depth)
                obj_list.append(zero_obj)

        tsdf, weight, conf = _reconstruct_device(
            jnp.stack(depth_list),
            jnp.stack(obj_list),  # already int32 device arrays (fused_step)
            jnp.asarray(cids),
            jnp.asarray(ok),
            jnp.asarray(Rs),
            jnp.asarray(ts),
            cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height,
            jnp.asarray(origin, jnp.float32),
            jnp.float32(voxel),
            jnp.float32(trunc),
            jnp.float32(cfg.min_object_reconstruction_confidence),
            G,
        )
        packed_dev = _mesh_small_grid(
            tsdf, weight, jnp.asarray(origin, jnp.float32), jnp.float32(voxel), G
        )
        # pull the meta row first, then ONLY the real triangle rows: the full
        # packed array is ~600 KB/track and the dev tunnel moves ~13 MB/s —
        # the pull dominated per-track extraction (r5 endurance profile)
        meta_row = np.asarray(packed_dev[-1])
        n = int(meta_row[0])
        packed = np.concatenate(
            [np.asarray(packed_dev[:n]), meta_row[None]]
        ) if n else meta_row[None]
        verts = packed[:n].reshape(-1, 3, 3)
        if len(verts) == 0:
            return None if cfg.only_extract_reconstructed_objects else self._bbox_only(track, bbox_min, bbox_max)

        # volume filter: bbox of the FULL reconstructed surface (from the
        # device-side reduction over all valid triangles, independent of the
        # MAX_OBJ_TRIS packing cap)
        vmin = packed[-1, 1:4].copy()
        vmax = packed[-1, 4:7].copy()
        vol = float(np.prod(np.clip(vmax - vmin, 0, None)))
        if vol < cfg.min_object_volume or vol > cfg.max_object_volume:
            return None

        # index the triangle soup (dedup at half-voxel resolution)
        from khronos_tpu.stm.scene_graph import MeshAccumulator

        acc = MeshAccumulator(resolution=voxel * 0.5)
        T = len(verts)
        zero = np.zeros((T, 3), np.int64)
        col = np.full((T, 3, 3), 0.5, np.float32)
        acc.add_triangles(verts, col, zero, zero, np.full((T, 3), track.semantic_category))
        mesh = acc.build()

        obj = KhronosObject(
            node_id=self._next_node_id,
            semantic_category=track.semantic_category,
            bbox_min=vmin,
            bbox_max=vmax,
            first_observed_ns=[track.first_seen_ns],
            last_observed_ns=[track.last_seen_ns],
            mesh_vertices=mesh.vertices - vmin.astype(np.float32),
            mesh_faces=mesh.faces,
            mesh_colors=mesh.colors,
            feature=track.feature,
            confidence=track.confidence(cfg.min_num_observations),
        )
        self._next_node_id += 1
        return obj

    def _bbox_only(self, track: Track, bbox_min, bbox_max) -> KhronosObject:
        obj = KhronosObject(
            node_id=self._next_node_id,
            semantic_category=track.semantic_category,
            bbox_min=bbox_min,
            bbox_max=bbox_max,
            first_observed_ns=[track.first_seen_ns],
            last_observed_ns=[track.last_seen_ns],
            mesh_vertices=np.zeros((0, 3), np.float32),
            mesh_faces=np.zeros((0, 3), np.int64),
            mesh_colors=np.zeros((0, 3), np.float32),
            feature=track.feature,
            confidence=track.confidence(self.config.min_num_observations),
        )
        self._next_node_id += 1
        return obj
