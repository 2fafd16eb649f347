"""Multi-chip sharding of the active-window map (SPMD over a device mesh).

The reference is single-process multi-threaded (SURVEY.md §2.7); the TPU
design scales by sharding the dense voxel grid SPATIALLY over a 1D device
mesh axis ("x" = the grid's leading axis) with `jax.sharding.NamedSharding`.
Everything in `integrate_frame` is elementwise/gather over the grid, so XLA
partitions it directly; the 3x3x3 tracking-layer stencils induce halo
exchanges that XLA lowers to collective-permutes over ICI — no hand-written
NCCL-style code (BASELINE.json north star: sharded voxel map).

The camera image is replicated (it is small relative to the grid); per-frame
cluster statistics reduce with psum-like all-reduces XLA inserts at the
segment-sum boundaries.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from khronos_tpu.map import active_volume as av


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def volume_sharding(mesh: Mesh, axis: str = "x") -> av.VolumeState:
    """A VolumeState-shaped pytree of NamedShardings: grid leading axis
    sharded over the mesh axis, origin replicated."""
    grid = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return av.VolumeState(
        origin=rep,
        tsdf=grid,
        weight=grid,
        color=grid,
        label=grid,
        label_weight=grid,
        first_obs=grid,
        last_obs=grid,
        last_occupied=grid,
        ever_free=grid,
        archived=grid,
        cell_meshed=grid,
    )


def shard_volume(state: av.VolumeState, mesh: Mesh, axis: str = "x") -> av.VolumeState:
    shardings = volume_sharding(mesh, axis)
    return jax.tree.map(jax.device_put, state, shardings)


def make_sharded_frame_step(
    config: av.VolumeConfig,
    camera,
    md_cfg,
    od_cfg,
    label_space,
    mesh: Mesh,
    axis: str = "x",
    detection_stride: int = 1,
    background_embeddings=None,
    feature_dim: int = 0,
):
    """The FULL fused active-window frame step (motion detection, object
    detection, TSDF+tracking integration, packed cluster stats) compiled SPMD
    over the device mesh: the voxel grid is sharded spatially on its leading
    axis, camera images are replicated, detection scatters partition onto the
    owning shard, the 3x3x3 stencils halo-exchange over ICI, and the
    pixel-side cluster reductions run replicated (they are image-sized).

    Returns step(state, depth, color, labels, R, t, t_now) ->
    (state', dynamic_image, object_image, packed_stats) like
    fused_step.make_frame_step (open-set variant takes instances+features
    like the single-device builder). Cropping is disabled (see
    make_frame_step)."""
    from khronos_tpu.active_window import fused_step as fs

    raw = fs.make_frame_step(
        config,
        camera,
        md_cfg,
        od_cfg,
        label_space,
        detection_stride=detection_stride,
        crop=False,
        jit=False,
        background_embeddings=background_embeddings,
        feature_dim=feature_dim,
        # row-shard the pixel pipeline over the mesh: without it the
        # image-side detection work replicates on every device (the Amdahl
        # term of the production-shape partitioning study)
        mesh=mesh,
        mesh_axis=axis,
    )
    vol_shard = volume_sharding(mesh, axis)
    rep = NamedSharding(mesh, P())
    openset = od_cfg is not None and od_cfg.__class__.__name__.startswith(
        "InstanceForwarding"
    )
    n_rep = 8 if openset else 6  # image/pose args after the volume state
    jitted = jax.jit(
        raw,
        in_shardings=(vol_shard,) + (rep,) * n_rep,
        out_shardings=(vol_shard, rep, rep, rep),
        donate_argnums=(0,),
    )

    def step(state, *args):
        # host-side passes between frames (mesh emission, scroll) go through
        # jitted programs WITHOUT explicit shardings; XLA's propagation can
        # hand back replicated grids. Re-pin to the canonical layout — a
        # no-op when already correct, an on-device reshard otherwise.
        state = jax.tree.map(jax.device_put, state, vol_shard)
        return jitted(state, *args)

    step.jitted = jitted  # for AOT inspection (scaling harness cost proxy)
    return step


def make_sharded_ray_query(verificator, mesh: Mesh, axis: str = "x"):
    """Shard the change-detection ray check over the device mesh: query
    points split across devices, ray library (CSR block hash) replicated —
    the '§2.7 CD shards over hosts' axis. Returns query(points [P,3]) ->
    evidence [P, num_bins, 2] (P padded to a multiple of the mesh size
    internally)."""
    from khronos_tpu.changes import ray_verificator as rv

    cfg = verificator.config
    n = mesh.devices.size
    shard_p = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def query(points: np.ndarray) -> np.ndarray:
        P_n = len(points)
        num_bins = (
            verificator.active_num_bins if verificator._built else cfg.num_bins
        )
        if not verificator._built or P_n == 0:
            return np.zeros((P_n, num_bins, 2), np.int32)
        pad = (-P_n) % (n * 8)
        pts = np.asarray(points, np.float32)
        if pad:
            pts = np.concatenate([pts, np.zeros((pad, 3), np.float32)])
        ev = rv._query_device(
            jax.device_put(jnp.asarray(pts), shard_p),
            jax.device_put(verificator.sorted_rays, rep),
            jax.device_put(verificator.cell_start, rep),
            jax.device_put(verificator.ray_table, rep),
            cfg.hash_cells,
            cfg.block_size,
            cfg.radial_tolerance,
            cfg.depth_tolerance,
            cfg.temporal_resolution,
            num_bins,
            cfg.max_candidates,
        )
        return np.asarray(ev)[:P_n]

    return query


def make_sharded_step(config: av.VolumeConfig, camera, mesh: Mesh, axis: str = "x"):
    """Jit the fused integrate+archival step with explicit in/out shardings.

    Returns step(state, depth, color, labels, mask, R, t, t_now) -> state,
    compiled SPMD over the mesh: grid ops partitioned, image replicated, halo
    exchange for the neighborhood stencils inserted by XLA.
    """
    vol_shard = volume_sharding(mesh, axis)
    rep = NamedSharding(mesh, P())

    def step(state, depth, color, labels, mask, R, t, t_now):
        state = av.integrate_frame(
            config, camera, state, depth, color, labels, mask, R, t, t_now
        )
        return av.update_archival(config, state, t_now)

    return jax.jit(
        step,
        in_shardings=(vol_shard, rep, rep, rep, rep, rep, rep, rep),
        out_shardings=vol_shard,
    )
