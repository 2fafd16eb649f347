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
