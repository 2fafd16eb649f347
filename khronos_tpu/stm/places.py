"""Free-space places graph + room segmentation (hydra GVD-frontend parity).

Equivalent of hydra's freespace_places GVD extraction and room finder
(SURVEY.md §2.3; mapper config uHumans2.yaml:113-150: gvd max/min_distance,
compression_distance_m 1.5, min_node_distance, room_finder). TPU design:

1. Occupancy grid from the background mesh (scatter vertices).
2. Euclidean-ish distance field via chamfer propagation — K iterations of
   axis-separable min-convolution with metric edge costs (replaces the
   reference's bucketed-queue GVD integrator with a fixed-iteration stencil
   the compiler can fuse).
3. Place candidates = local maxima of the distance field with clearance in
   [min_distance, max_distance] (the medial-axis / Voronoi ridge).
4. Graph: candidates compressed on a `compression_distance` grid; edges
   between nearby places whose connecting segment keeps `min_edge_clearance`.
5. Rooms: connected components of the place graph using only edges whose
   clearance exceeds `room_clearance` (doorways drop below it and split
   rooms), matching the role of hydra's room finder.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class PlacesConfig:
    voxel_size: float = 0.2  # m (coarser than the map voxel)
    min_distance: float = 0.3  # m clearance for a place (gvd min_distance)
    max_distance: float = 4.5  # m (gvd max_distance)
    compression_distance: float = 1.5  # m between place nodes
    edge_radius: float = 3.0  # m max edge length
    min_edge_clearance: float = 0.25  # m along an edge
    room_clearance: float = 0.8  # m: edges narrower than this split rooms
    chamfer_iterations: int = 24
    z_slab: Tuple[float, float] = (0.1, 2.2)  # m band used for places


@dataclasses.dataclass
class PlaceNode:
    place_id: int
    position: np.ndarray  # [3]
    distance: float  # clearance (m)
    room_id: int = -1


@dataclasses.dataclass
class PlacesLayer:
    nodes: List[PlaceNode] = dataclasses.field(default_factory=list)
    edges: List[Tuple[int, int, float]] = dataclasses.field(default_factory=list)
    # (place_id, place_id, min clearance along edge)

    @property
    def num_rooms(self) -> int:
        return len({n.room_id for n in self.nodes if n.room_id >= 0})


@functools.partial(jax.jit, static_argnames=("iterations",))
def chamfer_distance_field(occupied: jnp.ndarray, voxel: float, iterations: int):
    """Distance-to-obstacle field via separable chamfer propagation."""
    big = jnp.float32(1e6)
    d = jnp.where(occupied, 0.0, big)

    def body(_, d):
        for axis in (0, 1, 2):
            lo = jnp.roll(d, 1, axis)
            hi = jnp.roll(d, -1, axis)
            # roll wraps; suppress wrap-around by padding cost at borders
            n = d.shape[axis]
            idx = jax.lax.broadcasted_iota(jnp.int32, d.shape, axis)
            lo = jnp.where(idx == 0, big, lo)
            hi = jnp.where(idx == n - 1, big, hi)
            d = jnp.minimum(d, jnp.minimum(lo, hi) + voxel)
        return d

    return jax.lax.fori_loop(0, iterations, body, d)


@jax.jit
def _local_maxima(d: jnp.ndarray):
    from khronos_tpu.ops.dense import max_pool3

    return d >= max_pool3(d) - 1e-6


class PlacesExtractor:
    def __init__(self, config: PlacesConfig = None):
        self.config = config or PlacesConfig()

    # ------------------------------------------------------------------
    def extract(self, mesh_vertices: np.ndarray) -> PlacesLayer:
        """Build the places layer from background mesh vertices."""
        cfg = self.config
        layer = PlacesLayer()
        if len(mesh_vertices) < 10:
            return layer
        vs = cfg.voxel_size
        lo = mesh_vertices.min(axis=0) - 2 * vs
        hi = mesh_vertices.max(axis=0) + 2 * vs
        dims = np.maximum(((hi - lo) / vs).astype(int) + 1, 4)
        dims = np.minimum(dims, 256)

        idx = ((mesh_vertices - lo) / vs).astype(int)
        ok = ((idx >= 0) & (idx < dims)).all(axis=1)
        idx = idx[ok]
        occ = jnp.zeros(tuple(dims), jnp.bool_).at[idx[:, 0], idx[:, 1], idx[:, 2]].set(True)

        d = chamfer_distance_field(occ, vs, cfg.chamfer_iterations)
        maxima = _local_maxima(d)
        d_np = np.asarray(d)
        maxima_np = np.asarray(maxima)

        # z-slab + clearance band
        zs = lo[2] + (np.arange(dims[2]) + 0.5) * vs
        slab = (zs >= cfg.z_slab[0]) & (zs <= cfg.z_slab[1])
        cand = maxima_np & (d_np >= cfg.min_distance) & (d_np <= cfg.max_distance)
        cand &= slab[None, None, :]
        coords = np.argwhere(cand)
        if len(coords) == 0:
            return layer
        dists = d_np[cand]
        positions = lo + (coords + 0.5) * vs

        # compression: keep the highest-clearance candidate per coarse cell
        keys = np.floor(positions / cfg.compression_distance).astype(np.int64)
        best: Dict[tuple, int] = {}
        for i, k in enumerate(map(tuple, keys)):
            if k not in best or dists[i] > dists[best[k]]:
                best[k] = i
        chosen = sorted(best.values())
        for pid, i in enumerate(chosen):
            layer.nodes.append(
                PlaceNode(place_id=pid, position=positions[i].astype(np.float32), distance=float(dists[i]))
            )

        # edges: nearby places with clearance along the segment
        P = np.stack([n.position for n in layer.nodes])
        for a in range(len(layer.nodes)):
            for b in range(a + 1, len(layer.nodes)):
                seg = P[b] - P[a]
                length = np.linalg.norm(seg)
                if length > cfg.edge_radius:
                    continue
                n_samples = max(int(length / vs), 2)
                ts = np.linspace(0, 1, n_samples)
                pts = P[a] + ts[:, None] * seg
                cells = np.clip(((pts - lo) / vs).astype(int), 0, dims - 1)
                clear = d_np[cells[:, 0], cells[:, 1], cells[:, 2]].min()
                if clear >= cfg.min_edge_clearance:
                    layer.edges.append((a, b, float(clear)))

        self._assign_rooms(layer)
        return layer

    # ------------------------------------------------------------------
    def _assign_rooms(self, layer: PlacesLayer) -> None:
        """Union-find over wide edges; narrow passages separate rooms."""
        cfg = self.config
        parent = list(range(len(layer.nodes)))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b, clear in layer.edges:
            if clear >= cfg.room_clearance:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
        roots: Dict[int, int] = {}
        for i, n in enumerate(layer.nodes):
            r = find(i)
            if r not in roots:
                roots[r] = len(roots)
            n.room_id = roots[r]
