"""SpatioTemporalMap: the queryable 4D map (scene state at all times).

Equivalent of khronos::SpatioTemporalMap (khronos/src/spatio_temporal_map/
spatio_temporal_map.cpp): stores one reconciled DSG snapshot per
change-detection pass (h:120-123); `finalize` sorts mesh vertices by
first-seen stamp so any time slice is a prefix (cpp:120-135); query
`getDsg(robot_time)` picks the closest snapshot and filters mesh
vertices/faces (all-vertices-present, cpp:646-661), objects by effective
appearance time (cpp:244-293), and trims dynamic trajectories (cpp:295-325);
binary save/load with a version field (cpp:545-640, `.4dmap`).

TPU-era simplification: snapshots are array archives; the prefix trick is an
argsort + searchsorted per snapshot (cheap, done once at update), so a time
query is numpy slicing — no incremental clone bookkeeping needed.

Semantics of query(robot_time): "what the robot KNEW at robot_time" — the
latest snapshot taken at or before robot_time, restricted to geometry first
seen by then. (The reference additionally supports query_time scrubbing
within a snapshot — exposed here via the `query_time_ns` argument using
presence intervals.)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional

import numpy as np

from khronos_tpu.stm import serialization
from khronos_tpu.stm.scene_graph import Mesh, SceneGraph
from khronos_tpu.utils import intervals as iv

FORMAT_VERSION = 3


class _SnapshotView:
    """List-like view over prefix-shared snapshots (materialized on access)."""

    def __init__(self, stm: "SpatioTemporalMap"):
        self._stm = stm

    def __len__(self) -> int:
        return len(self._stm._stores)

    def __getitem__(self, i):
        n = len(self)
        if isinstance(i, slice):
            return [self[j] for j in range(*i.indices(n))]
        if i < 0:
            i += n
        return self._stm._materialize(i)

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class SpatioTemporalMap:
    """Snapshots are stored DELTA-SHARED: the backend mesh is append-only
    with frozen per-vertex stamps between optimizations, and reconciliation
    only REMOVES vertices, so consecutive snapshots relate as
    `new = prev[keep_mask] ++ appended_tail` (stable first-seen order). Each
    snapshot stores the keep mask (1 bit/vertex), the appended tail, and the
    appended faces; surviving faces re-derive from the base by index remap.
    Loop-closure deformations (positions moved) fall back to a full chunk.
    RAM and the `.4dmap` archive grow with the CHANGES, not
    O(snapshots x vertices) (the reference clones per snapshot,
    spatio_temporal_map.cpp:100-118 — which blows up on long runs)."""

    def __init__(self):
        self.stamps_ns: List[int] = []
        # per snapshot: {"base": int (-1 = full), "keep": bool[V_base]|None,
        # "graph": SceneGraph whose mesh holds only the appended tail and
        # the appended faces (final-snapshot vertex indexing)}
        self._stores: List[dict] = []
        self._last_full: Optional[Mesh] = None  # previous snapshot's full mesh

    @property
    def snapshots(self) -> _SnapshotView:
        return _SnapshotView(self)

    # ------------------------------------------------------------------
    @staticmethod
    def _row_keys(mesh: Mesh) -> np.ndarray:
        """int64 content key per vertex (stamp + position bits); collisions
        are harmless — candidates are verified element-wise before use."""
        xb = np.ascontiguousarray(mesh.vertices, np.float32).view(np.uint32)
        k = mesh.first_seen_ns.astype(np.int64) * np.int64(1000003)
        k ^= xb[:, 0].astype(np.int64) * np.int64(0x9E3779B1)
        k ^= xb[:, 1].astype(np.int64) * np.int64(0x85EBCA77)
        k ^= xb[:, 2].astype(np.int64) * np.int64(0xC2B2AE3D)
        return k

    @classmethod
    def _make_delta(cls, prev: Mesh, new: Mesh):
        """Try to express `new` as prev[keep] ++ tail (+ appended faces).
        Returns (keep_mask, tail_mesh, diffs) or None.

        Vertex IDENTITY is (first_seen_ns, position) only: re-observation
        mutates last_seen stamps AND colors/labels (weighted color fusion)
        of existing vertices every pass, which would break sharing for the
        whole re-observed region — instead those mutable per-vertex arrays
        are stored as SPARSE DIFFS against the kept prefix (the re-observed
        set is bounded by the sensor window, not the map). The r4 full
        (colors+labels included) equality check made nearly every endurance
        snapshot a full copy: 3.0 GB of 8.3 GB RSS at 3,000 frames."""
        Vp, Vn = prev.num_vertices, new.num_vertices
        if Vp == 0:
            return None
        keep = np.isin(cls._row_keys(prev), cls._row_keys(new))
        n_old = int(keep.sum())
        if n_old > Vn:
            return None
        # verify prev[keep] == new[:n_old] exactly (hash collisions, order)
        sel = np.nonzero(keep)[0]
        if not (
            np.array_equal(prev.first_seen_ns[sel], new.first_seen_ns[:n_old])
            and np.array_equal(prev.vertices[sel], new.vertices[:n_old])
        ):
            return None
        # faces: surviving base faces (remapped) must form the new prefix
        remap = -np.ones(Vp, np.int64)
        remap[keep] = np.arange(n_old)
        if prev.num_faces:
            f = remap[prev.faces]
            derived = f[(f >= 0).all(axis=1)]
        else:
            derived = np.zeros((0, 3), np.int64)
        Fd = len(derived)
        if new.num_faces < Fd or not np.array_equal(new.faces[:Fd], derived):
            return None
        # sparse diffs over the kept prefix for the mutable arrays
        ci = np.nonzero((prev.colors[sel] != new.colors[:n_old]).any(axis=1))[0]
        li = np.nonzero(prev.labels[sel] != new.labels[:n_old])[0]
        si = np.nonzero(prev.last_seen_ns[sel] != new.last_seen_ns[:n_old])[0]
        if max(len(ci), len(li), len(si)) > 0.5 * max(n_old, 1):
            return None  # wholesale mutation: a full store is cheaper
        diffs = {
            "color_idx": ci.astype(np.int64),
            "color_val": new.colors[:n_old][ci].copy(),
            "label_idx": li.astype(np.int64),
            "label_val": new.labels[:n_old][li].copy(),
            "seen_idx": si.astype(np.int64),
            "seen_val": new.last_seen_ns[:n_old][si].copy(),
        }
        tail = Mesh(
            vertices=new.vertices[n_old:].copy(),
            colors=new.colors[n_old:].copy(),
            labels=new.labels[n_old:].copy(),
            first_seen_ns=new.first_seen_ns[n_old:].copy(),
            last_seen_ns=new.last_seen_ns[n_old:].copy(),
            faces=new.faces[Fd:].copy(),  # final-snapshot indexing
        )
        return keep, tail, diffs

    def update(self, dsg: SceneGraph, stamp_ns: int) -> None:
        """Add a reconciled snapshot (finalized: vertices sorted by first_seen)."""
        snap = dsg.clone(share_arrays=True)
        self._finalize(snap)
        full_mesh = snap.mesh
        base, keep, diffs = -1, None, None
        if self._last_full is not None:
            delta = self._make_delta(self._last_full, full_mesh)
            if delta is not None:
                keep, tail, diffs = delta
                base = len(self._stores) - 1
                snap.mesh = tail
        self._stores.append(
            {"base": base, "keep": keep, "diffs": diffs, "graph": snap}
        )
        self.stamps_ns.append(int(stamp_ns))
        self._last_full = full_mesh

    def _materialize(self, i: int) -> SceneGraph:
        """Full SceneGraph for snapshot i (mesh rebuilt from the base chain)."""
        store = self._stores[i]
        if store["base"] < 0:
            return store["graph"]
        if store.get("_cache") is not None:
            return store["_cache"]
        chain = []
        j = i
        while j >= 0 and self._stores[j]["base"] >= 0:
            chain.append(self._stores[j])
            j = self._stores[j]["base"]
        mesh = self._stores[j]["graph"].mesh  # full root chunk
        for st in reversed(chain):
            keep, tail = st["keep"], st["graph"].mesh
            sel = np.nonzero(keep)[0]
            n_old = len(sel)
            remap = -np.ones(len(keep), np.int64)
            remap[keep] = np.arange(n_old)
            if mesh.num_faces:
                f = remap[mesh.faces]
                derived = f[(f >= 0).all(axis=1)]
            else:
                derived = np.zeros((0, 3), np.int64)
            colors = mesh.colors[sel]
            labels = mesh.labels[sel]
            last_seen = mesh.last_seen_ns[sel]
            diffs = st.get("diffs")
            if diffs is not None:  # apply the prefix's sparse mutations
                colors = colors.copy()
                colors[diffs["color_idx"]] = diffs["color_val"]
                labels = labels.copy()
                labels[diffs["label_idx"]] = diffs["label_val"]
                last_seen = last_seen.copy()
                last_seen[diffs["seen_idx"]] = diffs["seen_val"]
            elif st.get("last_seen") is not None:  # v2 stores (old files)
                last_seen = st["last_seen"][:n_old]
            mesh = Mesh(
                vertices=np.concatenate([mesh.vertices[sel], tail.vertices]),
                colors=np.concatenate([colors, tail.colors]),
                labels=np.concatenate([labels, tail.labels]),
                first_seen_ns=np.concatenate(
                    [mesh.first_seen_ns[sel], tail.first_seen_ns]
                ),
                last_seen_ns=np.concatenate([last_seen, tail.last_seen_ns]),
                faces=np.concatenate([derived, tail.faces]),
            )
        out = store["graph"].clone()
        out.mesh = mesh
        # cache only the most recent materialization (the common access)
        for st in self._stores:
            st.pop("_cache", None)
        store["_cache"] = out
        return out

    @staticmethod
    def _finalize(dsg: SceneGraph) -> None:
        mesh = dsg.mesh
        if mesh.num_vertices == 0:
            return
        if np.all(mesh.first_seen_ns[1:] >= mesh.first_seen_ns[:-1]):
            return  # appended in stamp order + order-preserving filters
        order = np.argsort(mesh.first_seen_ns, kind="stable")
        remap = np.empty(len(order), np.int64)
        remap[order] = np.arange(len(order))
        mesh.vertices = mesh.vertices[order]
        mesh.colors = mesh.colors[order]
        mesh.labels = mesh.labels[order]
        mesh.first_seen_ns = mesh.first_seen_ns[order]
        mesh.last_seen_ns = mesh.last_seen_ns[order]
        if mesh.num_faces:
            mesh.faces = remap[mesh.faces]

    # ------------------------------------------------------------------
    @property
    def num_snapshots(self) -> int:
        return len(self.snapshots)

    def stamps(self) -> List[int]:
        return list(self.stamps_ns)

    def earliest_ns(self) -> int:
        return self.stamps_ns[0] if self.stamps_ns else 0

    def latest_ns(self) -> int:
        return self.stamps_ns[-1] if self.stamps_ns else 0

    # ------------------------------------------------------------------
    def get_dsg(
        self, robot_time_ns: int, query_time_ns: Optional[int] = None
    ) -> Optional[SceneGraph]:
        """Scene state as known at robot_time (optionally evaluated at
        query_time for presence filtering). Returns a fresh SceneGraph."""
        if not self.snapshots:
            return None
        idx = int(np.searchsorted(self.stamps_ns, robot_time_ns, side="right")) - 1
        idx = max(idx, 0)
        snap = self._materialize(idx)
        out = SceneGraph()
        q = robot_time_ns if query_time_ns is None else query_time_ns

        # mesh: prefix of vertices first seen by robot_time
        mesh = snap.mesh
        n_vis = int(np.searchsorted(mesh.first_seen_ns, robot_time_ns, side="right"))
        out.mesh = Mesh(
            vertices=mesh.vertices[:n_vis].copy(),
            colors=mesh.colors[:n_vis].copy(),
            labels=mesh.labels[:n_vis].copy(),
            first_seen_ns=mesh.first_seen_ns[:n_vis].copy(),
            last_seen_ns=mesh.last_seen_ns[:n_vis].copy(),
            faces=mesh.faces[(mesh.faces < n_vis).all(axis=1)].copy()
            if mesh.num_faces
            else mesh.faces.copy(),
        )

        # agents: trajectory up to robot_time
        out.agents = [a for a in snap.agents if a.stamp_ns <= robot_time_ns]

        # objects: known by robot_time (gate on DETECTION time, not the
        # reconciled presence start which can be 0 for never-absent objects —
        # reference keys on explicit first-observed, cpp:244-293); presence
        # filtering at query time stays on the intervals
        for oid, o in snap.objects.items():
            if not o.first_observed_ns or o.detected_ns() > robot_time_ns:
                continue
            oc = o.clone()
            if oc.is_dynamic:
                keep = [i for i, s in enumerate(oc.trajectory_stamps_ns) if s <= robot_time_ns]
                if not keep:
                    continue
                oc.trajectory_stamps_ns = [oc.trajectory_stamps_ns[i] for i in keep]
                oc.trajectory_positions = np.asarray(oc.trajectory_positions).reshape(-1, 3)[keep]
            out.objects[oid] = oc
        return out

    def objects_present_at(self, robot_time_ns: int, query_time_ns: int) -> Dict[int, object]:
        """Objects the robot knew at robot_time that were present at query_time."""
        dsg = self.get_dsg(robot_time_ns)
        if dsg is None:
            return {}
        return {
            oid: o
            for oid, o in dsg.objects.items()
            if iv.is_present(o.first_observed_ns, o.last_observed_ns, query_time_ns)
        }

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        """Versioned `.4dmap` archive (npz). Version 2 stores the
        prefix-shared form (per-snapshot base index + mesh delta), so the
        file grows with the changes, not O(snapshots x vertices)."""
        arrays = {
            "format_version": np.asarray([FORMAT_VERSION]),
            "stamps_ns": np.asarray(self.stamps_ns, np.int64),
            "bases": np.asarray([s["base"] for s in self._stores], np.int64),
        }
        for i, store in enumerate(self._stores):
            arrays.update(
                serialization.scene_graph_arrays(store["graph"], prefix=f"snap/{i}/")
            )
            if store.get("keep") is not None:
                arrays[f"snap/{i}/keep"] = np.packbits(store["keep"])
                arrays[f"snap/{i}/keep_len"] = np.asarray([len(store["keep"])])
                for k, v in store["diffs"].items():
                    arrays[f"snap/{i}/diff_{k}"] = v
        np.savez_compressed(path, **arrays)

    @staticmethod
    def load(path: str) -> "SpatioTemporalMap":
        out = SpatioTemporalMap()
        with np.load(path, allow_pickle=False) as data:
            version = int(data["format_version"][0])
            if version not in (1, 2, 3):
                raise ValueError(f"unsupported 4dmap version {version}")
            stamps = data["stamps_ns"]
            out.stamps_ns = [int(s) for s in stamps]
            bases = (
                data["bases"]
                if version >= 2
                else np.full(len(stamps), -1, np.int64)
            )
            for i in range(len(stamps)):
                keep = last_seen = diffs = None
                if f"snap/{i}/keep" in data:
                    n = int(data[f"snap/{i}/keep_len"][0])
                    keep = np.unpackbits(data[f"snap/{i}/keep"])[:n].astype(bool)
                    if f"snap/{i}/diff_color_idx" in data:  # v3
                        diffs = {
                            k: data[f"snap/{i}/diff_{k}"]
                            for k in ("color_idx", "color_val", "label_idx",
                                      "label_val", "seen_idx", "seen_val")
                        }
                    elif f"snap/{i}/last_seen" in data:  # v2
                        last_seen = data[f"snap/{i}/last_seen"]
                out._stores.append(
                    {
                        "base": int(bases[i]),
                        "keep": keep,
                        "diffs": diffs,
                        "last_seen": last_seen,
                        "graph": serialization.scene_graph_from_arrays(
                            data, prefix=f"snap/{i}/"
                        ),
                    }
                )
        if out._stores:
            out._last_full = out._materialize(len(out._stores) - 1).mesh
        return out
