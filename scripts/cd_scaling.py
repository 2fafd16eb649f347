"""Change-detection + reconciliation scaling micro-bench (VERDICT r1 task 4).

The round-1 review flagged O(V)/O(N^2) Python loops in the reconciliation
path (reconciler cell-proximity check, face dict loop, pairwise merge scan);
they were vectorized in round 2. This bench demonstrates the result: one CD
pass (sequential detector: ray library build + background + object checks)
plus reconciliation, at growing background mesh sizes. PASS = wall time per
kilovertex stays ~flat (linear overall), i.e. no quadratic blow-up.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=. \
        python scripts/cd_scaling.py
"""

import json
import sys
import time

import numpy as np


def build_dsg(n_verts: int, n_objects: int, rng):
    """Corridor sweep: the map grows in AREA at a BOUNDED sensor range (the
    production growth mode — more rooms over time, rays never longer than
    max_range), not a single room inflating (which would grow ray lengths
    with map size and make per-vertex cost physically superlinear)."""
    from khronos_tpu.stm.scene_graph import AgentNode, KhronosObject, Mesh, SceneGraph

    width = 6.0
    length = n_verts / (40.0 * width)  # constant vertex density per m^2
    speed = 1.0  # m/s along the corridor
    dsg = SceneGraph()
    stamps = np.arange(0.0, length / speed, 1.0)
    dsg.agents = [
        AgentNode(
            int(s * 1e9),
            np.eye(3, dtype=np.float32),
            np.asarray([s * speed, width / 2, 1.2], np.float32),
        )
        for s in stamps
    ]
    # corridor walls + floor; each vertex observed while the agent is nearby
    pts = rng.uniform([0, 0, 0], [length, width, 2.4], size=(n_verts, 3)).astype(
        np.float32
    )
    wall = rng.integers(0, 3, n_verts)
    pts[wall == 0, 1] = 0.0
    pts[wall == 1, 1] = width
    pts[wall == 2, 2] = 0.0
    t_pass = pts[:, 0] / speed
    first = np.maximum(t_pass - 3.0, 0.0)
    last = t_pass + 3.0
    faces_n = n_verts // 3
    faces = np.arange(faces_n * 3, dtype=np.int64).reshape(-1, 3)
    dsg.mesh = Mesh(
        vertices=pts,
        colors=np.zeros((n_verts, 3), np.float32),
        labels=np.zeros(n_verts, np.int32),
        first_seen_ns=(first * 1e9).astype(np.int64),
        last_seen_ns=(last * 1e9).astype(np.int64),
        faces=faces,
    )
    for i in range(n_objects):
        c = rng.uniform([1, 1, 0.3], [max(length - 1, 2), width - 1, 1.0]).astype(
            np.float32
        )
        m = rng.normal(scale=0.15, size=(30, 3)).astype(np.float32)
        t_c = float(c[0])  # observed while the agent passes
        dsg.objects[i + 1] = KhronosObject(
            node_id=i + 1,
            semantic_category=2,
            bbox_min=c - 0.2,
            bbox_max=c + 0.2,
            first_observed_ns=[int(max(t_c - 3.0, 0.0) * 1e9)],
            last_observed_ns=[int((t_c + 3.0) * 1e9)],
            mesh_vertices=m - m.min(0),
            mesh_faces=np.zeros((0, 3), np.int64),
            mesh_colors=np.zeros((30, 3), np.float32),
        )
    return dsg


def run_once(n_verts: int, n_objects: int) -> dict:
    from khronos_tpu.changes.detectors import (
        SequentialChangeDetector,
        SequentialChangeDetectorConfig,
    )
    from khronos_tpu.changes.reconciler import Reconciler, ReconcilerConfig
    from khronos_tpu.config import build

    rng = np.random.default_rng(0)
    dsg = build_dsg(n_verts, n_objects, rng)
    det = SequentialChangeDetector(
        build(SequentialChangeDetectorConfig, {"verificator": {"ray_policy": "First"}})
    )
    rec = Reconciler(ReconcilerConfig())
    # warm-up pass compiles the device kernels (shape buckets)
    det.detect_changes(dsg, had_loop_closure=True, merges=[])
    t0 = time.perf_counter()
    changes = det.detect_changes(dsg, had_loop_closure=True, merges=[])
    t_detect = time.perf_counter() - t0
    # steady-state incremental pass (no LC, no new geometry): background and
    # object work gate on touched hash cells — round-3 task 9 requires the
    # OBJECT pass to stay flat as object count grows 10x
    t0 = time.perf_counter()
    det.detect_changes(dsg, had_loop_closure=False, merges=[])
    t_incr = time.perf_counter() - t0
    t0 = time.perf_counter()
    rec.reconcile(dsg, changes, [])
    t_reconcile = time.perf_counter() - t0
    total = t_detect + t_reconcile
    return {
        "n_verts": n_verts,
        "n_objects": n_objects,
        "detect_s": round(t_detect, 3),
        "detect_incremental_s": round(t_incr, 3),
        "reconcile_s": round(t_reconcile, 3),
        "total_s": round(total, 3),
        "ms_per_kvert": round(total / (n_verts / 1000.0) * 1000.0, 2),
    }


def object_scan_scaling(n_objects: int) -> dict:
    """r4 VERDICT task 9: per-object cost of the twin-presence veto and of
    merge-proposal candidate generation must stay FLAT as object counts grow
    to 1,000 (grid-bucketed candidates, not all-pairs scans)."""
    from khronos_tpu.backend.backend import Backend, BackendConfig
    from khronos_tpu.changes.change_state import ObjectChange
    from khronos_tpu.changes.detectors import (
        SequentialChangeDetector,
        SequentialChangeDetectorConfig,
    )
    from khronos_tpu.geometry.bbox import BboxGrid

    rng = np.random.default_rng(1)
    # objects spread over a corridor whose length grows with count (constant
    # spatial density — the production regime; a fixed-size room would pack
    # all objects into a few grid cells and measure density, not count)
    length = max(4.0, n_objects * 0.5)
    dsg = build_dsg(4000, 0, rng)
    be = Backend(BackendConfig(add_merge_factor=False))
    from khronos_tpu.stm.scene_graph import KhronosObject

    objs = []
    for i in range(n_objects):
        if i % 10 == 9 and objs:
            # genuine re-extraction twin of the previous object (same class,
            # coincident box, disjoint observation) so the proposal pair
            # loop and GNC-free validation path are exercised, not just
            # candidate generation
            prev = objs[-1]
            c = 0.5 * (prev.bbox_min + prev.bbox_max) + 0.02
            cls = prev.semantic_category
            t_c = prev.last_observed_ns[-1] * 1e-9 + 60.0
        else:
            c = rng.uniform([1, 1, 0.3], [length, 5.0, 1.0]).astype(np.float32)
            cls = int(rng.integers(2, 6))
            t_c = float(c[0])
        o = KhronosObject(
            node_id=i + 1,
            semantic_category=cls,
            bbox_min=c - 0.2,
            bbox_max=c + 0.2,
            first_observed_ns=[int(max(t_c - 3.0, 0.0) * 1e9)],
            last_observed_ns=[int((t_c + 3.0) * 1e9)],
            mesh_vertices=rng.normal(scale=0.15, size=(30, 3)).astype(np.float32),
            mesh_faces=np.zeros((0, 3), np.int64),
            mesh_colors=np.zeros((30, 3), np.float32),
        )
        objs.append(o)
        be.objects[o.node_id] = o
        dsg.objects[o.node_id] = o

    # merge-proposal candidate generation (grid-bucketed pair scan)
    t0 = time.perf_counter()
    be._propose_merges()
    t_prop = time.perf_counter() - t0

    # twin-presence veto: every object carries an absent claim
    det = SequentialChangeDetector(SequentialChangeDetectorConfig())
    cfg = det.config.objects
    obj_pts = {o.node_id: det._object_points(o, cfg) for o in objs}
    env = {
        o.node_id: (o.first_observed_ns[0], o.last_observed_ns[-1]) for o in objs
    }
    mns = np.stack([obj_pts[o.node_id].min(axis=0) for o in objs])
    mxs = np.stack([obj_pts[o.node_id].max(axis=0) for o in objs])
    t0 = time.perf_counter()
    grid = BboxGrid(mns, mxs)
    for o in objs:
        oc = ObjectChange(o.node_id)
        oc.last_absent_ns = o.last_observed_ns[-1] + int(5e9)
        det._veto_identity_splits(o, oc, objs, env, obj_pts, cfg, grid)
    t_veto = time.perf_counter() - t0

    return {
        "n_objects": n_objects,
        "proposals": len(be.proposed_merges),
        "propose_ms": round(t_prop * 1e3, 1),
        "propose_us_per_obj": round(t_prop / n_objects * 1e6, 1),
        "veto_ms": round(t_veto * 1e3, 1),
        "veto_us_per_obj": round(t_veto / n_objects * 1e6, 1),
    }


def main():
    sizes = [(20000, 10), (40000, 20), (80000, 40), (160000, 80)]
    rows = [run_once(v, o) for v, o in sizes]
    for r in rows:
        print(json.dumps(r))
    per_kv = [r["ms_per_kvert"] for r in rows]
    growth = per_kv[-1] / per_kv[0]
    print(
        f"\nper-kilovertex growth 20k->160k: {growth:.2f}x "
        f"({per_kv[0]:.1f} -> {per_kv[-1]:.1f} ms/kvert) — "
        + ("FLAT (<= 1.5x): no superlinear path" if growth <= 1.5 else "NOT FLAT"),
        file=sys.stderr,
    )
    obj_rows = [object_scan_scaling(n) for n in (100, 300, 1000)]
    for r in obj_rows:
        print(json.dumps(r))
    v0, v1 = obj_rows[0]["veto_us_per_obj"], obj_rows[-1]["veto_us_per_obj"]
    p0, p1 = obj_rows[0]["propose_us_per_obj"], obj_rows[-1]["propose_us_per_obj"]
    print(
        f"per-object growth 100->1000: veto {v1 / max(v0, 1e-9):.2f}x, "
        f"propose {p1 / max(p0, 1e-9):.2f}x — "
        + ("FLAT (<= 2x)" if v1 <= 2 * v0 and p1 <= 2 * p0 else "NOT FLAT"),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
