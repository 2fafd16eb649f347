import numpy as np
import pytest

from khronos_tpu.changes.change_detector import RayChangeDetector, RayChangeDetectorConfig
from khronos_tpu.changes.change_state import ABSENT, PERSISTENT, UNOBSERVED, Changes, ObjectChange
from khronos_tpu.changes.detectors import (
    SequentialChangeDetector,
    SequentialChangeDetectorConfig,
)
from khronos_tpu.changes.ray_verificator import RayVerificator, RayVerificatorConfig
from khronos_tpu.changes.reconciler import Reconciler, ReconcilerConfig
from khronos_tpu.stm.scene_graph import AgentNode, KhronosObject, Mesh, SceneGraph


def make_mesh(vertices, first_s, last_s, labels=None):
    V = len(vertices)
    return Mesh(
        vertices=np.asarray(vertices, np.float32),
        colors=np.zeros((V, 3), np.float32),
        labels=np.zeros(V, np.int32) if labels is None else np.asarray(labels, np.int32),
        first_seen_ns=(np.asarray(first_s) * 1e9).astype(np.int64),
        last_seen_ns=(np.asarray(last_s) * 1e9).astype(np.int64),
        faces=np.zeros((0, 3), np.int64),
    )


def make_agents(position, stamps_s):
    return [
        AgentNode(int(s * 1e9), np.eye(3, dtype=np.float32), np.asarray(position, np.float32))
        for s in stamps_s
    ]


def make_object(nid, center, first_s, last_s, mesh_pts=None):
    c = np.asarray(center, np.float32)
    pts = np.asarray(mesh_pts, np.float32) if mesh_pts is not None else np.zeros((0, 3), np.float32)
    return KhronosObject(
        node_id=nid,
        semantic_category=2,
        bbox_min=c - 0.2,
        bbox_max=c + 0.2,
        first_observed_ns=[int(first_s * 1e9)],
        last_observed_ns=[int(last_s * 1e9)],
        mesh_vertices=pts - (c - 0.2) if len(pts) else pts,
        mesh_faces=np.zeros((0, 3), np.int64),
        mesh_colors=np.zeros((len(pts), 3), np.float32),
    )


class TestRayVerificator:
    def build_simple(self):
        """Agent at origin-ish; wall vertex at (5,0,1) observed [0,100]s."""
        dsg = SceneGraph()
        dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 2.0))
        dsg.mesh = make_mesh([[5, 0, 1]], [0.0], [100.0])
        ver = RayVerificator(RayVerificatorConfig(ray_policy="All", num_bins=32, temporal_resolution=4.0))
        ver.build(dsg)
        return ver

    def test_long_ray_full_cell_coverage(self):
        """A 20 m ray must index EVERY hash cell it traverses (fixed step =
        block/4, reference ray_verificator.cpp:327-349) — regression for the
        round-1 bug where 24 uniform samples skipped cells past ~11.5 m."""
        dsg = SceneGraph()
        dsg.agents = make_agents([0.05, 0.05, 0.05], np.arange(0, 101, 2.0))
        dsg.mesh = make_mesh([[20.0, 0.05, 0.05]], [0.0], [100.0])
        ver = RayVerificator(
            RayVerificatorConfig(ray_policy="Middle", num_bins=32, temporal_resolution=4.0)
        )
        ver.build(dsg)
        # every point along the ray axis must see the ray as a candidate:
        # in front of the wall -> absent evidence; at the wall -> match
        xs = np.arange(0.25, 19.8, 0.25, dtype=np.float32)
        pts = np.stack([xs, np.full_like(xs, 0.05), np.full_like(xs, 0.05)], axis=1)
        ev = ver.query(pts)
        assert (ev.sum(axis=(1, 2)) > 0).all(), (
            f"points with no evidence at x={xs[ev.sum(axis=(1, 2)) == 0]}"
        )
        ev_wall = ver.query(np.asarray([[20.0, 0.05, 0.05]], np.float32))
        assert ev_wall[0, :, 0].sum() > 0

    def test_incremental_update_matches_full_build(self):
        """updateDsg analog: growing the mesh between passes must give the
        same evidence through the delta index as a from-scratch build
        (reference ray_verificator.cpp:163-182)."""
        ys_master = np.linspace(-2, 2, 236)  # append-only: prefix stays put

        def make_dsg(n_verts):
            dsg = SceneGraph()
            dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 2.0))
            ys = ys_master[:n_verts]
            verts = np.stack([np.full(n_verts, 5.0), ys, np.ones(n_verts)], axis=1)
            dsg.mesh = make_mesh(verts, [0.0] * n_verts, [100.0] * n_verts)
            dsg.opt_epoch = 1
            return dsg

        # max_candidates above the densest cell: with the cap saturated the
        # split (main+delta) setup truncates per-index and can legitimately
        # return MORE evidence than one capped index
        cfg = RayVerificatorConfig(
            ray_policy="Middle", num_bins=32, temporal_resolution=4.0,
            max_candidates=1024,
        )
        inc = RayVerificator(cfg)
        inc.update(make_dsg(200), had_loop_closure=True)   # full build
        inc.update(make_dsg(220), had_loop_closure=False)  # delta (+10%)
        assert inc._delta is not None, "delta index expected"
        inc.update(make_dsg(236), had_loop_closure=False)  # extended delta
        assert inc._delta is not None
        full = RayVerificator(cfg)
        full.build(make_dsg(236))
        pts = np.asarray(
            [[3.0, 0, 1], [5.0, 1.9, 1], [5.0, -1.9, 1], [6.5, 0, 1]], np.float32
        )
        ev_i, ev_f = inc.query(pts), full.query(pts)
        # grids differ (delta reuses the 200-vertex grid; the full build
        # derives a fresh one), so borderline ray-cell assignment can shift a
        # few counts — classifications must agree, totals within 5%
        np.testing.assert_array_equal(ev_i.sum(axis=1) > 0, ev_f.sum(axis=1) > 0)
        diff = np.abs(ev_i.astype(np.int64) - ev_f.astype(np.int64)).sum()
        assert diff / max(ev_f.sum(), 1) < 0.05, (diff, ev_f.sum())
        # touched cells must cover the new vertices' rays
        touched = inc.touched_cells_for_new_targets(200)
        cells = inc.point_cells(np.asarray([[5.0, 1.9, 1]], np.float32))
        assert touched[cells[0]], "new-vertex ray cell not marked touched"
        # an LC whose solve did NOT move geometry (same epoch) keeps the
        # delta (r4: LC is advisory; the epoch is the real signal) ...
        inc.update(make_dsg(236), had_loop_closure=True)
        assert inc._delta is not None
        # ... while a geometry-epoch change forces the full rebuild
        moved = make_dsg(236)
        moved.opt_epoch = 2
        inc.update(moved, had_loop_closure=False)
        assert inc._delta is None

    def test_growth_never_forces_full_rebuild(self):
        """r5 VERDICT task 1: the world-anchored hashed index must absorb
        UNBOUNDED exploration (an outbound corridor far beyond any initial
        bbox) through delta updates + merges — zero growth-forced full
        rebuilds (the r4 endurance run hit 9/10, 30-240 s each) — while
        answering queries identically to a from-scratch build."""
        def make_dsg(n_segments):
            # corridor marching +x: segment k adds wall vertices near x=10*k
            dsg = SceneGraph()
            stamps = np.arange(0, n_segments * 10.0, 2.0)
            pos = np.stack(
                [stamps, np.zeros_like(stamps), np.ones_like(stamps)], axis=1
            )
            dsg.agents = [
                AgentNode(int(s * 1e9), np.eye(3, dtype=np.float32),
                          p.astype(np.float32))
                for p, s in zip(pos, stamps)
            ]
            verts, first, last = [], [], []
            for k in range(n_segments):
                ys = np.linspace(-2, 2, 40)
                verts.append(np.stack(
                    [np.full(40, 10.0 * k + 3.0), ys, np.ones(40)], axis=1
                ))
                first += [10.0 * k] * 40
                last += [10.0 * k + 8.0] * 40
            dsg.mesh = make_mesh(np.concatenate(verts), first, last)
            dsg.opt_epoch = 1
            return dsg

        cfg = RayVerificatorConfig(
            ray_policy="Middle", num_bins=32, temporal_resolution=4.0,
            max_candidates=1024, max_ray_length=12.0,
        )
        inc = RayVerificator(cfg)
        inc.update(make_dsg(1), had_loop_closure=True)  # initial full build
        for seg in range(2, 9):  # 80 m of exploration, far past any margin
            inc.update(make_dsg(seg), had_loop_closure=False)
        assert inc.n_full_builds == 1, "growth must never force a rebuild"
        assert inc.n_merges >= 1, "delta must have merged into the main index"
        full = RayVerificator(cfg)
        full.build(make_dsg(8))
        pts = np.asarray(
            [[3.0, 0, 1], [33.0, 1.5, 1], [73.0, -1.5, 1], [50.0, 0, 1]],
            np.float32,
        )
        np.testing.assert_array_equal(inc.query(pts), full.query(pts))

    def test_per_point_radial_tolerance(self):
        """r4 hard-scene fix: a ray passing 5 cm BESIDE a thin structure
        (within the global 0.1 m tolerance, but outside the structure's own
        half-extent) must not read phantom absence once the per-point
        tolerance is bounded by the structure's thinness."""
        dsg = SceneGraph()
        dsg.agents = make_agents([0, 0, 1], [10.0])
        # single ray to a wall point 6 m out, passing ~5 cm beside the pole
        dsg.mesh = make_mesh([[6.0, 0.06, 1.0]], [0.0], [100.0])
        ver = RayVerificator(
            RayVerificatorConfig(ray_policy="First", num_bins=32,
                                 temporal_resolution=4.0,
                                 active_window_duration=0.0)
        )
        ver.build(dsg)
        pole_pt = np.asarray([[5.0, 0.0, 1.0]], np.float32)
        ev_default = ver.query(pole_pt)  # tol 0.1: phantom absent vote
        assert ev_default[0, :, 1].sum() > 0
        ev_thin = ver.query(pole_pt, radial_tol=np.asarray([0.025], np.float32))
        assert ev_thin.sum() == 0, "thin-structure tolerance still saw the ray"

    def test_all_policy_expands_every_observer(self):
        """r4 task 4: `All` spawns one ray per (vertex, in-range observing
        pose) pair (reference ray_verificator.cpp:211-314); `SampledAll`'s
        4-observer set is a subset of it."""
        dsg = SceneGraph()
        dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 2.0))  # 51 poses
        dsg.mesh = make_mesh([[5, 0, 1], [5, 1, 1]], [0.0, 10.0], [100.0, 60.0])

        def pairs(policy, **kw):
            ver = RayVerificator(RayVerificatorConfig(ray_policy=policy, **kw))
            o, t, s, tidx = ver._generate_rays(dsg, 0)
            return {(float(si), int(vi)) for si, vi in zip(s, tidx)}

        all_pairs = pairs("All")
        sampled = pairs("SampledAll")
        # vertex 0: observed [0, 100-3]s -> poses 0..97s span; vertex 1:
        # [10, 57]s. Every in-range pose spawns exactly one ray per vertex.
        n_v0 = sum(1 for s, v in all_pairs if v == 0)
        n_v1 = sum(1 for s, v in all_pairs if v == 1)
        assert n_v0 > 40 and n_v1 > 20, (n_v0, n_v1)
        assert sampled <= all_pairs, "SampledAll not a subset of All"
        assert len(all_pairs) > len(sampled)
        # capped All: evenly strided subset, bounded per vertex
        capped = pairs("All", all_max_observers=8)
        assert capped <= all_pairs
        assert sum(1 for s, v in capped if v == 0) == 8
        # evidence sanity: the All library classifies the wall as matched
        ver = RayVerificator(
            RayVerificatorConfig(ray_policy="All", num_bins=32,
                                 temporal_resolution=4.0, max_candidates=512)
        )
        ver.build(dsg)
        ev = ver.query(np.asarray([[5.0, 0, 1], [3.0, 0, 1]], np.float32))
        assert ev[0, :, 0].sum() > 40  # dense match evidence (many observers)
        assert ev[1, :, 1].sum() > 40  # dense absent evidence in front

    def test_candidate_overflow_samples_evenly_in_time(self):
        """When a cell holds more rays than max_candidates, the query must
        sample evenly across the list (generation order tracks observation
        time) — prefix truncation silently dropped LATE evidence under the
        true `All` policy (r4 regression: persistence evidence shrank)."""
        dsg = SceneGraph()
        dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 1.0))  # 101 poses
        dsg.mesh = make_mesh([[5, 0, 1]], [0.0], [100.0])
        ver = RayVerificator(
            RayVerificatorConfig(ray_policy="All", num_bins=32,
                                 temporal_resolution=4.0, max_candidates=8)
        )
        ver.build(dsg)  # ~98 rays through the cells in front of the wall
        ev = ver.query(np.asarray([[3.0, 0, 1]], np.float32))[0]  # [B, 2]
        absent_bins = np.nonzero(ev[:, 1])[0]
        assert len(absent_bins) >= 4, absent_bins
        # evidence must cover the late end of the sequence (~97 s -> bin 24),
        # not only the first max_candidates rays (bins 0-1)
        assert absent_bins.max() >= 20, absent_bins

    def test_absent_match_occluded(self):
        ver = self.build_simple()
        ev = ver.query(np.asarray([[3.0, 0, 1], [5.0, 0, 1], [6.5, 0, 1], [3.0, 2.0, 1]], np.float32))
        # point in front of the wall: rays pass through -> absent evidence
        assert ev[0, :, 1].sum() > 0 and ev[0, :, 0].sum() == 0
        # point on the wall: match evidence
        assert ev[1, :, 0].sum() > 0 and ev[1, :, 1].sum() == 0
        # point behind the wall: occluded -> no evidence
        assert ev[2].sum() == 0
        # point far off-ray: no evidence
        assert ev[3].sum() == 0


class TestChangeScan:
    def test_windows(self):
        det = RayChangeDetector(RayChangeDetectorConfig(window_size=2, min_rays_per_window=1), bin_size_s=5.0)
        ev = np.zeros((1, 16, 2), np.int64)
        ev[0, 2, 0] = 3  # present around t=12.5
        ev[0, 8, 1] = 3  # absent around t=42.5
        ev[0, 9, 1] = 2
        res = det.scan(ev)
        assert res["first_persistent_bin"][0] <= 2 <= res["last_persistent_bin"][0] + 1
        assert 7 <= res["first_absent_bin"][0] <= 8
        # time range filter excludes early bins
        res2 = det.scan(ev, t_min_s=30.0)
        assert res2["first_persistent_bin"][0] == -1
        assert res2["first_absent_bin"][0] >= 7

    def test_order_constrained_persistence(self):
        """r4 fix: spurious matches AFTER a confident absence (grazing rays
        off nearby surfaces) must not extend last_persistent past
        first_absent — reference ObjectChange ordering (change_state.h:76-103)
        ... last_seen -> last_persistent -> last_absent; the reconciler's
        midpoint estimate depends on it."""
        det = RayChangeDetector(
            RayChangeDetectorConfig(window_size=1, min_rays_per_window=1),
            bin_size_s=5.0,
        )
        ev = np.zeros((1, 16, 2), np.int64)
        ev[0, 2, 0] = 4   # genuine presence around t=12.5
        ev[0, 8, 1] = 4   # confident absence around t=42.5
        ev[0, 12, 0] = 3  # SPURIOUS late match around t=62.5
        res = det.scan(ev)
        assert res["last_persistent_bin"][0] == 12  # unconstrained: late
        assert res["last_persistent_before_absent_bin"][0] == 2
        # appearance direction: persistence after the last absence
        ev2 = np.zeros((1, 16, 2), np.int64)
        ev2[0, 2, 0] = 3   # spurious early match
        ev2[0, 5, 1] = 4   # absence (space empty before the object arrived)
        ev2[0, 9, 0] = 4   # genuine presence after appearance
        res2 = det.scan(ev2)
        assert res2["first_persistent_bin"][0] == 2
        assert res2["first_persistent_after_absent_bin"][0] == 9


class TestSequentialChangeDetection:
    def make_disappearance_scene(self):
        """Object at (4,0,1) present [0,40]s then gone; wall behind at (5,0,1)
        observed after 45s; agent at origin the whole time."""
        dsg = SceneGraph()
        dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 2.0))
        verts = [[4.0, 0, 1], [4.0, 0.1, 1], [5.0, 0, 1], [5.0, 0.1, 1], [0.0, 3.0, 1]]
        first = [0.0, 0.0, 45.0, 45.0, 0.0]
        last = [40.0, 40.0, 100.0, 100.0, 100.0]
        dsg.mesh = make_mesh(verts, first, last)
        obj = make_object(1, [4.0, 0.05, 1], 0.0, 40.0, mesh_pts=[[4.0, 0, 1], [4.0, 0.1, 1]])
        dsg.objects[1] = obj
        return dsg

    def test_object_disappearance_detected(self):
        dsg = self.make_disappearance_scene()
        cfg = SequentialChangeDetectorConfig()
        cfg.verificator.ray_policy = "All"
        cfg.verificator.num_bins = 64
        cfg.verificator.temporal_resolution = 2.0
        cfg.detector.window_size = 4
        scd = SequentialChangeDetector(cfg)
        changes = scd.detect_changes(dsg)
        oc = changes.object_changes[1]
        assert oc.last_absent_ns > 0, "disappearance not detected"
        t_abs = oc.last_absent_ns * 1e-9
        assert 40.0 < t_abs < 100.0
        # background: old object-surface vertices flagged absent
        assert changes.background_states[0] == ABSENT
        assert changes.background_states[1] == ABSENT
        # wall vertices observed after: no absent evidence through them
        assert changes.background_states[2] != ABSENT
        assert changes.background_states[4] == UNOBSERVED

    def test_persistent_object_not_absent(self):
        dsg = SceneGraph()
        dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 2.0))
        # object surface stays in the background mesh the whole time
        verts = [[4.0, 0, 1], [4.0, 0.1, 1], [0.0, 3.0, 1]]
        dsg.mesh = make_mesh(verts, [0.0, 0.0, 0.0], [100.0, 100.0, 100.0])
        dsg.objects[1] = make_object(1, [4.0, 0.05, 1], 0.0, 40.0, mesh_pts=[[4.0, 0, 1]])
        cfg = SequentialChangeDetectorConfig()
        cfg.verificator.ray_policy = "All"
        cfg.verificator.temporal_resolution = 2.0
        scd = SequentialChangeDetector(cfg)
        changes = scd.detect_changes(dsg)
        oc = changes.object_changes[1]
        assert oc.last_absent_ns < 0
        # presence evidence after last_seen (rays still end on its surface)
        assert oc.last_persistent_ns > int(40e9)


class TestMergedEvidenceWindows:
    """Round-3 task 4: a merge survivor must inherit the absorbed twin's
    observation intervals for its scan windows — otherwise rays cast through
    the twin's occupied space read as absence and hallucinate a change."""

    def make_scene(self):
        """Wall at x=5 observed [0,100]s spawns rays through x=4 the whole
        time. Twin T (id 2) observed [0,60], survivor S (id 1) observed
        [62,100], same spot at x=4 (oversegmented same physical object)."""
        dsg = SceneGraph()
        dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 2.0))
        dsg.mesh = make_mesh([[5.0, 0, 1], [5.0, 0.1, 1]], [0.0, 0.0], [100.0, 100.0])
        pts = [[4.0, 0, 1], [4.0, 0.1, 1]]
        dsg.objects[1] = make_object(1, [4.0, 0.05, 1], 62.0, 100.0, mesh_pts=pts)
        dsg.objects[2] = make_object(2, [4.0, 0.05, 1], 0.0, 60.0, mesh_pts=pts)
        return dsg

    def _detector(self):
        cfg = SequentialChangeDetectorConfig()
        cfg.verificator.ray_policy = "All"
        cfg.verificator.temporal_resolution = 2.0
        cfg.detector.window_size = 3
        return SequentialChangeDetector(cfg)

    def test_unmerged_scene_hallucinates(self):
        """Sanity: WITHOUT the merge, the survivor's pre-first-seen window
        overlaps the twin's presence and scans as absent."""
        changes = self._detector().detect_changes(self.make_scene(), merges=None)
        assert changes.object_changes[1].first_absent_ns >= 0

    def test_merge_envelope_suppresses_hallucination(self):
        from khronos_tpu.backend.backend import MergeProposal

        merges = [MergeProposal(from_id=2, into_id=1, iou=0.9)]
        changes = self._detector().detect_changes(self.make_scene(), merges=merges)
        oc = changes.object_changes[1]
        # pre-window now ends before the merged-set's earliest first-seen (0)
        assert oc.first_absent_ns < 0, "hallucinated appearance survived merge"
        assert oc.last_absent_ns < 0, "hallucinated disappearance survived merge"
        assert changes.object_changes[2].merged_id == 1


class TestReconciler:
    def test_presence_interval_estimation(self):
        dsg = SceneGraph()
        dsg.objects[1] = make_object(1, [0, 0, 0], 50.0, 60.0)
        changes = Changes()
        changes.object_changes[1] = ObjectChange(
            node_id=1,
            first_absent_ns=int(20e9),  # absent evidence before first seen
            last_absent_ns=int(80e9),  # absent after last seen
        )
        rec = Reconciler(ReconcilerConfig(mesh_merger="none"))
        rec.reconcile(dsg, changes)
        o = dsg.objects[1]
        # appearance midpoint between 20 and 50 -> 35; disappearance (60+80)/2=70
        assert o.first_observed_ns[0] == pytest.approx(35e9, rel=0.01)
        assert o.last_observed_ns[0] == pytest.approx(70e9, rel=0.01)

    def test_no_evidence_conservative(self):
        dsg = SceneGraph()
        dsg.objects[1] = make_object(1, [0, 0, 0], 50.0, 60.0)
        rec = Reconciler(ReconcilerConfig(mesh_merger="none", time_estimates_conservative=True))
        changes = Changes()
        changes.object_changes[1] = ObjectChange(node_id=1)
        rec.reconcile(dsg, changes)
        o = dsg.objects[1]
        assert o.first_observed_ns[0] == int(50e9)
        assert o.last_observed_ns[0] == int(60e9)

    def test_merge_execution(self):
        dsg = SceneGraph()
        dsg.objects[1] = make_object(1, [0, 0, 0], 0.0, 10.0)
        dsg.objects[2] = make_object(2, [0.05, 0, 0], 30.0, 40.0)
        changes = Changes()
        from khronos_tpu.backend.backend import MergeProposal

        rec = Reconciler(ReconcilerConfig(mesh_merger="none"))
        rec.reconcile(dsg, changes, merges=[MergeProposal(from_id=2, into_id=1, iou=0.8)])
        assert 2 not in dsg.objects
        o = dsg.objects[1]
        assert o.first_observed_ns == [0, int(30e9)]
        assert o.last_observed_ns == [int(10e9), int(40e9)]

    def test_change_merger_removes_absent_vertices(self):
        dsg = SceneGraph()
        dsg.mesh = make_mesh([[0, 0, 0], [1, 0, 0], [2, 0, 0]], [0, 0, 0], [10, 10, 10])
        dsg.mesh.faces = np.asarray([[0, 1, 2]], np.int64)
        changes = Changes()
        changes.background_states = np.asarray([UNOBSERVED, ABSENT, UNOBSERVED], np.int8)
        rec = Reconciler(ReconcilerConfig(mesh_merger="ChangeMerger", object_proximity_threshold=0))
        rec.reconcile(dsg, changes)
        assert dsg.mesh.num_vertices == 2
        assert dsg.mesh.num_faces == 0  # face lost its middle vertex


class TestSpatioTemporalMap:
    def make_map(self):
        from khronos_tpu.stm.spatio_temporal_map import SpatioTemporalMap

        stm = SpatioTemporalMap()
        for t in (10.0, 20.0):
            dsg = SceneGraph()
            n = int(t)
            verts = [[i * 0.1, 0, 0] for i in range(n)]
            first = list(np.linspace(0, t - 1, n))
            dsg.mesh = make_mesh(verts, first, [t] * n)
            dsg.agents = make_agents([0, 0, 0], np.arange(0, t, 1.0))
            if t >= 20:
                dsg.objects[1] = make_object(1, [1, 1, 0], 12.0, 18.0)
            stm.update(dsg, int(t * 1e9))
        return stm

    def test_query_prefix_and_objects(self):
        stm = self.make_map()
        dsg = stm.get_dsg(int(15e9))
        # snapshot at 10 chosen; all its vertices first_seen <= 9 < 15
        assert dsg.mesh.num_vertices == 10
        assert len(dsg.objects) == 0
        dsg2 = stm.get_dsg(int(25e9))
        assert dsg2.mesh.num_vertices == 20
        assert 1 in dsg2.objects
        # robot_time before object known
        dsg3 = stm.get_dsg(int(20e9), query_time_ns=int(5e9))
        assert 1 in dsg3.objects  # known at t=20 (first_observed 12 <= 20)
        present = stm.objects_present_at(int(20e9), int(5e9))
        assert 1 not in present  # but not present at query time 5

    def test_knowledge_gate_uses_detection_time(self):
        """An object presumed present since 0 after optimistic reconciliation
        must NOT appear at robot times before the robot first saw it
        (reference spatio_temporal_map.cpp:244-293 keys on first-observed)."""
        from khronos_tpu.stm.spatio_temporal_map import SpatioTemporalMap
        from khronos_tpu.utils.intervals import is_present

        stm = SpatioTemporalMap()
        dsg = SceneGraph()
        dsg.mesh = make_mesh([[0, 0, 0]], [0.0], [20.0])
        dsg.agents = make_agents([0, 0, 0], np.arange(0, 20, 1.0))
        obj = make_object(1, [1, 1, 0], 12.0, 18.0)
        # optimistic reconciliation: presumed present since 0, seen at 12
        obj.first_detected_ns = int(12e9)
        obj.first_observed_ns = [0]
        obj.last_observed_ns = [1 << 62]
        dsg.objects[1] = obj
        stm.update(dsg, int(20e9))
        # robot at t=5 had never seen the object -> not in the known DSG
        assert 1 not in stm.get_dsg(int(5e9)).objects
        # robot at t=15 knows it; querying the past shows it present (interval)
        dsg15 = stm.get_dsg(int(15e9))
        assert 1 in dsg15.objects
        o = dsg15.objects[1]
        assert is_present(o.first_observed_ns, o.last_observed_ns, int(5e9))

    def test_prefix_ordering_within_snapshot(self):
        stm = self.make_map()
        dsg = stm.get_dsg(int(14e9))
        # vertices with first_seen <= 14 only
        assert (dsg.mesh.first_seen_ns <= int(14e9)).all()

    def test_prefix_shared_storage(self, tmp_path):
        """Round-3 task 8: append-only snapshot growth stores only the mesh
        delta (base-chain), a prefix break (removal) stores a full chunk, and
        the v2 archive round-trips."""
        from khronos_tpu.stm.spatio_temporal_map import SpatioTemporalMap

        stm = SpatioTemporalMap()

        def make(n, drop_first=False):
            dsg = SceneGraph()
            verts = [[i * 0.1, 0, 0] for i in range(n)]
            first = [float(i) for i in range(n)]
            last = [100.0] * n
            if drop_first:
                verts, first, last = verts[1:], first[1:], last[1:]
            dsg.mesh = make_mesh(verts, first, last)
            dsg.agents = make_agents([0, 0, 0], np.arange(0, n, 1.0))
            return dsg

        stm.update(make(10), int(10e9))
        stm.update(make(14), int(20e9))  # append-only: extends the union
        stm.update(make(18), int(30e9))
        assert len(stm._unions) == 1, "append-only growth shares one union"
        assert stm._unions[0].num_vertices == 18
        # materialization rebuilds the full mesh from the union
        assert stm.snapshots[2].mesh.num_vertices == 18
        np.testing.assert_allclose(
            stm.snapshots[2].mesh.vertices[:10], stm.snapshots[0].mesh.vertices
        )
        # a removal delta-shares via the keep mask when the CANONICAL
        # (pre-reconciliation, accumulator-order) mesh is supplied, as the
        # pipeline does ...
        stm.update(
            make(18, drop_first=True), int(40e9), canonical_mesh=make(18).mesh
        )
        assert len(stm._unions) == 1
        assert stm._stores[3]["keep"].sum() == 17
        assert stm.snapshots[3].mesh.num_vertices == 17
        # ... and a REAPPEARING removed vertex still shares (the r5 failure
        # mode: reconciliation-removed rows reappear from the accumulator
        # and used to break the prefix against the previous RECONCILED mesh,
        # forcing a ~full store every pass)
        stm.update(make(18), int(50e9))
        assert len(stm._unions) == 1, "reappearance must not fork the union"
        assert stm._stores[4]["keep"].all()
        assert stm.snapshots[4].mesh.num_vertices == 18
        # older snapshots keep their as-of values after later updates
        assert stm.snapshots[3].mesh.num_vertices == 17
        # value mutation rewind: a later update that extends last_seen (and
        # recolors) must not leak into older snapshots' materializations
        mutated = make(18)
        mutated.mesh.last_seen_ns = np.full(18, int(200e9), np.int64)
        mutated.mesh.colors = mutated.mesh.colors + 0.25
        stm.update(mutated, int(60e9))
        assert len(stm._unions) == 1
        assert int(stm.snapshots[5].mesh.last_seen_ns[0]) == int(200e9)
        old = stm.snapshots[4].mesh
        assert int(old.last_seen_ns[0]) == int(100e9), "rev diff must rewind"
        assert not np.allclose(
            stm.snapshots[5].mesh.colors[0], old.colors[0]
        ), "older snapshot must keep as-of colors"
        # round-trip (v4 archive)
        path = str(tmp_path / "m.4dmap.npz")
        stm.save(path)
        stm2 = SpatioTemporalMap.load(path)
        assert len(stm2._unions) == 1
        for i in range(5):
            np.testing.assert_allclose(
                stm2.snapshots[i].mesh.vertices, stm.snapshots[i].mesh.vertices
            )
        d = stm2.get_dsg(int(35e9))
        assert d.mesh.num_vertices == 18

    def test_save_load_roundtrip(self, tmp_path):
        from khronos_tpu.stm.spatio_temporal_map import SpatioTemporalMap

        stm = self.make_map()
        path = str(tmp_path / "final.4dmap.npz")
        stm.save(path)
        stm2 = SpatioTemporalMap.load(path)
        assert stm2.stamps() == stm.stamps()
        d1 = stm.get_dsg(int(25e9))
        d2 = stm2.get_dsg(int(25e9))
        np.testing.assert_allclose(d1.mesh.vertices, d2.mesh.vertices)
        assert set(d1.objects) == set(d2.objects)


class TestChangesCSV:
    def test_save_load(self, tmp_path):
        ch = Changes()
        ch.object_changes[3] = ObjectChange(3, first_absent_ns=5, last_absent_ns=9, merged_id=7)
        ch.background_states = np.asarray([0, 1, 2], np.int8)
        ch.save(str(tmp_path))
        ch2 = Changes.load(str(tmp_path))
        assert ch2.object_changes[3].last_absent_ns == 9
        assert ch2.object_changes[3].merged_id == 7
        np.testing.assert_array_equal(ch2.background_states, [0, 1, 2])


class TestNativeMeshAccumulator:
    def test_parity_with_python(self):
        import numpy as np
        from khronos_tpu.native import available, make_mesh_accumulator
        from khronos_tpu.stm.scene_graph import MeshAccumulator

        if not available():
            import pytest

            pytest.skip("native library unavailable")
        rng = np.random.default_rng(3)
        T = 500
        verts = (rng.random((T, 3, 3)) * 2).astype(np.float32)
        cols = rng.random((T, 3, 3)).astype(np.float32)
        first = rng.integers(0, 100, (T, 3)).astype(np.int64)
        last = first + rng.integers(0, 50, (T, 3)).astype(np.int64)
        labels = rng.integers(0, 5, (T, 3)).astype(np.int32)
        py = MeshAccumulator(0.05)
        nat = make_mesh_accumulator(0.05)
        py.add_triangles(verts, cols, first, last, labels)
        nat.add_triangles(verts, cols, first, last, labels)
        mp, mn = py.build(), nat.build()
        assert mp.num_vertices == mn.num_vertices
        assert mp.num_faces == mn.num_faces
        # same dedup -> same stamp merging (order may differ; compare sorted)
        np.testing.assert_allclose(
            np.sort(mp.first_seen_ns), np.sort(mn.first_seen_ns)
        )


class TestIncrementalBackground:
    def test_incremental_matches_full(self):
        """Second pass with appended vertices (same opt epoch, no LC) must
        produce the same states as a fresh full recompute, while querying
        only the new + re-observed subset."""
        from khronos_tpu.changes.detectors import (
            SequentialChangeDetector,
            SequentialChangeDetectorConfig,
        )

        def build_dsg(n_extra):
            dsg = SceneGraph()
            dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 2.0))
            verts = [[4.0, 0, 1], [4.0, 0.1, 1], [5.0, 0, 1], [0.0, 3.0, 1]]
            first = [0.0, 0.0, 45.0, 0.0]
            last = [40.0, 40.0, 100.0, 100.0]
            for k in range(n_extra):  # appended later-mapped wall vertices
                verts.append([5.0, 0.2 + 0.1 * k, 1.0])
                first.append(50.0)
                last.append(100.0)
            dsg.mesh = make_mesh(verts, first, last)
            dsg.opt_epoch = 0
            return dsg

        cfg = SequentialChangeDetectorConfig()
        cfg.verificator.ray_policy = "All"
        cfg.verificator.temporal_resolution = 2.0
        cfg.detect_object_changes = False

        inc = SequentialChangeDetector(cfg)
        inc.detect_changes(build_dsg(0), had_loop_closure=False)
        states_inc = inc.detect_changes(
            build_dsg(3), had_loop_closure=False
        ).background_states.copy()

        full = SequentialChangeDetector(cfg)
        states_full = full.detect_changes(
            build_dsg(3), had_loop_closure=False
        ).background_states.copy()
        np.testing.assert_array_equal(states_inc, states_full)

    def test_incremental_objects_match_full(self):
        """Round-3 task 9: objects whose hash cells gained no new rays keep
        their previous ObjectChange without a re-query; results must match a
        full pass (reference updateDsg re-observed-object reporting,
        ray_verificator.cpp:163-182)."""
        from khronos_tpu.changes.detectors import (
            SequentialChangeDetector,
            SequentialChangeDetectorConfig,
        )

        def build_dsg(n_extra):
            dsg = SceneGraph()
            dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 2.0))
            verts = [[4.0, 0, 1], [4.0, 0.1, 1], [5.0, 0, 1], [0.0, 3.0, 1]]
            first = [0.0, 0.0, 45.0, 0.0]
            last = [40.0, 40.0, 100.0, 100.0]
            for k in range(n_extra):  # appended wall vertices BEHIND object
                # A: their rays pass through A's cells (A must rescan), far
                # from object B (B must be skipped)
                verts.append([6.0, 0.1 * k, 1.0])
                first.append(50.0)
                last.append(100.0)
            dsg.mesh = make_mesh(verts, first, last)
            dsg.opt_epoch = 0
            # A: disappearing object at x=4; B: far object, untouched by the
            # appended vertices' rays
            dsg.objects[1] = make_object(
                1, [4.0, 0.05, 1], 0.0, 40.0, mesh_pts=[[4.0, 0, 1], [4.0, 0.1, 1]]
            )
            dsg.objects[2] = make_object(
                2, [-2.0, -2.0, 1], 0.0, 100.0, mesh_pts=[[-2.0, -2.0, 1]]
            )
            return dsg

        cfg = SequentialChangeDetectorConfig()
        cfg.verificator.ray_policy = "All"
        cfg.verificator.temporal_resolution = 2.0

        inc = SequentialChangeDetector(cfg)
        inc.detect_changes(build_dsg(0), had_loop_closure=False)

        # count queried points on the second (incremental) pass
        calls = []
        orig_query = inc.verificator.query
        inc.verificator.query = lambda pts, **kw: (calls.append(len(pts)), orig_query(pts, **kw))[1]
        ch_inc = inc.detect_changes(build_dsg(3), had_loop_closure=False)

        full = SequentialChangeDetector(cfg)
        ch_full = full.detect_changes(build_dsg(3), had_loop_closure=False)
        for nid in (1, 2):
            a = ch_inc.object_changes.get(nid) or ObjectChange(nid)
            b = ch_full.object_changes.get(nid) or ObjectChange(nid)
            assert (a.first_absent_ns, a.last_absent_ns) == (
                b.first_absent_ns, b.last_absent_ns), nid
        np.testing.assert_array_equal(
            ch_inc.background_states, ch_full.background_states
        )
        # first query of the incremental pass is the OBJECT pass: touched
        # object A re-queried (2 points), far object B skipped (else 3)
        assert len(calls) == 2, calls  # object pass + background pass
        assert calls[0] == 2, calls

    def test_epoch_change_forces_full(self):
        from khronos_tpu.changes.detectors import (
            SequentialChangeDetector,
            SequentialChangeDetectorConfig,
        )

        cfg = SequentialChangeDetectorConfig()
        cfg.verificator.ray_policy = "All"
        cfg.verificator.temporal_resolution = 2.0
        cfg.detect_object_changes = False
        scd = SequentialChangeDetector(cfg)
        dsg = SceneGraph()
        dsg.agents = make_agents([0, 0, 1], np.arange(0, 101, 2.0))
        dsg.mesh = make_mesh([[4.0, 0, 1], [0, 3, 1]], [0.0, 0.0], [40.0, 100.0])
        dsg.opt_epoch = 0
        scd.detect_changes(dsg, had_loop_closure=False)
        # vertex moved by an optimization: epoch changes, cache must not
        # survive even though the vertex count is unchanged
        dsg.mesh.vertices = dsg.mesh.vertices + np.float32([0.5, 0, 0])
        dsg.opt_epoch = 1
        st = scd.detect_changes(dsg, had_loop_closure=False).background_states
        assert len(st) == 2


class TestTwinPresenceVeto:
    """Identity-split veto: absent verdicts contradicted by a same-class,
    spatially coincident twin observed during the claimed absence are
    suppressed (unmerged fragment/whole re-extraction pairs), mirroring the
    reference's merge-record presence semantics (reconciler.cpp:250-318)."""

    def _detector(self):
        from khronos_tpu.changes.detectors import (
            SequentialChangeDetector,
            SequentialChangeDetectorConfig,
        )

        return SequentialChangeDetector(SequentialChangeDetectorConfig())

    def _obj(self, nid, lo, hi, cls=3):
        o = lambda: None  # noqa: E731 - attribute bag
        o.node_id = nid
        o.semantic_category = cls
        return o

    def test_disappearance_vetoed_by_coincident_twin(self):
        det = self._detector()
        cfg = det.config.objects
        whole = self._obj(1, 0, 0)
        frag = self._obj(2, 0, 0)
        # fragment contained in the whole's bbox
        obj_pts = {
            1: np.array([[0, 0, 0], [1, 1, 1]], np.float32),
            2: np.array([[0.2, 0.2, 0.2], [0.8, 0.8, 0.8]], np.float32),
        }
        # whole seen 0-10 s; fragment (re-extraction) seen 20-24 s
        env = {1: (0, int(10e9)), 2: (int(20e9), int(24e9))}
        # the whole is claimed absent from t=21 s on (rays through its
        # never-reseen extent) -- but the fragment is observed then
        oc = ObjectChange(1)
        oc.last_absent_ns = int(21e9)
        det._veto_identity_splits(whole, oc, [whole, frag], env, obj_pts, cfg)
        assert oc.last_absent_ns == -1
        # and the fragment's pre-window "appeared at 20 s" is vetoed by the
        # whole's earlier presence
        oc2 = ObjectChange(2)
        oc2.first_absent_ns = int(9e9)
        det._veto_identity_splits(frag, oc2, [whole, frag], env, obj_pts, cfg)
        assert oc2.first_absent_ns == -1

    def test_true_removal_not_vetoed(self):
        det = self._detector()
        cfg = det.config.objects
        chair = self._obj(1, 0, 0)
        other_chair = self._obj(2, 0, 0)  # same class, DIFFERENT place
        distinct = self._obj(3, 0, 0, cls=5)  # same place, different class
        obj_pts = {
            1: np.array([[0, 0, 0], [1, 1, 1]], np.float32),
            2: np.array([[5, 5, 0], [6, 6, 1]], np.float32),
            3: np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]], np.float32),
        }
        env = {1: (0, int(10e9)), 2: (0, int(24e9)), 3: (int(20e9), int(24e9))}
        oc = ObjectChange(1)
        oc.last_absent_ns = int(15e9)
        det._veto_identity_splits(chair, oc, [chair, other_chair, distinct], env, obj_pts, cfg)
        assert oc.last_absent_ns == int(15e9), (
            "removal vetoed by a non-coincident or different-class object"
        )

    def test_twin_observed_only_before_absence_does_not_veto(self):
        det = self._detector()
        cfg = det.config.objects
        a = self._obj(1, 0, 0)
        b = self._obj(2, 0, 0)
        obj_pts = {
            1: np.array([[0, 0, 0], [1, 1, 1]], np.float32),
            2: np.array([[0.2, 0.2, 0.2], [0.8, 0.8, 0.8]], np.float32),
        }
        # both twins last observed by 10 s; absence claimed from 20 s: the
        # twin cannot account for the missing surface
        env = {1: (0, int(10e9)), 2: (0, int(9e9))}
        oc = ObjectChange(1)
        oc.last_absent_ns = int(20e9)
        det._veto_identity_splits(a, oc, [a, b], env, obj_pts, cfg)
        assert oc.last_absent_ns == int(20e9)

    def test_stale_twin_does_not_veto_later_appearance(self):
        """r4 advisor fix: a twin removed long BEFORE the absence evidence
        carries no information about the space at that time — a genuine
        later appearance must survive (twin 0-2 s, absence verified at 9 s,
        new object appears at 20 s)."""
        det = self._detector()
        cfg = det.config.objects
        new = self._obj(1, 0, 0)
        old = self._obj(2, 0, 0)
        obj_pts = {
            1: np.array([[0, 0, 0], [1, 1, 1]], np.float32),
            2: np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]], np.float32),
        }
        env = {1: (int(20e9), int(24e9)), 2: (0, int(2e9))}
        oc = ObjectChange(1)
        oc.first_absent_ns = int(9e9)
        det._veto_identity_splits(new, oc, [new, old], env, obj_pts, cfg)
        assert oc.first_absent_ns == int(9e9), "appearance suppressed by a stale twin"

    def test_replacement_appearance_not_suppressed(self):
        """r4 advisor fix: old object removed at ~11 s, same-class new object
        placed in the same spot at 20 s. The new object's APPEARANCE is
        genuine and must survive (the old twin was gone by the absence
        evidence at 18 s). The old object's removal verdict is suppressed by
        the later twin — a disappearance claim covers [T, inf), and the
        same-spot same-class pair is exactly what the merge machinery would
        union (inherent surface-level ambiguity, mirrored from the
        reference's merge semantics)."""
        det = self._detector()
        cfg = det.config.objects
        old = self._obj(1, 0, 0)
        new = self._obj(2, 0, 0)
        obj_pts = {
            1: np.array([[0, 0, 0], [1, 1, 1]], np.float32),
            2: np.array([[0.05, 0.05, 0.05], [0.95, 0.95, 0.95]], np.float32),
        }
        env = {1: (0, int(10e9)), 2: (int(20e9), int(24e9))}
        # appearance: space verified absent at 18 s (after the old was gone)
        oc2 = ObjectChange(2)
        oc2.first_absent_ns = int(18e9)
        det._veto_identity_splits(new, oc2, [old, new], env, obj_pts, cfg)
        assert oc2.first_absent_ns == int(18e9), "real appearance vetoed by a replacement"

    def test_reextraction_twin_vetoes_phantom_disappearance(self):
        """A disappearance claim covers [T, inf): a coincident twin observed
        only at revisit time (AFTER the phantom absence bin) still
        contradicts it — the fragment case that fails the merge-IoU gate
        (office e2e obj-2 regression)."""
        det = self._detector()
        cfg = det.config.objects
        frag = self._obj(1, 0, 0)
        revisit = self._obj(2, 0, 0)
        obj_pts = {
            1: np.array([[0, 0, 0], [1, 1, 1]], np.float32),
            2: np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]], np.float32),
        }
        # fragment seen 0-1 s; phantom absence at 7 s; surface re-extracted
        # as a new identity only at 11-13 s
        env = {1: (0, int(1e9)), 2: (int(11e9), int(13e9))}
        oc = ObjectChange(1)
        oc.last_absent_ns = int(7e9)
        det._veto_identity_splits(frag, oc, [frag, revisit], env, obj_pts, cfg)
        assert oc.last_absent_ns == -1, "phantom disappearance not vetoed"

    def test_adjacent_neighbor_below_overlap_threshold_not_a_twin(self):
        """r4 advisor fix: the overlap gate was raised 0.3 -> 0.5, so an
        adjacent same-class neighbor (moderate bbox overlap, genuinely a
        distinct object) no longer reads as an identity twin — a real
        removal next to a surviving neighbor is reported."""
        det = self._detector()
        cfg = det.config.objects
        a = self._obj(1, 0, 0)
        b = self._obj(2, 0, 0)
        obj_pts = {
            1: np.array([[0, 0, 0], [1, 1, 1]], np.float32),
            # 40% overlap of the smaller box: over the old 0.3 gate, under 0.5
            2: np.array([[0.6, 0, 0], [1.6, 1, 1]], np.float32),
        }
        env = {1: (0, int(10e9)), 2: (0, int(30e9))}
        oc = ObjectChange(1)
        oc.last_absent_ns = int(15e9)
        det._veto_identity_splits(a, oc, [a, b], env, obj_pts, cfg)
        assert oc.last_absent_ns == int(15e9), "removal vetoed by an adjacent neighbor"
