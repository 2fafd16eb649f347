import dataclasses

import numpy as np
import pytest

from khronos_tpu.active_window.active_window import ActiveWindowOutput
from khronos_tpu.backend.backend import Backend, BackendConfig
from khronos_tpu.backend.loop_closure import (
    DescriptorLoopClosureConfig,
    GtLoopClosureConfig,
)
from khronos_tpu.config import build
from khronos_tpu.stm.scene_graph import KhronosObject
from khronos_tpu.stm import serialization


def rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def make_orbit(n, radius=3.0, loops=1.2):
    """GT poses + drifted odometry poses."""
    rng = np.random.default_rng(0)
    gt, odom = [], []
    drift = np.zeros(3)
    for k in range(n):
        a = 2 * np.pi * loops * k / n
        R = rot_z(a)
        t = np.array([radius * np.cos(a), radius * np.sin(a), 1.2], np.float32)
        gt.append((R, t.copy()))
        drift = drift + rng.normal(0, 0.01, 3) + np.array([0.004, 0.002, 0])
        odom.append((R, (t + drift).astype(np.float32)))
    return gt, odom


def wall_triangles(odo_pose, gt_pose, stamp_ns, n_tri=24, seed=0):
    """Triangles on a wall ring (world frame), recorded in the odometry frame."""
    rng = np.random.default_rng(seed + stamp_ns % 1000)
    R_g, t_g = gt_pose
    R_o, t_o = odo_pose
    pts = []
    for _ in range(n_tri):
        ang = rng.uniform(0, 2 * np.pi)
        base = np.array([5.0 * np.cos(ang), 5.0 * np.sin(ang), rng.uniform(0.2, 2.2)])
        tri = base + rng.normal(0, 0.03, (3, 3))
        pts.append(tri)
    world = np.asarray(pts, np.float32)  # [T,3,3]
    # world -> body(gt) -> world(odom drifted)
    flat = world.reshape(-1, 3)
    body = (flat - t_g) @ R_g  # R_g^T applied
    odo = body @ R_o.T + t_o
    return odo.reshape(-1, 3, 3).astype(np.float32)


def make_output(stamp_ns, odo_pose, gt_pose, with_mesh=True, objects=()):
    tris = wall_triangles(odo_pose, gt_pose, stamp_ns) if with_mesh else np.zeros((0, 3, 3), np.float32)
    T = len(tris)
    return ActiveWindowOutput(
        stamp_ns=stamp_ns,
        R_w_b=odo_pose[0],
        t_w_b=odo_pose[1],
        mesh_vertices=tris,
        mesh_colors=np.full((T, 3, 3), 0.5, np.float32),
        mesh_first_ns=np.full((T, 3), stamp_ns, np.int64),
        mesh_last_ns=np.full((T, 3), stamp_ns, np.int64),
        mesh_labels=np.zeros((T, 3), np.int32),
        objects=list(objects),
    )


def mesh_error_vs_wall(verts):
    """Mean abs radial error vs the r=5 wall ring."""
    r = np.linalg.norm(verts[:, :2], axis=1)
    return float(np.abs(r - 5.0).mean())


class TestBackend:
    def test_loop_closure_improves_map(self):
        n = 40
        gt, odom = make_orbit(n)
        cfg = build(BackendConfig, {
            "lcd": {"type": "GtLoopClosure", "min_time_gap": 5.0, "max_distance": 1.0},
            "sigma_odom_trans": 0.02,
        })
        be = Backend(cfg)
        for k in range(n):
            stamp = int(k * 4e8)  # 0.4 s cadence
            out = make_output(stamp, odom[k], gt[k])
            be.add_output(out, gt_pose=gt[k])
        assert len(be.loop_closures) >= 1, "GT LCD never fired"
        assert be.num_optimizations >= 1

        dsg = be.get_dsg()
        assert dsg.mesh.num_vertices > 100
        # raw (odometry-frame) mesh error vs corrected
        raw = be.mesh_acc.build()
        err_raw = mesh_error_vs_wall(raw.vertices)
        err_opt = mesh_error_vs_wall(dsg.mesh.vertices)
        assert err_opt < err_raw, f"{err_raw} -> {err_opt}"
        # agent trajectory closer to GT
        gt_t = np.stack([t for _, t in gt])
        odo_t = np.stack([t for _, t in odom])
        est_t = np.stack([a.t_w_b for a in dsg.agents])
        ate_odo = np.linalg.norm(odo_t - gt_t, axis=1).mean()
        ate_est = np.linalg.norm(est_t - gt_t, axis=1).mean()
        assert ate_est < ate_odo

    def test_objects_move_with_correction(self):
        n = 30
        gt, odom = make_orbit(n)
        cfg = build(BackendConfig, {"lcd": {"type": "GtLoopClosure", "min_time_gap": 4.0}})
        be = Backend(cfg)
        obj_stamp = int(10 * 4e8)
        for k in range(n):
            stamp = int(k * 4e8)
            objects = []
            if k == 10:
                # object at known world position, recorded in odom frame
                world_pos = np.array([4.0, 0.0, 0.5], np.float32)
                R_g, t_g = gt[k]
                R_o, t_o = odom[k]
                odo_pos = R_o @ (R_g.T @ (world_pos - t_g)) + t_o
                objects.append(KhronosObject(
                    node_id=0, semantic_category=2,
                    bbox_min=odo_pos - 0.2, bbox_max=odo_pos + 0.2,
                    first_observed_ns=[stamp], last_observed_ns=[stamp + int(1e9)],
                    mesh_vertices=np.zeros((0, 3), np.float32),
                    mesh_faces=np.zeros((0, 3), np.int64),
                    mesh_colors=np.zeros((0, 3), np.float32),
                ))
            be.add_output(make_output(stamp, odom[k], gt[k], with_mesh=(k % 3 == 0), objects=objects), gt_pose=gt[k])
        be.finish_processing()
        dsg = be.get_dsg()
        assert len(dsg.objects) == 1
        obj = next(iter(dsg.objects.values()))
        center = 0.5 * (obj.bbox_min + obj.bbox_max)
        err_raw = np.linalg.norm((odom[10][1] - gt[10][1]))
        err_obj = np.linalg.norm(center - [4.0, 0.0, 0.5])
        assert err_obj < max(err_raw, 0.05) + 0.05

    def test_merge_proposals_for_disjoint_same_label(self):
        cfg = build(BackendConfig, {"lcd": None, "merge_min_iou": 0.2})
        be = Backend(cfg)

        def obj(nid, t0_s, t1_s, center):
            c = np.asarray(center, np.float32)
            return KhronosObject(
                node_id=nid, semantic_category=3,
                bbox_min=c - 0.3, bbox_max=c + 0.3,
                first_observed_ns=[int(t0_s * 1e9)], last_observed_ns=[int(t1_s * 1e9)],
                mesh_vertices=np.zeros((0, 3), np.float32),
                mesh_faces=np.zeros((0, 3), np.int64),
                mesh_colors=np.zeros((0, 3), np.float32),
            )

        gt, odom = make_orbit(4)
        be.add_output(make_output(0, odom[0], gt[0], with_mesh=False,
                                  objects=[obj(0, 0, 5, [1, 1, 0.3])]), gt_pose=gt[0])
        be.add_output(make_output(int(8e9), odom[1], gt[1], with_mesh=False,
                                  objects=[obj(0, 10, 15, [1.05, 1.0, 0.3])]), gt_pose=gt[1])
        # co-visible pair (overlapping presence) must NOT be proposed
        be.add_output(make_output(int(9e9), odom[2], gt[2], with_mesh=False,
                                  objects=[obj(0, 12, 20, [1.0, 1.05, 0.3])]), gt_pose=gt[2])
        be.optimize()
        pairs = {(p.from_id, p.into_id) for p in be.proposed_merges}
        assert (2, 1) in pairs
        assert not any(3 in p for p in pairs if isinstance(p, tuple) and (3 in p and 2 in p))

    def test_merge_validation_via_gnc(self, tmp_path):
        """add_merge_factor end-to-end: a re-seen object's merge proposal is
        validated by GNC (inlier identity factor); two DISTINCT same-label
        objects whose drift-corrupted odometry bboxes coincide are proposed
        pre-loop-closure but INVALIDATED once the optimized graph pulls their
        anchors apart (reference backend.h:149-155 proposed-merge factors;
        ray_object_change_detector.cpp:104-115 adopt-validated-merge)."""
        import csv

        cfg = build(BackendConfig, {
            "lcd": None, "merge_min_iou": 0.3, "add_merge_factor": True,
            "sigma_odom_trans": 0.05,
        })
        be = Backend(cfg)
        eye = np.eye(3, dtype=np.float32)

        def kf(k):
            truth = np.asarray([0.5 * k, 0.0, 0.0], np.float32)
            odo = truth + np.asarray([0.0, 0.1 * k, 0.0], np.float32)  # y drift
            return (eye, truth), (eye, odo)

        def obj(nid_unused, k, true_pos, t0_s, t1_s):
            # recorded in the DRIFTED odometry frame (R = I everywhere)
            c = np.asarray(true_pos, np.float32) + np.asarray([0, 0.1 * k, 0], np.float32)
            return KhronosObject(
                node_id=0, semantic_category=3,
                bbox_min=c - 0.3, bbox_max=c + 0.3,
                first_observed_ns=[int(t0_s * 1e9)], last_observed_ns=[int(t1_s * 1e9)],
                mesh_vertices=np.zeros((0, 3), np.float32),
                mesh_faces=np.zeros((0, 3), np.int64),
                mesh_colors=np.zeros((0, 3), np.float32),
            )

        # visit 1: chair-1 at (2,1), chair-2 at (6,1); later a DISTINCT
        # chair-3 at (6,0) lands exactly on chair-2's odometry position
        for k in range(16):
            gt_p, odo_p = kf(k)
            objects = []
            if k == 2:
                objects = [obj(0, k, [2, 1, 0.3], 2, 3)]      # -> id 1 (chair-1)
            elif k == 5:
                objects = [obj(0, k, [6, 1, 0.3], 5, 6)]      # -> id 2 (chair-2)
            elif k == 15:
                objects = [obj(0, k, [6, 0, 0.3], 15, 16)]    # -> id 3 (chair-3)
            be.add_output(make_output(int(k * 1e9), odo_p, gt_p, with_mesh=False,
                                      objects=objects))
        # periodic merge-proposal pass BEFORE any loop closure: drifted
        # geometry makes chair-2/chair-3 coincide -> proposal + merge factor
        be.optimize()
        pairs = {(p.from_id, p.into_id): p for p in be.proposed_merges}
        assert (3, 2) in pairs and not pairs[(3, 2)].validated

        # loop closure with the TRUE relative pose corrects the drift
        from khronos_tpu.backend.loop_closure import LoopClosure
        be.add_loop_closure(LoopClosure(
            from_key=be.agent_keys[15], to_key=be.agent_keys[0],
            R=eye, t=np.asarray([-7.5, 0, 0], np.float32),
        ))
        pairs = {(p.from_id, p.into_id): p for p in be.proposed_merges}
        assert pairs[(3, 2)].validated and not pairs[(3, 2)].is_valid, (
            "distinct objects' merge must be invalidated by the graph"
        )

        # visit 2: chair-1 re-seen (new track id); a second loop closure near
        # the re-observation corrects the tail of the trajectory
        for k in range(16, 21):
            gt_p, odo_p = kf(k)
            objects = [obj(0, k, [2, 1, 0.3], 18, 19)] if k == 18 else []
            be.add_output(make_output(int(k * 1e9), odo_p, gt_p, with_mesh=False,
                                      objects=objects))
        be.add_loop_closure(LoopClosure(
            from_key=be.agent_keys[20], to_key=be.agent_keys[0],
            R=eye, t=np.asarray([-10.0, 0, 0], np.float32),
        ))  # optimize inside proposes chair-1 pair on corrected geometry
        pairs = {(p.from_id, p.into_id): p for p in be.proposed_merges}
        assert (4, 1) in pairs
        be.optimize()  # judges the new factor
        pairs = {(p.from_id, p.into_id): p for p in be.proposed_merges}
        assert pairs[(4, 1)].validated and pairs[(4, 1)].is_valid
        assert pairs[(3, 2)].validated and not pairs[(3, 2)].is_valid
        valid = {(p.from_id, p.into_id) for p in be.validated_merges()}
        assert valid == {(4, 1)}

        # CSV records both outcomes
        be.save(str(tmp_path))
        with open(tmp_path / "proposed_merges.csv") as fh:
            rows = {(int(r["from_id"]), int(r["into_id"])): r for r in csv.DictReader(fh)}
        assert rows[(3, 2)]["is_valid"] == "0" and rows[(3, 2)]["validated"] == "1"
        assert rows[(4, 1)]["is_valid"] == "1" and rows[(4, 1)]["validated"] == "1"

        # reconciler executes ONLY the validated merge; detector adopts it
        from khronos_tpu.changes.change_state import Changes
        from khronos_tpu.changes.detectors import (
            SequentialChangeDetector, SequentialChangeDetectorConfig,
        )
        from khronos_tpu.changes.reconciler import Reconciler, ReconcilerConfig

        dsg = be.get_dsg()
        det = SequentialChangeDetector(SequentialChangeDetectorConfig())
        changes = det.detect_changes(dsg, True, be.validated_merges())
        assert changes.object_changes[4].merged_id == 1
        rec = Reconciler(ReconcilerConfig(mesh_merger="none"))
        rec.reconcile(dsg, changes, be.validated_merges())
        assert set(dsg.objects) == {1, 2, 3}, "4 merged into 1; 2,3 distinct"

    def test_save_roundtrip(self, tmp_path):
        gt, odom = make_orbit(10)
        cfg = build(BackendConfig, {"lcd": None})
        be = Backend(cfg)
        for k in range(10):
            be.add_output(make_output(int(k * 4e8), odom[k], gt[k]), gt_pose=gt[k])
        be.save(str(tmp_path))
        dsg = serialization.load_scene_graph(str(tmp_path / "dsg.npz"))
        assert dsg.mesh.num_vertices > 0
        assert len(dsg.agents) == 10
        assert (tmp_path / "proposed_merges.csv").exists()


class TestGeometryEpoch:
    """The CD/4D-map invalidation epoch must track geometry MOTION, not
    optimization count (soak finding: merge-proposal solves over consistent
    odometry are identity yet forced full ray-library rebuilds and full 4D
    snapshot chunks every pass)."""

    def test_identity_solves_do_not_bump_epoch(self):
        n = 20
        gt, _ = make_orbit(n)
        cfg = build(BackendConfig, {"lcd": None})
        be = Backend(cfg)
        for k in range(n):
            # odometry == GT: perfectly consistent graph, any solve is identity
            be.add_output(make_output(int(k * 4e8), gt[k], gt[k]), gt_pose=gt[k])
        be.optimize()
        be.optimize()
        assert be.num_optimizations == 2
        dsg = be.get_dsg()
        assert dsg.opt_epoch == 0, "identity solves must not invalidate CD/4D state"
        # and the deformed mesh is bitwise the accumulator mesh (identity
        # short-circuit in deform_points) — the 4D map's exact-row delta
        # sharing depends on this
        raw = be.mesh_acc.build()
        assert np.array_equal(dsg.mesh.vertices, raw.vertices)

    def test_merge_solve_moving_only_object_nodes_keeps_epoch(self):
        """r4 hard-scene finding: GNC pulling a merge pair's OBJECT nodes
        together moves those nodes on every merge-proposal solve — but the
        ray library and 4D-map sharing depend only on agents + mesh, so the
        epoch must not bump (it forced a full ray-library rebuild per CD
        pass)."""
        n = 20
        gt, _ = make_orbit(n)
        cfg = build(BackendConfig, {"lcd": None})
        be = Backend(cfg)

        def mkobj(center, t0_s, t1_s):
            c = np.asarray(center, np.float32)
            return KhronosObject(
                node_id=0, semantic_category=3,
                bbox_min=c - 0.3, bbox_max=c + 0.3,
                first_observed_ns=[int(t0_s * 1e9)],
                last_observed_ns=[int(t1_s * 1e9)],
                mesh_vertices=np.zeros((0, 3), np.float32),
                mesh_faces=np.zeros((0, 3), np.int64),
                mesh_colors=np.zeros((0, 3), np.float32),
            )

        for k in range(n):
            objects = []
            if k == 2:
                objects = [mkobj([2, 1, 0.3], 2, 3)]
            elif k == 12:
                # same spot, disjoint time -> merge proposal + identity factor
                objects = [mkobj([2.1, 1.05, 0.3], 12, 13)]
            be.add_output(make_output(int(k * 1e9), gt[k], gt[k],
                                      with_mesh=False, objects=objects),
                          gt_pose=gt[k])
        be.optimize()   # proposes the merge, adds object nodes + factor
        be.optimize()   # judges it: object nodes move toward each other
        assert be.proposed_merges, "merge proposal expected"
        dsg = be.get_dsg()
        assert dsg.opt_epoch == 0, (
            "object-node-only motion must not invalidate CD/4D state"
        )

    def test_moving_solve_bumps_epoch(self):
        n = 40
        gt, odom = make_orbit(n)
        cfg = build(BackendConfig, {
            "lcd": {"type": "GtLoopClosure", "min_time_gap": 5.0, "max_distance": 1.0},
            "sigma_odom_trans": 0.02,
        })
        be = Backend(cfg)
        for k in range(n):
            be.add_output(make_output(int(k * 4e8), odom[k], gt[k]), gt_pose=gt[k])
        assert len(be.loop_closures) >= 1
        dsg = be.get_dsg()
        assert dsg.opt_epoch >= 1, "a loop-closure solve that moves the graph must bump the epoch"


class TestIdentityDeform:
    def test_identity_correction_returns_input_array(self):
        from khronos_tpu.backend.deformation import DeformationGraph

        g = DeformationGraph()
        rng = np.random.default_rng(3)
        ctrl = rng.random((6, 3)).astype(np.float32)
        for i, p in enumerate(ctrl):
            g.add_control(p, i)
        pts = rng.random((500, 3)).astype(np.float32)
        eye = np.tile(np.eye(3, dtype=np.float32), (6, 1, 1))
        out = g.deform_points(pts, eye, ctrl, eye, ctrl)
        assert out is pts  # exact short-circuit, no device round-trip

    def test_real_correction_still_moves_points(self):
        from khronos_tpu.backend.deformation import DeformationGraph

        g = DeformationGraph()
        rng = np.random.default_rng(4)
        ctrl = rng.random((6, 3)).astype(np.float32)
        for i, p in enumerate(ctrl):
            g.add_control(p, i)
        pts = rng.random((64, 3)).astype(np.float32)
        eye = np.tile(np.eye(3, dtype=np.float32), (6, 1, 1))
        shift = ctrl + np.array([0.5, 0.0, 0.0], np.float32)
        out = g.deform_points(pts, eye, shift, eye, ctrl)
        assert np.abs(out - (pts + [0.5, 0, 0])).max() < 1e-3


class TestDescriptorLCD:
    def test_detects_revisit(self):
        from khronos_tpu.backend.loop_closure import DescriptorLoopClosureDetector
        import jax.numpy as jnp
        from khronos_tpu.data import synthetic as syn

        scene = syn.apartment_scene()
        seq = syn.SyntheticSequence(scene, syn.SyntheticSequenceConfig(
            duration=16.0, fps=2.5, height=96, width=128, fx=80., fy=80., cx=64., cy=48.))
        det = DescriptorLoopClosureConfig(min_time_gap=6.0, min_descriptor_similarity=0.97).create()
        cam = seq.camera
        fired = []
        for i in range(seq.n_frames):
            f = seq.render_frame(i)
            pts_c = np.asarray(cam.back_project(f["depth"]))
            valid = np.asarray(f["depth"]) > 0
            lcs = det.add_keyframe(i, f["stamp_ns"], pts_c, valid, f["R_gt"], f["t_gt"])
            fired.extend(lcs)
        assert len(fired) >= 1, "descriptor LCD never fired on a revisit"
        for lc in fired:
            # measured relative translation should be small (same viewpoint)
            assert np.linalg.norm(lc.t) < 1.0


class TestSchurSolverOption:
    def test_backend_schur_matches_dense(self):
        """BackendConfig.solver='schur' must produce the same optimized
        agent trajectory as the dense solver."""

        def run(solver):
            cfg = build(BackendConfig, {
                "solver": solver,
                "lcd": {"type": "GtLoopClosure", "min_time_gap": 5.0, "max_distance": 1.0},
                "sigma_odom_trans": 0.02,
            })
            be = Backend(cfg)
            n = 24
            gt, odom = make_orbit(n)
            for k in range(n):
                out = make_output(int(k * 4e8), odom[k], gt[k])
                be.add_output(out, gt_pose=gt[k])
            be.finish_processing()
            return be

        a = run("dense")
        b = run("schur")
        assert a.num_optimizations >= 1 and b.num_optimizations >= 1
        ta = np.stack([np.asarray(a.graph.node_t[i]) for i in a.agent_keys])
        tb = np.stack([np.asarray(b.graph.node_t[i]) for i in b.agent_keys])
        np.testing.assert_allclose(ta, tb, atol=5e-2)


class TestSceneGraphLCD:
    """Scene-graph object-descriptor LCD (hydra LCD object layer analog)."""

    def _objects(self, positions, labels, detected_s, start_id=1):
        from khronos_tpu.stm.scene_graph import KhronosObject

        out = []
        for i, (p, l) in enumerate(zip(positions, labels)):
            p = np.asarray(p, np.float32)
            ns = int(detected_s * 1e9)
            out.append(
                KhronosObject(
                    node_id=start_id + i, semantic_category=int(l),
                    bbox_min=p - 0.2, bbox_max=p + 0.2,
                    first_observed_ns=[ns], last_observed_ns=[ns + int(1e9)],
                    mesh_vertices=np.zeros((0, 3), np.float32),
                    mesh_faces=np.zeros((0, 3), np.int32),
                    mesh_colors=np.zeros((0, 3), np.float32),
                )
            )
        return out

    def test_revisit_with_drift_recovers_true_relative_pose(self):
        from khronos_tpu.backend.loop_closure import SceneGraphLoopClosureConfig

        det = SceneGraphLoopClosureConfig().create()
        P = [[2.0, 1.0, 0.5], [3.5, -1.0, 0.4], [5.0, 0.5, 0.6], [2.5, -2.0, 0.5]]
        L = [2, 3, 4, 5]
        old = self._objects(P, L, detected_s=1.0, start_id=1)
        # visit 1: keyframe at origin, accurate odometry
        assert det.add_keyframe(10, int(1e9), np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32), old) == []
        # visit 2 at the SAME true pose, but odometry has drifted by
        # (Rd, td); re-extracted duplicates land at drifted world positions
        ang = 0.12
        Rd = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
        td = np.array([0.6, -0.4, 0.05], np.float32)
        dup = self._objects([(Rd @ np.asarray(p) + td) for p in P], L,
                            detected_s=20.0, start_id=100)
        lcs = det.add_keyframe(50, int(21e9), Rd, td, old + dup)
        assert len(lcs) == 1
        lc = lcs[0]
        assert lc.from_key == 50 and lc.to_key == 10
        # true relative pose between the two keyframes is identity
        np.testing.assert_allclose(lc.R, np.eye(3), atol=1e-3)
        np.testing.assert_allclose(lc.t, np.zeros(3), atol=5e-3)

    def test_extraction_lag_fires_on_later_call(self):
        from khronos_tpu.backend.loop_closure import SceneGraphLoopClosureConfig

        det = SceneGraphLoopClosureConfig().create()
        P = [[2.0, 1.0, 0.5], [3.5, -1.0, 0.4], [5.0, 0.5, 0.6]]
        L = [2, 3, 4]
        old = self._objects(P, L, detected_s=1.0, start_id=1)
        I, z = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        assert det.add_keyframe(10, int(1e9), I, z, old) == []
        # re-visit keyframe arrives BEFORE its objects are extracted
        assert det.add_keyframe(50, int(21e9), I, z, old) == []
        # two seconds later extraction catches up; the pending keyframe
        # (key 50) still fires even though this call carries key 60
        dup = self._objects(P, L, detected_s=22.0, start_id=100)
        lcs = det.add_keyframe(60, int(23e9), I, z, old + dup)
        assert len(lcs) == 1
        assert lcs[0].from_key in (50, 60) and lcs[0].to_key == 10

    def test_different_constellations_do_not_match(self):
        from khronos_tpu.backend.loop_closure import SceneGraphLoopClosureConfig

        det = SceneGraphLoopClosureConfig().create()
        I, z = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        a = self._objects([[2, 1, 0.5], [3.5, -1, 0.4], [5, 0.5, 0.6]],
                          [2, 3, 4], detected_s=1.0, start_id=1)
        assert det.add_keyframe(10, int(1e9), I, z, a) == []
        # different labels AND different geometry at the later keyframe
        b = self._objects([[1, 0, 0.5], [1.5, 2.5, 0.4], [4, 3, 0.6]],
                          [5, 6, 6], detected_s=20.0, start_id=100)
        lcs = det.add_keyframe(50, int(21e9), I, z, a + b)
        assert lcs == []

    def test_backend_integration_needs_scene(self):
        """Backend.add_output routes the object layer into the detector."""
        from khronos_tpu.backend.backend import Backend, BackendConfig
        from khronos_tpu.config import build

        cfg = build(BackendConfig, {"lcd": {"type": "SceneGraphLoopClosure"}})
        be = Backend(cfg)
        assert getattr(be.lcd, "needs_scene", False)


class TestPlacesGate:
    """Places-layer descriptor tier of the hybrid LCD (hydra LCD place path:
    clearance histogram, L1-matched, gating candidates top-down —
    uHumans2.yaml:262,288-296)."""

    def _hist(self, clearances, center=np.zeros(3, np.float32)):
        from khronos_tpu.backend.loop_closure import (
            PlacesGateConfig,
            _place_layer_descriptor,
        )

        rng = np.random.default_rng(3)
        pos = (rng.random((len(clearances), 3)).astype(np.float32) - 0.5) * 6.0
        return _place_layer_descriptor(
            pos + center, np.asarray(clearances, np.float32), center,
            PlacesGateConfig(),
        )

    def test_descriptor_discriminates_corridor_from_open_room(self):
        from khronos_tpu.backend.loop_closure import _place_descriptor_score

        corridor = self._hist([0.6, 0.65, 0.7, 0.6, 0.55, 0.62, 0.68, 0.6])
        open_room = self._hist([2.2, 2.3, 2.1, 2.4, 2.2, 2.25, 2.3, 2.15])
        same = self._hist([0.6, 0.66, 0.71, 0.59, 0.56, 0.61, 0.69, 0.63])
        assert _place_descriptor_score(corridor, open_room) < 0.1
        assert _place_descriptor_score(corridor, same) > 0.6
        # abstention: undescribed side passes (score 1.0)
        assert _place_descriptor_score(corridor, None) == 1.0
        # too few nodes -> undescribed
        assert self._hist([0.6, 0.7]) is None

    def test_gate_vetoes_appearance_candidate(self):
        """Identical frames (appearance similarity 1.0, registration exact)
        at places-distinct keyframes: the places tier must veto the match;
        with matching place context the same candidate fires."""
        from khronos_tpu.backend.loop_closure import HybridLoopClosureConfig

        rng = np.random.default_rng(0)
        H, W = 24, 32
        depth_pts = rng.random((H, W, 3)).astype(np.float32) * 3.0
        valid = np.ones((H, W), bool)
        color = rng.random((12, 16, 3)).astype(np.float32)
        I, z = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)

        def run(desc_a, desc_b):
            det = HybridLoopClosureConfig().create()
            det.appearance.config = dataclasses.replace(
                det.appearance.config, min_time_gap=5.0,
                min_detection_separation=1.0,
            )
            # no places feed this call (places=None): descriptors injected
            # directly so the test isolates the gate itself
            assert det.add_keyframe(10, int(1e9), depth_pts, valid, color, I, z) == []
            det._place_descs = {10: desc_a, 50: desc_b}
            return det, det.add_keyframe(50, int(20e9), depth_pts, valid, color, I, z)

        corridor = self._hist([0.6, 0.65, 0.7, 0.6, 0.55, 0.62, 0.68, 0.6])
        open_room = self._hist([2.2, 2.3, 2.1, 2.4, 2.2, 2.25, 2.3, 2.15])
        det, lcs = run(corridor, open_room)
        assert lcs == [], "places-distinct match not vetoed"
        assert det.place_gate_rejections >= 1
        det, lcs = run(corridor, corridor)
        assert len(lcs) == 1, "places-consistent match blocked"
        assert det.place_gate_rejections == 0

    def test_hybrid_describes_keyframes_from_places_feed(self):
        """End-to-end wiring of the feed: add_keyframe with a (positions,
        clearances) snapshot stores a descriptor for the keyframe, and the
        pending-refresh re-describes recent keyframes as the layer grows."""
        from khronos_tpu.backend.loop_closure import HybridLoopClosureConfig

        rng = np.random.default_rng(1)
        H, W = 24, 32
        depth_pts = rng.random((H, W, 3)).astype(np.float32) * 3.0
        valid = np.ones((H, W), bool)
        color = rng.random((12, 16, 3)).astype(np.float32)
        I, z = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        det = HybridLoopClosureConfig().create()
        # at keyframe time the local layer is too thin (mesh archival lag)
        thin = (np.zeros((2, 3), np.float32), np.asarray([0.6, 0.7], np.float32))
        det.add_keyframe(10, int(1e9), depth_pts, valid, color, I, z, places=thin)
        assert det._place_descs[10] is None
        # two seconds later the layer has materialized: the pending refresh
        # re-describes keyframe 10 with the grown layer
        pos = (rng.random((10, 3)).astype(np.float32) - 0.5) * 6.0
        clr = np.full(10, 0.8, np.float32)
        det.add_keyframe(11, int(3e9), depth_pts, valid, color, I, z,
                         places=(pos, clr))
        assert det._place_descs[10] is not None
        assert det._place_descs[11] is not None

    def test_keyframe_without_snapshot_described_later(self):
        """r4 advisor fix: a keyframe arriving while the places snapshot is
        None still enters the pending queue, so it is described once a later
        call carries a materialized layer within the horizon."""
        from khronos_tpu.backend.loop_closure import HybridLoopClosureConfig

        rng = np.random.default_rng(2)
        H, W = 24, 32
        depth_pts = rng.random((H, W, 3)).astype(np.float32) * 3.0
        valid = np.ones((H, W), bool)
        color = rng.random((12, 16, 3)).astype(np.float32)
        I, z = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        det = HybridLoopClosureConfig().create()
        det.add_keyframe(10, int(1e9), depth_pts, valid, color, I, z)  # no kw
        pos = (rng.random((10, 3)).astype(np.float32) - 0.5) * 6.0
        clr = np.full(10, 0.8, np.float32)
        det.add_keyframe(11, int(3e9), depth_pts, valid, color, I, z,
                         places=(pos, clr))
        assert det._place_descs.get(10) is not None, (
            "keyframe stuck undescribed after the layer materialized"
        )

    def test_zero_histogram_abstains(self):
        """r4 advisor fix: clearances all outside [hist_min, hist_max] must
        yield None (abstain), not an unnormalized all-zero vector."""
        assert self._hist([5.0, 6.0, 7.0, 8.0, 9.0]) is None

    def test_geometry_epoch_invalidates_descriptors(self):
        """r4 advisor fix: when an optimization moves geometry, stored place
        descriptors (computed at raw odometry positions) are invalidated —
        the gate abstains instead of vetoing true loops on stale context."""
        from khronos_tpu.backend.loop_closure import HybridLoopClosureConfig

        det = HybridLoopClosureConfig().create()
        det.on_geometry_epoch(0)
        old_desc = self._hist([0.6, 0.65, 0.7, 0.6, 0.55, 0.62, 0.68, 0.6])
        det._place_descs = {10: old_desc, 50: old_desc}
        det.on_geometry_epoch(0)  # same epoch: keep
        assert det._place_descs[10] is not None
        det.on_geometry_epoch(1)  # geometry moved: invalidate
        assert det._place_descs[10] is None and det._place_descs[50] is None
        assert det._place_gate(10, 50) is True  # abstains, does not veto
