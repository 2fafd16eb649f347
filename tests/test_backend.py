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
