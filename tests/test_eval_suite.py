"""Evaluator additions: segmentation cardinalities, Random ray policies,
standalone re-evaluation CLI over a saved run (exp_pipeline analog)."""

import numpy as np

from khronos_tpu.eval.evaluators import (
    GtObject,
    ObjectEvaluatorConfig,
    evaluate_objects,
    segmentation_cardinalities,
)
from khronos_tpu.stm.scene_graph import KhronosObject


def make_est(nid, center, half=0.2):
    c = np.asarray(center, np.float32)
    return KhronosObject(
        node_id=nid, semantic_category=2,
        bbox_min=c - half, bbox_max=c + half,
        first_observed_ns=[0], last_observed_ns=[1 << 60],
        mesh_vertices=np.zeros((0, 3), np.float32),
        mesh_faces=np.zeros((0, 3), np.int64),
        mesh_colors=np.zeros((0, 3), np.float32),
    )


def make_gt(gid, center):
    c = np.asarray(center, np.float32)
    return GtObject(gt_id=gid, label=2, center=c, bbox_min=c - 0.2, bbox_max=c + 0.2)


class TestSegmentationCardinalities:
    def test_oversegmentation(self):
        """One GT chair split into two estimates -> oversegmented by 1."""
        est = [make_est(1, [0, 0, 0]), make_est(2, [0.3, 0, 0])]
        gt = [make_gt(0, [0.15, 0, 0])]
        over, under = segmentation_cardinalities(est, gt, ObjectEvaluatorConfig())
        assert over == 1 and under == 0

    def test_undersegmentation(self):
        """Two GT chairs covered by one estimate -> undersegmented by 1
        (object_evaluator.cpp:287+ cardinality)."""
        est = [make_est(1, [0.5, 0, 0])]
        gt = [make_gt(0, [0, 0, 0]), make_gt(1, [1, 0, 0])]
        over, under = segmentation_cardinalities(est, gt, ObjectEvaluatorConfig())
        assert over == 0 and under == 1

    def test_one_to_one_clean(self):
        est = [make_est(1, [0, 0, 0]), make_est(2, [5, 0, 0])]
        gt = [make_gt(0, [0.05, 0, 0]), make_gt(1, [5.02, 0, 0])]
        over, under = segmentation_cardinalities(est, gt, ObjectEvaluatorConfig())
        assert over == 0 and under == 0
        m = evaluate_objects(est, gt, 0)
        assert m["oversegmented"] == 0 and m["undersegmented"] == 0
        assert m["precision"] == 1.0 and m["recall"] == 1.0


class TestRandomRayPolicies:
    def test_random_policies_give_consistent_evidence(self):
        """Random / Random3 draw valid observers: evidence agrees in kind
        with Middle on a simple wall scene, Random3 has ~3x ray count."""
        from khronos_tpu.changes.ray_verificator import (
            RayVerificator,
            RayVerificatorConfig,
        )
        from khronos_tpu.stm.scene_graph import AgentNode, Mesh, SceneGraph

        dsg = SceneGraph()
        dsg.agents = [
            AgentNode(int(s * 1e9), np.eye(3, dtype=np.float32),
                      np.asarray([0, 0, 1], np.float32))
            for s in np.arange(0, 101, 2.0)
        ]
        V = 50
        verts = np.stack([
            np.full(V, 5.0), np.linspace(-2, 2, V), np.full(V, 1.0)
        ], axis=1).astype(np.float32)
        dsg.mesh = Mesh(
            vertices=verts,
            colors=np.zeros((V, 3), np.float32),
            labels=np.zeros(V, np.int32),
            first_seen_ns=np.zeros(V, np.int64),
            last_seen_ns=np.full(V, int(100e9), np.int64),
            faces=np.zeros((0, 3), np.int64),
        )
        counts = {}
        for policy in ("Middle", "Random", "Random3"):
            ver = RayVerificator(RayVerificatorConfig(ray_policy=policy))
            ver.build(dsg)
            counts[policy] = ver.num_rays
            ev = ver.query(np.asarray([[3.0, 0, 1]], np.float32))
            assert ev[0, :, 1].sum() > 0, f"{policy}: absent evidence expected"
            assert ev[0, :, 0].sum() == 0, f"{policy}: no match expected"
        assert counts["Random"] == counts["Middle"]
        assert counts["Random3"] == 3 * counts["Random"]

    def test_random_deterministic(self):
        from khronos_tpu.changes.ray_verificator import RayVerificatorConfig

        cfg = RayVerificatorConfig(ray_policy="Random3")
        cfg.check()  # policy accepted


class TestStandaloneEvalCLI:
    def test_reevaluate_saved_map(self, tmp_path):
        """Round-trip: save a 4D map + gt.npz, re-evaluate via the CLI."""
        import os

        from khronos_tpu.eval.__main__ import main as eval_main
        from khronos_tpu.eval.pipeline_evaluator import (
            FileGroundTruth,
            save_ground_truth,
        )
        from khronos_tpu.stm.scene_graph import Mesh, SceneGraph
        from khronos_tpu.stm.spatio_temporal_map import SpatioTemporalMap

        # tiny map: one snapshot with a cube-corner mesh + one object
        stm = SpatioTemporalMap()
        dsg = SceneGraph()
        V = 64
        rng = np.random.default_rng(0)
        verts = rng.uniform(0, 2, (V, 3)).astype(np.float32)
        dsg.mesh = Mesh(
            vertices=verts, colors=np.zeros((V, 3), np.float32),
            labels=np.zeros(V, np.int32),
            first_seen_ns=np.zeros(V, np.int64),
            last_seen_ns=np.full(V, int(10e9), np.int64),
            faces=np.zeros((0, 3), np.int64),
        )
        dsg.objects[1] = make_est(1, [1, 1, 1])
        stm.update(dsg, int(10e9))
        map_path = str(tmp_path / "final.4dmap.npz")
        stm.save(map_path)

        class TinyGt:
            duration_s = 10.0

            def background_points(self, t_s):
                return verts

            def gt_objects(self):
                return [make_gt(0, [1.05, 1, 1])]

            def gt_dynamic_trajectories(self):
                return {7: (np.asarray([0, int(5e9)], np.int64),
                            np.zeros((2, 3), np.float32))}

        save_ground_truth(TinyGt(), str(tmp_path / "gt.npz"), [10.0])
        # FileGroundTruth round-trips the oracle
        fgt = FileGroundTruth(str(tmp_path / "gt.npz"))
        assert fgt.duration_s == 10.0
        assert len(fgt.gt_objects()) == 1
        assert 7 in fgt.gt_dynamic_trajectories()
        np.testing.assert_allclose(fgt.background_points(9.0), verts)

        rc = eval_main(["--map", map_path])
        assert rc == 0
        results = tmp_path / "results"
        assert (results / "background_mesh.csv").exists()
        assert (results / "static_objects.csv").exists()
        with open(results / "static_objects.csv") as fh:
            header = fh.readline()
        assert "undersegmented" in header and "oversegmented" in header
