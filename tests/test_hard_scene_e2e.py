"""Hard-mode multi-room regression e2e (r4 VERDICT task 2).

The uHumans2-office-class difficulty tier: 4 rooms + doorways + pillars,
31 object instances (compound/spherical shapes, near-duplicates, clutter),
7 change events (incl. a moved object and a partially-viewed removal),
4 crossing humans, waypoint tour with revisits. Unlike the toy office e2e
(which saturates at 1.0), the asserted floors here are REALISTIC — measured
on-chip 2026-08-21 (METRICS.md hard-scene table: object P/R 0.974/0.815,
change P/R 0.75/0.429, dynamic R 0.065 against a 0.073 visibility ceiling,
5 rooms found of 4 real, ATE 0.017-0.026) and asserted with slack for seed
drift. Anything saturating at 1.0 here would indicate the scene generator
broke, not that the system got perfect.
"""

import numpy as np
import pytest

from khronos_tpu.active_window.frame_data import FrameData
from khronos_tpu.config import build
from khronos_tpu.data import synthetic as syn
from khronos_tpu.eval.pipeline_evaluator import (
    PipelineEvaluator,
    PipelineEvaluatorConfig,
    SceneGroundTruth,
)
from khronos_tpu.pipeline.pipeline import (
    ExperimentConfig,
    ExperimentManager,
    KhronosPipeline,
    PipelineConfig,
)

DURATION = 60.0
FPS = 3.0


@pytest.fixture(scope="module")
def hard_run(tmp_path_factory):
    scene = syn.hard_scene(duration=DURATION)
    seq = syn.TourSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=DURATION, fps=FPS, height=96, width=128,
            fx=80.0, fy=80.0, cx=64.0, cy=48.0, n_loops=2.0,
        ),
    )
    cfg = build(
        PipelineConfig,
        {
            "active_window": {
                "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
                "motion_detector": {"type": "FreeSpaceMotionDetector",
                                    "min_cluster_size": 60, "grow_iterations": 12,
                                    "seed_dynamic_labels": True},
                "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 30},
                "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
                "object_extractor": {
                    "type": "MeshObjectExtractor",
                    "min_num_observations": 2,
                    "max_frames": 10,
                    "min_dynamic_displacement": 0.4,
                },
            },
            "backend": {"lcd": {"type": "GtLoopClosure", "min_time_gap": 20.0,
                                "max_distance": 1.0}},
            "label_space": {
                "num_classes": 7,
                "object_labels": [2, 3, 4, 5, 6],
                "dynamic_labels": [1],
            },
            "run_change_detection_every_n_frames": int(8 * FPS),
            "change_detection": {
                "verificator": {"ray_policy": "All", "temporal_resolution": 2.0,
                                "num_bins": 32},
                "detector": {"window_size": 3, "evidence_prior": 2.0},
            },
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)
    out_dir = str(tmp_path_factory.mktemp("hard"))
    mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)
    frames, gts = [], []
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        frames.append(FrameData(
            stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
            labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
        ))
        gts.append((f["R_gt"], f["t_gt"]))
    mgr.run(frames, gts)
    gt = SceneGroundTruth(scene, DURATION, n_bg_points=30000)
    gt_traj = (
        np.asarray([f.stamp_ns for f in frames], np.int64),
        np.stack([t for _, t in gts]).astype(np.float64),
    )
    return scene, pipe, out_dir, gt, gt_traj


@pytest.mark.slow
class TestHardScene:
    def test_scene_is_hard(self, hard_run):
        """The scene itself must carry the difficulty the floors assume."""
        scene, *_ = hard_run
        gt = SceneGroundTruth(scene, DURATION)
        objs = gt.gt_objects()
        assert len(objs) >= 30
        end = int(DURATION * 1e9)
        n_changes = sum(
            (g.t_appear_ns > 0) + (g.t_disappear_ns < end) for g in objs
        )
        assert n_changes >= 6
        assert sum(p.is_dynamic for p in scene.primitives) >= 3

    def test_realistic_floors(self, hard_run):
        scene, pipe, out_dir, gt, gt_traj = hard_run
        ev = PipelineEvaluator(PipelineEvaluatorConfig(only_final=True))
        s = ev.evaluate(pipe.map, gt, out_dir + "/results", gt_trajectory=gt_traj)
        # measured 0.017-0.026 m; loop closures + merge promotion active
        assert s["trajectory"]["ate_rmse"] < 0.06, s["trajectory"]
        m = s["mesh"]
        assert m["f1@0.2"] > 0.95, m  # measured 0.979
        o = s["objects"]
        # measured P 0.974 / R 0.815 with 5 coverage-limited misses and 16
        # over-segmented fragments — the non-saturated regime the toy office
        # cannot produce
        assert o["precision"] > 0.9, o
        assert 0.7 <= o["recall"] <= 0.98, o
        assert o["oversegmented"] >= 5, (o, "hard scene should fragment views")
        ch = s["changes"]
        # r5: with the ray-classification contraction forced elementwise
        # (no bf16 MXU lowering) the backends agree on the CLASSIFIER —
        # measured P 0.8 / R 0.571 single-device CPU (r4: chip 0.75, CPU
        # 0.5). The residual swing is upstream: mesh color/position fusion
        # reorders float adds under different intra-op thread partitions
        # (in-suite with 8 virtual devices: P 0.6), and at 5 reported
        # changes ONE borderline decision moves P by 0.2. Floor covers both
        # measured operating points and sits above every r4 value.
        assert ch["change_precision"] >= 0.55, ch
        assert 0.4 <= ch["change_recall"] <= 0.9, ch
        d = s["dynamic"]
        # visibility ceiling is 0.073 (tour gaze); measured R 0.065-0.073
        assert d["dynamic_precision"] > 0.8, d
        assert d["dynamic_recall"] >= 0.04, d

    def test_rooms_found(self, hard_run):
        """r5 VERDICT task 4: the 4 real rooms must come out as 4+-1 —
        exact-metric ball erosion + real doorways + no phantom fallback ids
        measured exactly 4 on CPU and on the GT surface."""
        scene, pipe, *_ = hard_run
        final = pipe.map.snapshots[-1]
        assert final.places is not None and len(final.places.nodes) > 0
        assert 3 <= final.places.num_rooms <= 5, final.places.num_rooms

    def test_moved_object_reported_both_ways(self, hard_run):
        """The MOVED box (disappears at A, appears at B) must be reported as
        both a disappearance near A and an appearance near B within the
        change-eval tolerance."""
        scene, pipe, out_dir, gt, gt_traj = hard_run
        stm = pipe.map
        final = stm.get_dsg(stm.stamps()[-1])
        end_ns = int(DURATION * 1e9)
        tol = int(10e9)
        a = np.array([6.0, -4.6, 0.3])
        b = np.array([3.2, -5.2, 0.3])
        # appearance at B is timing-accurate on both backends (measured err
        # 4.8 s); the disappearance at A must be DETECTED (presence clamped
        # well before sequence end by absent evidence) but its timing is
        # backend-sensitive (on-chip err 2 s, CPU up to ~21 s: the first
        # revisit of A is at ~50 s, and borderline evidence windows shift
        # with reduction order), so only detection is asserted.
        gone_at_a = any(
            not o.is_dynamic
            and np.linalg.norm(o.position() - a) < 1.0
            and o.last_observed_ns[-1] <= int(55e9)
            for o in final.objects.values()
        )
        new_at_b = any(
            not o.is_dynamic
            and np.linalg.norm(o.position() - b) < 1.0
            and abs(o.first_observed_ns[0] - int(30e9)) <= tol
            for o in final.objects.values()
        )
        assert gone_at_a, "moved box: disappearance at A not detected"
        assert new_at_b, "moved box: appearance at B not reported"
