"""Full-pipeline integration test: office scene with dynamics + long-term
changes + loop closure -> 4D map -> evaluation metrics (the tesse_cd_office
analog run, SURVEY.md §6 north star)."""

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


DURATION = 24.0
FPS = 4.0


@pytest.fixture(scope="module")
def office_run(tmp_path_factory):
    scene = syn.office_scene(duration=DURATION)
    seq = syn.SyntheticSequence(
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
                "volumetric_map": {"grid_shape": [160, 160, 40], "voxel_size": 0.1},
                "motion_detector": {"type": "FreeSpaceMotionDetector", "min_cluster_size": 60, "grow_iterations": 12},
                "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 30},
                # 2 obs at 4 fps = 0.5 s confirmation (comparable to the
                # reference's 8 frames at 25 Hz); scripts/dynamic_study.py:
                # min_obs 2 + min_disp 0.4 lifts dynamic recall 0.177 ->
                # 0.219 with zero precision cost
                "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
                "object_extractor": {
                    "type": "MeshObjectExtractor",
                    "min_num_observations": 2,
                    "max_frames": 10,
                    "min_dynamic_displacement": 0.4,
                },
            },
            "backend": {"lcd": {"type": "GtLoopClosure", "min_time_gap": 8.0, "max_distance": 1.0}},
            "label_space": {
                "num_classes": 7,
                "object_labels": [2, 3, 4, 5, 6],
                "dynamic_labels": [1],
            },
            "run_change_detection_every_n_frames": 24,
            "change_detection": {
                "verificator": {"ray_policy": "All", "temporal_resolution": 2.0, "num_bins": 32},
                "detector": {"window_size": 3, "evidence_prior": 2.0},
            },
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)
    out_dir = str(tmp_path_factory.mktemp("office"))
    mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)

    frames, gts = [], []
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        frames.append(
            FrameData(
                stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
            )
        )
        gts.append((f["R_gt"], f["t_gt"]))
    mgr.run(frames, gts)
    # dense GT: at 6k samples over the whole scene the mean GT spacing
    # (~0.2 m) dominates the accuracy metric; 30k measures the mesh, not
    # the sampling
    gt = SceneGroundTruth(scene, DURATION, n_bg_points=30000)
    gt_traj = (
        np.asarray([f.stamp_ns for f in frames], np.int64),
        np.stack([t for _, t in gts]).astype(np.float64),
    )
    return scene, pipe, out_dir, gt, gt_traj


class TestOfficePipeline:
    def test_outputs_written(self, office_run):
        import os

        scene, pipe, out_dir, gt, gt_traj = office_run
        for f in ("dsg.npz", "final.4dmap.npz", "mesh.ply", "object_changes.csv",
                  "objects.csv", "experiment_log.txt"):
            assert os.path.exists(os.path.join(out_dir, f)), f
        from khronos_tpu.utils.logging import ExperimentLogger

        assert ExperimentLogger.has_flag(out_dir, "Experiment Finished Cleanly")

    def test_map_quality(self, office_run):
        scene, pipe, out_dir, gt, gt_traj = office_run
        ev = PipelineEvaluator(PipelineEvaluatorConfig(only_final=True))
        summary = ev.evaluate(pipe.map, gt, out_dir + "/results", gt_trajectory=gt_traj)
        traj = summary["trajectory"]
        # GT loop closures + PGO on noisy odometry: ATE well under a voxel
        assert traj["ate_rmse"] < 0.1, traj
        assert traj["n_poses"] > 10
        mesh = summary["mesh"]
        # reference office (khronos_eval/README.md:13-16, its own protocol —
        # GT pruned to observed areas): acc 99.3 / comp 77.0 / F1 84.1.
        # Measured here: acc 0.98 / comp 0.999 / F1 0.989 — asserted with
        # slack for seed drift.
        assert mesh["accuracy@0.2"] > 0.9, mesh
        assert mesh["completeness@0.2"] > 0.9, mesh
        assert mesh["f1@0.2"] > 0.9, mesh
        obj = summary["objects"]
        # reference office object P/R: 98.6 / 43.3; measured here 1.0 / 1.0
        assert obj["precision"] > 0.8, obj
        assert obj["recall"] > 0.8, obj
        ch = summary["changes"]
        # reference office change P/R: 34.7 / 49.3; measured 1.0 / 1.0 after
        # the round-3 CD fixes + the identity-split (twin-presence) veto
        assert ch["change_recall"] > 0.99, ch
        assert ch["change_precision"] > 0.99, ch

    def test_loop_closure_fired(self, office_run):
        scene, pipe, out_dir, gt, gt_traj = office_run
        assert len(pipe.backend.loop_closures) >= 1
        assert pipe.backend.num_optimizations >= 1

    def test_dynamic_humans_tracked(self, office_run):
        scene, pipe, out_dir, gt, gt_traj = office_run
        final = pipe.map.get_dsg(pipe.map.latest_ns())
        dyn = [o for o in final.objects.values() if o.is_dynamic]
        assert len(dyn) >= 1, "no dynamic objects in final map"

    def test_change_detection_disappearance(self, office_run):
        """The chair removed at t=12 s must have absence evidence and a
        reconciled presence interval ending before the sequence end."""
        scene, pipe, out_dir, gt, gt_traj = office_run
        final = pipe.map.get_dsg(pipe.map.latest_ns())
        t_change_ns = int(DURATION / 2 * 1e9)
        chair_pos = np.array([3.8, -2.6, 0.35])
        # find estimated objects near the chair
        near = [
            o for o in final.objects.values()
            if not o.is_dynamic and np.linalg.norm(o.position() - chair_pos) < 1.0
        ]
        assert near, "chair never reconstructed"
        # at least one near-chair object's presence ends near/before the change
        ends = [o.last_observed_ns[-1] for o in near]
        assert min(ends) < int((DURATION - 2.0) * 1e9), (
            f"chair presence never terminated: {[e * 1e-9 for e in ends]}"
        )

    def test_4dmap_time_scrubbing(self, office_run):
        scene, pipe, out_dir, gt, gt_traj = office_run
        stm = pipe.map
        assert stm.num_snapshots >= 2
        early = stm.get_dsg(stm.earliest_ns())
        late = stm.get_dsg(stm.latest_ns())
        assert late.mesh.num_vertices >= early.mesh.num_vertices
        assert (early.mesh.first_seen_ns <= stm.earliest_ns()).all()

    def test_places_incremental_in_snapshots(self, office_run):
        """Per-output incremental frontend (places_mode='output', default):
        mid-run 4D snapshots carry a places layer — not only the final one
        (reference builds scene-graph layers per backend input,
        uHumans2.yaml:103-150)."""
        scene, pipe, out_dir, gt, gt_traj = office_run
        snaps = pipe.map.snapshots
        assert len(snaps) >= 2
        mid = snaps[len(snaps) // 2]
        assert mid.places is not None and len(mid.places.nodes) > 0, (
            "mid-run snapshot has no places layer"
        )
        final = snaps[-1]
        assert final.places is not None and len(final.places.nodes) > 0
        # the office is one open room: every place lands in a room and the
        # wide interior does not split
        assert final.places.num_rooms >= 1
        assert all(n.room_id >= 0 for n in final.places.nodes)
        # clearances are physically sane (inside a ~7 m room)
        assert all(0.2 <= n.distance <= 6.0 for n in final.places.nodes)


def _assert_no_false_place_vetoes(backend, gt_stamps, gt_pos, radius=1.5):
    """r4 VERDICT task 8: audit the places-gate decision trail — no DESCRIBED
    rejection may hit a true pair (keyframes within `radius` in GT)."""
    lcd = backend.lcd
    stamps = np.asarray(gt_stamps, np.int64)
    key_pos = {}
    for i, a in enumerate(backend.agents):
        fi = int(np.argmin(np.abs(stamps - a.stamp_ns)))
        key_pos[backend.agent_keys[i]] = np.asarray(gt_pos[fi])
    assert len(lcd.place_gate_events) >= 1, "places gate never consulted"
    false_vetoes = [
        (qk, ck, s)
        for qk, ck, s, ok, described in lcd.place_gate_events
        if not ok and described and qk in key_pos and ck in key_pos
        and float(np.linalg.norm(key_pos[qk] - key_pos[ck])) <= radius
    ]
    assert false_vetoes == [], f"places gate vetoed true loops: {false_vetoes}"


class TestSceneGraphLcdPipeline:
    @pytest.mark.slow
    def test_drifted_run_closed_by_appearance_stream(self, tmp_path):
        """Round-3 task 7: hybrid LCD with an EMPTY object layer (no object
        labels -> constellation matching can never fire) must still close the
        drifted loop through the appearance stream (reference BoW appearance
        queries, khronos.launch.yaml:49 -> kimera_vio bow_query), with
        registration-residual sigmas on the factor."""
        from khronos_tpu.eval.evaluators import evaluate_trajectory

        duration, fps = 24.0, 3.0
        scene = syn.office_scene(duration=duration)
        seq = syn.SyntheticSequence(
            scene,
            syn.SyntheticSequenceConfig(
                duration=duration, fps=fps, height=60, width=80,
                fx=50.0, fy=50.0, cx=40.0, cy=30.0, n_loops=2.0,
                drift_rate=0.06,
            ),
        )
        cfg = build(
            PipelineConfig,
            {
                "active_window": {
                    "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
                    "tracker": {"type": "MaxIouTracker", "min_num_observations": 3},
                },
                "backend": {
                    "lcd": {
                        "type": "HybridLoopClosure",
                        "constellation": {"min_time_gap": 8.0, "min_objects": 3},
                        "appearance": {
                            "min_time_gap": 8.0,
                            "min_appearance_similarity": 0.9,
                            "max_registration_rms": 0.3,
                            "noise_bound": 0.15,
                        },
                    }
                },
                # NO object labels: the object layer stays empty, so the
                # constellation stream is structurally unable to fire
                "label_space": {"num_classes": 7, "object_labels": [], "dynamic_labels": [1]},
                "run_change_detection_every_n_frames": 60,
            },
        )
        pipe = KhronosPipeline(cfg, seq.camera)
        out_dir = str(tmp_path / "run")
        mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)
        frames, gt_stamps, gt_pos = [], [], []
        for i in range(seq.n_frames):
            f = seq.render_frame(i)
            Ro, to = seq.odometry_pose(i)
            frames.append(
                FrameData(
                    stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                    labels=f["labels"],
                    R_w_c=np.asarray(Ro, np.float32),
                    t_w_c=np.asarray(to, np.float32),
                )
            )
            gt_stamps.append(int(f["stamp_ns"]))
            gt_pos.append(np.asarray(f["t_gt"], np.float64))
        mgr.run(frames, None)

        lcd = pipe.backend.lcd
        assert lcd.constellation_fires == 0, "constellation fired with no objects?"
        assert lcd.appearance_fires >= 1, "appearance stream never fired"
        assert len(pipe.backend.loop_closures) >= 1
        # places tier was live end-to-end: the pipeline fed the places layer
        # into the LCD, keyframes got described, and the descriptor gate did
        # not veto the TRUE loop (same place -> high L1 score)
        assert pipe.backend.places_provider is not None
        assert any(d is not None for d in lcd._place_descs.values()), (
            "places feed never described a keyframe"
        )
        # gate-efficacy audit (r4 task 8): zero false vetoes on true loops
        _assert_no_false_place_vetoes(pipe.backend, gt_stamps, gt_pos)
        # sigma came from the registration residual, not the config default
        assert all(lc.sigma_trans is not None for lc in pipe.backend.loop_closures)
        dsg = pipe.backend.get_dsg()
        est = evaluate_trajectory(
            np.asarray([a.stamp_ns for a in dsg.agents], np.int64),
            np.stack([a.t_w_b for a in dsg.agents]),
            np.asarray(gt_stamps, np.int64), np.stack(gt_pos),
        )
        odo = evaluate_trajectory(
            np.asarray(gt_stamps, np.int64),
            np.stack([np.asarray(f.t_w_c, np.float64) for f in frames]),
            np.asarray(gt_stamps, np.int64), np.stack(gt_pos),
        )
        assert odo["ate_rmse"] > 0.01, "drift injection broken"
        assert est["ate_rmse"] < odo["ate_rmse"], (est, odo)

    @pytest.mark.slow
    def test_appearance_loop_closes_under_photometric_perturbation(self, tmp_path):
        """r4 VERDICT task 7 (appearance-LCD invariance): the revisit half of
        the drifted run carries +30% brightness (clipped, i.e. with
        saturation nonlinearity) AND a small viewpoint offset (3 deg yaw +
        ~10 cm position). The appearance stream must still close the loop —
        the invariance the reference gets from ORB BoW features
        (khronos.launch.yaml:49)."""
        from khronos_tpu.eval.evaluators import evaluate_trajectory

        duration, fps = 24.0, 3.0
        scene = syn.office_scene(duration=duration)
        seq_cfg = syn.SyntheticSequenceConfig(
            duration=duration, fps=fps, height=60, width=80,
            fx=50.0, fy=50.0, cx=40.0, cy=30.0, n_loops=2.0,
            drift_rate=0.06,
        )

        class PerturbedSequence(syn.SyntheticSequence):
            def pose_at(self, t):
                R, pos = super().pose_at(t)
                if t > duration / 2:  # revisit: small viewpoint offset
                    ang = np.radians(3.0)
                    Rz = np.array(
                        [[np.cos(ang), -np.sin(ang), 0],
                         [np.sin(ang), np.cos(ang), 0],
                         [0, 0, 1]], np.float32,
                    )
                    R = (Rz @ R).astype(R.dtype)
                    pos = pos + np.array([0.08, 0.05, 0.05], pos.dtype)
                return R, pos

        seq = PerturbedSequence(scene, seq_cfg)
        cfg = build(
            PipelineConfig,
            {
                "active_window": {
                    "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
                    "tracker": {"type": "MaxIouTracker", "min_num_observations": 3},
                },
                "backend": {
                    "lcd": {
                        "type": "HybridLoopClosure",
                        "constellation": {"min_time_gap": 8.0, "min_objects": 3},
                        "appearance": {
                            "min_time_gap": 8.0,
                            "max_registration_rms": 0.3,
                            "noise_bound": 0.15,
                        },
                    }
                },
                # empty object layer: only the appearance stream can fire
                "label_space": {"num_classes": 7, "object_labels": [], "dynamic_labels": [1]},
                "run_change_detection_every_n_frames": 60,
            },
        )
        pipe = KhronosPipeline(cfg, seq.camera)
        out_dir = str(tmp_path / "run")
        mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)
        frames, gt_stamps, gt_pos = [], [], []
        for i in range(seq.n_frames):
            f = seq.render_frame(i)
            Ro, to = seq.odometry_pose(i)
            color = np.asarray(f["color"])
            if i / fps > duration / 2:
                color = np.clip(color * 1.3, 0.0, 1.0)  # +30% exposure
            frames.append(
                FrameData(
                    stamp_ns=f["stamp_ns"], depth=f["depth"],
                    color=color.astype(np.float32),
                    labels=f["labels"],
                    R_w_c=np.asarray(Ro, np.float32),
                    t_w_c=np.asarray(to, np.float32),
                )
            )
            gt_stamps.append(int(f["stamp_ns"]))
            gt_pos.append(np.asarray(f["t_gt"], np.float64))
        mgr.run(frames, None)

        lcd = pipe.backend.lcd
        assert lcd.appearance_fires >= 1, (
            "appearance stream never fired under photometric perturbation"
        )
        # gate-efficacy audit (r4 task 8): zero false vetoes on true loops
        _assert_no_false_place_vetoes(pipe.backend, gt_stamps, gt_pos)
        dsg = pipe.backend.get_dsg()
        est = evaluate_trajectory(
            np.asarray([a.stamp_ns for a in dsg.agents], np.int64),
            np.stack([a.t_w_b for a in dsg.agents]),
            np.asarray(gt_stamps, np.int64), np.stack(gt_pos),
        )
        odo = evaluate_trajectory(
            np.asarray(gt_stamps, np.int64),
            np.stack([np.asarray(f.t_w_c, np.float64) for f in frames]),
            np.asarray(gt_stamps, np.int64), np.stack(gt_pos),
        )
        assert odo["ate_rmse"] > 0.01, "drift injection broken"
        assert est["ate_rmse"] < odo["ate_rmse"], (est, odo)

    def test_drifted_run_closed_by_object_constellations(self, tmp_path):
        """Full pipeline with NO GT oracle and no depth-descriptor LCD:
        loop closure comes purely from scene-graph object-constellation
        matching (hydra LCD object-layer analog, uHumans2.yaml:254-307).
        Drifted odometry must be corrected by the fired LC."""
        from khronos_tpu.eval.evaluators import evaluate_trajectory

        duration, fps = 24.0, 3.0
        scene = syn.office_scene(duration=duration)
        seq = syn.SyntheticSequence(
            scene,
            syn.SyntheticSequenceConfig(
                duration=duration, fps=fps, height=60, width=80,
                fx=50.0, fy=50.0, cx=40.0, cy=30.0, n_loops=2.0,
                drift_rate=0.06,
            ),
        )
        cfg = build(
            PipelineConfig,
            {
                "active_window": {
                    "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
                    "motion_detector": {"type": "FreeSpaceMotionDetector", "min_cluster_size": 40, "grow_iterations": 12},
                    "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 20},
                    "tracker": {"type": "MaxIouTracker", "min_num_observations": 3},
                    "object_extractor": {
                        "type": "MeshObjectExtractor",
                        "min_num_observations": 3,
                        "max_frames": 8,
                        "min_dynamic_displacement": 0.8,
                    },
                },
                "backend": {
                    "lcd": {
                        "type": "SceneGraphLoopClosure",
                        "min_time_gap": 8.0,
                        "obs_window": 5.0,
                        "min_objects": 3,
                        "noise_bound": 0.4,
                        "max_registration_rms": 0.5,
                    }
                },
                "label_space": {
                    "num_classes": 7,
                    "object_labels": [2, 3, 4, 5, 6],
                    "dynamic_labels": [1],
                },
                "run_change_detection_every_n_frames": 60,
            },
        )
        pipe = KhronosPipeline(cfg, seq.camera)
        out_dir = str(tmp_path / "run")
        mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)
        frames, gt_stamps, gt_pos = [], [], []
        for i in range(seq.n_frames):
            f = seq.render_frame(i)
            Ro, to = seq.odometry_pose(i)  # drifted input poses
            frames.append(
                FrameData(
                    stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                    labels=f["labels"],
                    R_w_c=np.asarray(Ro, np.float32),
                    t_w_c=np.asarray(to, np.float32),
                )
            )
            gt_stamps.append(int(f["stamp_ns"]))
            gt_pos.append(np.asarray(f["t_gt"], np.float64))
        mgr.run(frames, None)  # no GT anywhere

        assert len(pipe.backend.loop_closures) >= 1, (
            "scene-graph LCD never fired"
        )
        dsg = pipe.backend.get_dsg()
        est = evaluate_trajectory(
            np.asarray([a.stamp_ns for a in dsg.agents], np.int64),
            np.stack([a.t_w_b for a in dsg.agents]),
            np.asarray(gt_stamps, np.int64), np.stack(gt_pos),
        )
        odo = evaluate_trajectory(
            np.asarray(gt_stamps, np.int64),
            np.stack([np.asarray(f.t_w_c, np.float64) for f in frames]),
            np.asarray(gt_stamps, np.int64), np.stack(gt_pos),
        )
        assert odo["ate_rmse"] > 0.01, "drift injection broken"
        assert est["ate_rmse"] < odo["ate_rmse"], (est, odo)
