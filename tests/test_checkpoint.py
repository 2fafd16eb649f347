"""Live checkpoint/resume: a run interrupted mid-sequence and resumed from
the checkpoint must produce the same map as an uninterrupted run (the
reference cannot do this — a crash loses in-memory state, SURVEY.md §5)."""

import numpy as np
import pytest

from khronos_tpu.active_window.frame_data import FrameData
from khronos_tpu.config import build
from khronos_tpu.data import synthetic as syn
from khronos_tpu.pipeline import checkpoint as ckpt
from khronos_tpu.pipeline.pipeline import KhronosPipeline, PipelineConfig


DURATION, FPS = 10.0, 3.0


def _frames():
    scene = syn.office_scene(duration=DURATION)
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=DURATION, fps=FPS, height=64, width=96,
            fx=60.0, fy=60.0, cx=48.0, cy=32.0, n_loops=1.0,
        ),
    )
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
    return seq, frames, gts


def _config():
    return build(
        PipelineConfig,
        {
            "active_window": {
                "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.12},
            },
            "label_space": {
                "num_classes": 7,
                "object_labels": [2, 3, 4, 5, 6],
                "dynamic_labels": [1],
            },
            "run_change_detection_every_n_frames": 10,
        },
    )


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    seq, frames, gts = _frames()
    cut = len(frames) // 2

    # uninterrupted reference run
    pipe_ref = KhronosPipeline(_config(), seq.camera)
    for f, g in zip(frames, gts):
        pipe_ref.process_frame(f, gt_pose=g)
    pipe_ref.finish()

    # interrupted run: process half, checkpoint, restore, continue
    ck_dir = str(tmp_path_factory.mktemp("ckpt"))
    pipe_a = KhronosPipeline(_config(), seq.camera)
    for f, g in zip(frames[:cut], gts[:cut]):
        pipe_a.process_frame(f, gt_pose=g)
    pipe_a.checkpoint(ck_dir)
    del pipe_a  # "crash"

    pipe_b = KhronosPipeline.restore(ck_dir)
    assert pipe_b.frame_count == cut
    for f, g in zip(frames[cut:], gts[cut:]):
        pipe_b.process_frame(f, gt_pose=g)
    pipe_b.finish()
    return pipe_ref, pipe_b


class TestCheckpointResume:
    def test_frame_count_and_snapshots(self, runs):
        pipe_ref, pipe_res = runs
        assert pipe_res.frame_count == pipe_ref.frame_count
        assert pipe_res.map.num_snapshots == pipe_ref.map.num_snapshots

    def test_mesh_identical(self, runs):
        pipe_ref, pipe_res = runs
        m_ref = pipe_ref.map.snapshots[-1].mesh
        m_res = pipe_res.map.snapshots[-1].mesh
        assert len(m_res.vertices) == len(m_ref.vertices)
        np.testing.assert_allclose(
            np.sort(m_res.vertices, axis=0), np.sort(m_ref.vertices, axis=0), atol=1e-4
        )

    def test_objects_and_agents_identical(self, runs):
        pipe_ref, pipe_res = runs
        dsg_ref = pipe_ref.map.snapshots[-1]
        dsg_res = pipe_res.map.snapshots[-1]
        assert set(dsg_res.objects) == set(dsg_ref.objects)
        assert len(dsg_res.agents) == len(dsg_ref.agents)
        for oid in dsg_ref.objects:
            np.testing.assert_allclose(
                dsg_res.objects[oid].position(), dsg_ref.objects[oid].position(),
                atol=1e-4,
            )

    def test_change_evidence_preserved(self, runs):
        pipe_ref, pipe_res = runs
        ch_ref = pipe_ref.change_detector.changes
        ch_res = pipe_res.change_detector.changes
        assert set(ch_res.object_changes) == set(ch_ref.object_changes)

    def test_checkpoint_exists_api(self, tmp_path):
        assert not ckpt.exists(str(tmp_path))

    def test_manager_periodic_checkpoint(self, tmp_path):
        from khronos_tpu.pipeline.pipeline import ExperimentConfig, ExperimentManager

        seq, frames, gts = _frames()
        pipe = KhronosPipeline(_config(), seq.camera)
        out = str(tmp_path / "run")
        mgr = ExperimentManager(
            ExperimentConfig(output_dir=out, checkpoint_every_n_frames=10), pipe
        )
        mgr.run(frames[:12], gts[:12])
        import os

        assert ckpt.exists(os.path.join(mgr.output_dir, "checkpoint"))
        restored = KhronosPipeline.restore(os.path.join(mgr.output_dir, "checkpoint"))
        assert restored.frame_count == 10


class TestCrashRecovery:
    def test_crash_writes_resumable_checkpoint(self, tmp_path):
        """An exception mid-run must leave a [FLAG]-logged crash checkpoint
        that resumes and finishes cleanly."""
        import os

        from khronos_tpu.pipeline.pipeline import ExperimentConfig, ExperimentManager
        from khronos_tpu.utils.logging import ExperimentLogger

        seq, frames, gts = _frames()
        cut = len(frames) // 2

        class Boom(RuntimeError):
            pass

        def poisoned():
            for i, f in enumerate(frames):
                if i == cut:
                    raise Boom("sensor died")
                yield f

        pipe = KhronosPipeline(_config(), seq.camera)
        mgr = ExperimentManager(
            ExperimentConfig(output_dir=str(tmp_path / "crash")), pipe, _config()
        )
        with pytest.raises(Boom):
            mgr.run(poisoned(), gts)
        crash_dir = os.path.join(mgr.output_dir, "checkpoint_crash")
        assert os.path.isdir(crash_dir)
        assert ExperimentLogger.has_flag(mgr.output_dir, "Experiment Crashed")

        pipe2 = KhronosPipeline.restore(crash_dir)
        assert pipe2.frame_count == cut
        for f, g in zip(frames[cut:], gts[cut:]):
            pipe2.process_frame(f, gt_pose=g)
        pipe2.finish()
        assert pipe2.frame_count == len(frames)
        assert pipe2.map.num_snapshots >= 1
