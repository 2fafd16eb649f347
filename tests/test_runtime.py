"""Native runtime: stage executor (threads + bounded queues) and the async
staged pipeline — the TPU-native answer to hydra's module spin threads /
PipelineQueues and the detached change-detection thread (SURVEY.md §2.7)."""

import threading
import time

import numpy as np
import pytest

from khronos_tpu import native


class TestExecutor:
    def test_native_available(self):
        assert native.available(), "native library must build in CI image"

    def test_fifo_ordering_single_worker(self):
        seen = []

        def s0(i):
            seen.append(i)

        ex = native.make_pipeline_executor([s0], capacity=8)
        for i in range(100):
            ex.push(0, i)
        ex.drain()
        ex.stop()
        ex.close()
        assert seen == list(range(100))

    def test_stage_chaining_and_conditional_fanout(self):
        lock = threading.Lock()
        got = {"a": [], "b": []}

        def s0(i):
            with lock:
                got["a"].append(i)
            if i % 3 == 0:
                ex.push(1, i)

        def s1(i):
            with lock:
                got["b"].append(i)

        ex = native.make_pipeline_executor([s0, s1], capacity=4)
        for i in range(30):
            ex.push(0, i)
        ex.drain()
        ex.stop()
        ex.close()
        assert sorted(got["a"]) == list(range(30))
        assert sorted(got["b"]) == [i for i in range(30) if i % 3 == 0]

    def test_stages_overlap(self):
        """Two stages of sleepy work must pipeline, not serialize."""

        def s0(i):
            time.sleep(0.005)
            ex.push(1, i)

        def s1(i):
            time.sleep(0.005)

        ex = native.make_pipeline_executor([s0, s1], capacity=4)
        t0 = time.perf_counter()
        for i in range(40):
            ex.push(0, i)
        ex.drain()
        dt = time.perf_counter() - t0
        ex.stop()
        ex.close()
        # serial: 40 * 0.01 = 0.4 s; pipelined ~0.2 s + overhead
        assert dt < 0.35, f"stages did not overlap: {dt:.3f}s"

    def test_backpressure_bounded_queue(self):
        release = threading.Event()

        def slow(i):
            release.wait(timeout=5.0)

        ex = native.make_pipeline_executor([slow], capacity=2)
        assert ex.push(0, 0)  # taken by the worker
        time.sleep(0.05)
        assert ex.push(0, 1)
        assert ex.push(0, 2)
        # queue now full (capacity 2): non-blocking push must fail
        assert not ex.push(0, 3, block=False)
        release.set()
        ex.drain()
        ex.stop()
        ex.close()

    def test_error_propagation(self):
        def bad(i):
            raise RuntimeError(f"stage failed on {i}")

        ex = native.make_pipeline_executor([bad])
        ex.push(0, 7)
        with pytest.raises(RuntimeError, match="stage failed"):
            ex.drain()
        ex.stop()
        ex.close()

    def test_counters(self):
        def s0(i):
            pass

        ex = native.make_pipeline_executor([s0], capacity=16)
        for i in range(25):
            ex.push(0, i)
        ex.drain()
        assert ex.processed(0) == 25
        ex.stop()
        ex.close()


def _make_small_run(tmp_path, name, async_stages):
    from khronos_tpu.active_window.frame_data import FrameData
    from khronos_tpu.config import build
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.pipeline.pipeline import (
        ExperimentConfig,
        ExperimentManager,
        KhronosPipeline,
        PipelineConfig,
    )

    duration, fps = 10.0, 3.0
    scene = syn.office_scene(duration=duration)
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=duration, fps=fps, height=64, width=96,
            fx=60.0, fy=60.0, cx=48.0, cy=32.0, n_loops=1.0,
        ),
    )
    cfg = build(
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
    pipe = KhronosPipeline(cfg, seq.camera)
    out = str(tmp_path / name)
    mgr = ExperimentManager(ExperimentConfig(output_dir=out), pipe, cfg)
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
    mgr.run(frames, gts, async_stages=async_stages)
    return pipe, out


class TestAsyncPipeline:
    def test_async_matches_sync(self, tmp_path):
        """The staged (threaded) run must produce the same map as inline."""
        pipe_sync, _ = _make_small_run(tmp_path, "sync", async_stages=False)
        pipe_async, out = _make_small_run(tmp_path, "async", async_stages=True)

        assert pipe_async.frame_count == pipe_sync.frame_count
        assert pipe_async.map.num_snapshots == pipe_sync.map.num_snapshots

        dsg_s = pipe_sync.map.snapshots[-1]
        dsg_a = pipe_async.map.snapshots[-1]
        assert len(dsg_a.mesh.vertices) == len(dsg_s.mesh.vertices)
        np.testing.assert_allclose(
            np.sort(dsg_a.mesh.vertices, axis=0),
            np.sort(dsg_s.mesh.vertices, axis=0),
            atol=1e-5,
        )
        assert set(dsg_a.objects) == set(dsg_s.objects)
        assert len(dsg_a.agents) == len(dsg_s.agents)

        import os

        assert os.path.exists(os.path.join(out, "final.4dmap.npz"))
