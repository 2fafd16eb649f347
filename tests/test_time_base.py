"""Timestamp robustness: epoch-scale stamps and long-horizon sequences.

Round-3 task 1 (VERDICT.md): the reference operates on raw uint64 ns and
bins change-detection evidence over the evidence's own range
(ray_change_detector.cpp:66-133); real bag replays carry epoch stamps
(README.md:101-142). Here: (a) a run whose stamps start at ~1.7e18 ns must
produce IDENTICAL output to the same run with small stamps, and (b) a
20+ minute sequence must still localize a mid-run removal to within the
temporal resolution (the old fixed [0, num_bins * temporal_resolution]
horizon clipped everything past ~5 minutes into the last bin).
"""

import numpy as np
import pytest

from khronos_tpu.changes.change_state import ABSENT, UNOBSERVED
from khronos_tpu.changes.detectors import (
    SequentialChangeDetector,
    SequentialChangeDetectorConfig,
)
from khronos_tpu.stm.scene_graph import SceneGraph
from tests.test_changes import make_agents, make_mesh, make_object

EPOCH_NS = 1_700_000_000_000_000_000  # ~2023-11 epoch, ns


class TestLongHorizon:
    def make_long_scene(self, t_shift_s: float = 0.0):
        """22-minute sequence: object surface present [0, 800] s, wall behind
        it observed [810, 1320] s (absence evidence through the object's old
        position), agent orbiting the whole time."""
        dsg = SceneGraph()
        dsg.agents = make_agents([0, 0, 1], t_shift_s + np.arange(0, 1321, 2.0))
        verts = [[4.0, 0, 1], [4.0, 0.1, 1], [5.0, 0, 1], [5.0, 0.1, 1], [0.0, 3.0, 1]]
        first = t_shift_s + np.asarray([0.0, 0.0, 810.0, 810.0, 0.0])
        last = t_shift_s + np.asarray([800.0, 800.0, 1320.0, 1320.0, 1320.0])
        dsg.mesh = make_mesh(verts, first, last)
        dsg.objects[1] = make_object(
            1, [4.0, 0.05, 1], t_shift_s + 0.0, t_shift_s + 800.0,
            mesh_pts=[[4.0, 0, 1], [4.0, 0.1, 1]],
        )
        return dsg

    def _config(self):
        cfg = SequentialChangeDetectorConfig()
        cfg.verificator.ray_policy = "All"
        cfg.verificator.temporal_resolution = 5.0
        cfg.verificator.num_bins = 64  # floor; span-derived count takes over
        cfg.detector.window_size = 1
        return cfg

    def test_mid_run_removal_localized(self):
        """Removal at t=800-810 s in a 1320 s sequence must be localized to
        +- temporal_resolution (round-3 task 1 done criterion b)."""
        scd = SequentialChangeDetector(self._config())
        dsg = self.make_long_scene()
        changes = scd.detect_changes(dsg)
        # evidence span 1320 s / 5 s >> the 64-bin floor
        assert scd.verificator.active_num_bins >= 264
        oc = changes.object_changes[1]
        assert oc.last_absent_ns > 0, "removal not detected at long horizon"
        t_abs = oc.last_absent_ns * 1e-9
        # earliest possible absence evidence: wall first observed at 810 s
        assert abs(t_abs - 810.0) <= 5.0 + 2.5, t_abs
        # background: old object-surface vertices absent, wall persists
        assert changes.background_states[0] == ABSENT
        assert changes.background_states[1] == ABSENT
        assert changes.background_states[2] != ABSENT
        assert changes.background_states[4] == UNOBSERVED

    def test_epoch_stamps_match_rebased(self):
        """The same long scene shifted to epoch time must produce the same
        changes (float32 would quantize 1.7e9 s to ~128 s without the
        library-relative time base)."""
        base = SequentialChangeDetector(self._config())
        ch0 = base.detect_changes(self.make_long_scene())
        shift_s = EPOCH_NS * 1e-9
        sh = SequentialChangeDetector(self._config())
        ch1 = sh.detect_changes(self.make_long_scene(t_shift_s=shift_s))
        np.testing.assert_array_equal(ch0.background_states, ch1.background_states)
        oc0, oc1 = ch0.object_changes[1], ch1.object_changes[1]
        for f in ("first_absent_ns", "first_persistent_ns",
                  "last_persistent_ns", "last_absent_ns"):
            a, b = getattr(oc0, f), getattr(oc1, f)
            if a < 0 or b < 0:
                assert a == b == -1 or (a < 0 and b < 0), (f, a, b)
            else:
                # identical up to f64 rounding of epoch-scale seconds (~256 ns)
                assert abs((b - EPOCH_NS) - a) <= 4096, (f, a, b)


@pytest.fixture(scope="module")
def epoch_pair(tmp_path_factory):
    """Run one compact office pipeline twice: stamps starting near 0 vs
    shifted by ~1.7e18 ns (epoch). Returns both pipelines + the shift."""
    from khronos_tpu.active_window.frame_data import FrameData
    from khronos_tpu.config import build
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.pipeline.pipeline import KhronosPipeline, PipelineConfig

    duration, fps = 10.0, 4.0
    scene = syn.office_scene(duration=duration)
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=duration, fps=fps, height=48, width=64,
            fx=40.0, fy=40.0, cx=32.0, cy=24.0, n_loops=1.0,
        ),
    )
    cfg_dict = {
        "active_window": {
            "volumetric_map": {"grid_shape": [96, 96, 32], "voxel_size": 0.12},
            "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
        },
        "backend": {"lcd": {"type": None}},
        "label_space": {
            "num_classes": 7,
            "object_labels": [2, 3, 4, 5, 6],
            "dynamic_labels": [1],
        },
        "run_change_detection_every_n_frames": 16,
        "change_detection": {
            # 1.7 s bins: frame stamps (k * 0.25 s) never land on a bin edge,
            # so epoch-scale f64 rounding cannot flip a bin assignment
            "verificator": {"ray_policy": "Middle", "temporal_resolution": 1.7},
            "detector": {"window_size": 2},
        },
        "places": None,
    }

    frames = [seq.render_frame(i) for i in range(seq.n_frames)]

    def run(shift_ns: int) -> KhronosPipeline:
        pipe = KhronosPipeline(build(PipelineConfig, cfg_dict), seq.camera)
        for f in frames:
            pipe.process_frame(
                FrameData(
                    stamp_ns=int(f["stamp_ns"]) + shift_ns, depth=f["depth"],
                    color=f["color"], labels=f["labels"],
                    R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
                )
            )
        pipe.finish()
        return pipe

    return run(0), run(EPOCH_NS), EPOCH_NS


class TestEpochPipeline:
    """Round-3 task 1 done criterion (a): epoch-ns stamps through the FULL
    pipeline produce identical output to the near-zero-stamp run."""

    def test_time_base_recorded(self, epoch_pair):
        p0, p1, shift = epoch_pair
        assert p0.t0_ns == 0
        assert p1.t0_ns == shift

    def test_mesh_identical(self, epoch_pair):
        p0, p1, shift = epoch_pair
        m0 = p0.backend.get_dsg().mesh
        m1 = p1.backend.get_dsg().mesh
        assert m0.num_vertices > 100
        # identical up to f64 rounding of epoch-scale interpolation weights
        np.testing.assert_allclose(m0.vertices, m1.vertices, atol=1e-5)
        np.testing.assert_array_equal(m0.first_seen_ns + shift, m1.first_seen_ns)
        np.testing.assert_array_equal(m0.last_seen_ns + shift, m1.last_seen_ns)

    def test_changes_identical(self, epoch_pair):
        p0, p1, shift = epoch_pair
        ch0 = p0.change_detector.changes
        ch1 = p1.change_detector.changes
        np.testing.assert_array_equal(ch0.background_states, ch1.background_states)
        assert set(ch0.object_changes) == set(ch1.object_changes)
        for nid, oc0 in ch0.object_changes.items():
            oc1 = ch1.object_changes[nid]
            for f in ("first_absent_ns", "first_persistent_ns",
                      "last_persistent_ns", "last_absent_ns"):
                a, b = getattr(oc0, f), getattr(oc1, f)
                if a < 0:
                    assert b < 0, (nid, f, a, b)
                else:
                    assert abs((b - shift) - a) <= 4096, (nid, f, a, b)

    def test_objects_identical(self, epoch_pair):
        p0, p1, shift = epoch_pair
        o0 = p0.backend.get_dsg().objects
        o1 = p1.backend.get_dsg().objects
        assert set(o0) == set(o1)
        for nid in o0:
            np.testing.assert_allclose(
                o0[nid].position(), o1[nid].position(), atol=1e-5
            )
            assert abs((o1[nid].first_observed_ns[0] - shift)
                       - o0[nid].first_observed_ns[0]) <= 4096
