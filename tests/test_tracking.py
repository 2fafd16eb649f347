"""MaxIouTracker unit tests: IoU modes (voxels / bounding_box / pixels) and
greedy association orders (global / assign_cluster / assign_track),
reference max_iou_tracker.cpp:323-332, 551-593."""

import numpy as np
import pytest

from khronos_tpu.active_window.frame_data import FrameData
from khronos_tpu.active_window.motion_detection import MeasurementCluster
from khronos_tpu.active_window.tracking import MaxIouTracker, MaxIouTrackerConfig
from khronos_tpu.geometry.camera import Camera


def make_frame(stamp_s, sem_clusters):
    f = FrameData(
        stamp_ns=int(stamp_s * 1e9),
        depth=np.zeros((4, 4), np.float32),
        color=np.zeros((4, 4, 3), np.float32),
        labels=np.zeros((4, 4), np.int32),
        R_w_c=np.eye(3, dtype=np.float32),
        t_w_c=np.zeros(3, np.float32),
    )
    f.semantic_clusters = sem_clusters
    f.dynamic_clusters = []
    return f


def cluster(cid, center, half=0.3, cat=2, n=50):
    center = np.asarray(center, np.float32)
    return MeasurementCluster(
        cluster_id=cid, num_pixels=n, num_voxels=n,
        centroid=center, bbox_min=center - half, bbox_max=center + half,
        category_id=cat,
    )


def blob(center, n=60, r=0.25, seed=0):
    rng = np.random.default_rng(seed)
    return np.asarray(center) + rng.uniform(-r, r, (n, 3))


def run_two_frames(cfg, c0_center, c1_center):
    tr = MaxIouTracker(cfg)
    tr.set_camera(Camera(48, 64, 40.0, 40.0, 32.0, 24.0))
    pts0 = {1: blob(c0_center)}
    tr.process(make_frame(0.0, [cluster(1, c0_center)]), cluster_points=({}, pts0))
    pts1 = {1: blob(c1_center, seed=1)}
    tr.process(make_frame(0.5, [cluster(1, c1_center)]), cluster_points=({}, pts1))
    return tr


class TestIouModes:
    @pytest.mark.parametrize("mode", ["voxels", "bounding_box", "pixels"])
    def test_same_place_associates(self, mode):
        tr = run_two_frames(
            MaxIouTrackerConfig(track_by=mode), [0.3, 0.1, 2.0], [0.33, 0.1, 2.0]
        )
        assert len(tr.tracks) == 1
        assert len(tr.tracks[0].observations) == 2

    @pytest.mark.parametrize("mode", ["voxels", "bounding_box", "pixels"])
    def test_far_apart_splits(self, mode):
        tr = run_two_frames(
            MaxIouTrackerConfig(track_by=mode), [0.3, 0.1, 2.0], [-1.0, 0.1, 2.0]
        )
        assert len(tr.tracks) == 2


class TestAssignmentStrategy:
    def _two_tracks_two_clusters(self, strategy):
        """Track A overlaps clusters X (iou high) and Y (iou low); track B
        overlaps only X (iou mid). Greedy orders resolve the conflict
        differently."""
        cfg = MaxIouTrackerConfig(
            track_by="bounding_box", assignment_strategy=strategy,
            min_semantic_iou=0.01,
        )
        tr = MaxIouTracker(cfg)
        # frame 0: two tracks at distinct spots
        a, b = [0.0, 0.0, 1.0], [1.0, 0.0, 1.0]
        f0 = make_frame(0.0, [cluster(1, a), cluster(2, b)])
        tr.process(f0, cluster_points=({}, {1: blob(a), 2: blob(b)}))
        assert len(tr.tracks) == 2
        # frame 1: one cluster halfway (overlaps both), one far-off new one
        mid = [0.45, 0.0, 1.0]
        f1 = make_frame(0.5, [cluster(3, mid, half=0.8)])
        tr.process(f1, cluster_points=({}, {3: blob(mid)}))
        return tr

    @pytest.mark.parametrize("strategy", ["global", "assign_cluster", "assign_track"])
    def test_each_strategy_assigns_once(self, strategy):
        tr = self._two_tracks_two_clusters(strategy)
        # the shared cluster must land on exactly one track
        n_obs = sorted(len(t.observations) for t in tr.tracks)
        assert n_obs == [1, 2]

    def test_invalid_strategy_rejected(self):
        with pytest.raises(ValueError):
            MaxIouTrackerConfig(assignment_strategy="bogus").check()
