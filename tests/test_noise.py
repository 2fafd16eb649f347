"""Sensor-noise model on the synthetic data path (r5 VERDICT task 9).

The reference's primary mode is recorded rosbags with real depth noise,
label noise, and exposure variation (uhumans2_khronos.launch.yaml:48-56 sim
bags; jackal_khronos real `mezzanine` bag); the renderer's noise model is
the first step toward earned robustness on that regime.
"""

import numpy as np
import pytest

from khronos_tpu.data import synthetic as syn


@pytest.fixture(scope="module")
def frames():
    scene = syn.office_scene()
    mk = lambda nz: syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=2.0, height=96, width=128, fx=80, fy=80, cx=64, cy=48,
            noise=nz,
        ),
    )
    noisy = mk(syn.SensorNoiseConfig())
    clean = mk(None)
    return clean.render_frame(3), noisy.render_frame(3), noisy


def test_noise_statistics_physical(frames):
    clean, noisy, _ = frames
    d0 = np.asarray(clean["depth"])
    d = np.asarray(noisy["depth"])
    l0 = np.asarray(clean["labels"])
    l = np.asarray(noisy["labels"])
    v = d0 > 0
    # dropout exists but doesn't wipe the frame
    drop = (v & (d == 0)).sum() / v.sum()
    assert 0.001 < drop < 0.25, drop
    # interior (non-edge) depth error stays in the mm-to-cm band
    err = np.abs(d - d0)[v & (d > 0)]
    assert 0.001 < np.median(err) < 0.05, np.median(err)
    # label flicker only at boundaries, small overall
    flips = (l != l0).mean()
    assert 0 < flips < 0.05, flips
    # flipped labels come from the 4-neighborhood (no invented classes)
    assert set(np.unique(l)).issubset(set(np.unique(l0)))


def test_noise_deterministic_per_frame(frames):
    _, noisy, seq = frames
    again = seq.render_frame(3)
    np.testing.assert_array_equal(
        np.asarray(noisy["depth"]), np.asarray(again["depth"])
    )
    # different frames draw different noise
    other = seq.render_frame(4)
    assert not np.array_equal(np.asarray(noisy["depth"]), np.asarray(other["depth"]))


def test_pipeline_survives_noise():
    """Mini end-to-end run under sensor noise: TSDF + mesh still form, and
    the map stays metrically sane (no collapse from flying pixels)."""
    from khronos_tpu.active_window.frame_data import FrameData
    from khronos_tpu.config import build
    from khronos_tpu.pipeline.pipeline import KhronosPipeline, PipelineConfig

    scene = syn.office_scene()
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=3.0, height=96, width=128, fx=80, fy=80, cx=64, cy=48,
            noise=syn.SensorNoiseConfig(),
        ),
    )
    cfg = build(PipelineConfig, {
        "active_window": {
            "volumetric_map": {"grid_shape": [96, 96, 32], "voxel_size": 0.1},
            "motion_detector": {"type": "FreeSpaceMotionDetector", "min_cluster_size": 50},
            "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 30},
            "tracker": {"type": "MaxIouTracker"},
            "object_extractor": {"type": "MeshObjectExtractor"},
        },
        "label_space": {"num_classes": 8, "object_labels": [2, 3, 4, 5, 6],
                        "dynamic_labels": [1]},
        "run_change_detection_every_n_frames": -1,
        "places": None,
    })
    pipe = KhronosPipeline(cfg, seq.camera)
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        pipe.process_frame(FrameData(
            stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
            labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
        ), gt_pose=(f["R_gt"], f["t_gt"]))
    pipe.finish()
    dsg = pipe.backend.get_dsg()
    verts = np.asarray(dsg.mesh.vertices)
    assert len(verts) > 500, len(verts)
    # mesh stays inside the room envelope + margin (flying pixels pruned)
    c, h = scene.room_center, scene.room_half_extents
    inside = np.all(np.abs(verts - c) <= h + 0.5, axis=1).mean()
    assert inside > 0.95, inside
