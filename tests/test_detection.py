import jax.numpy as jnp
import numpy as np
import pytest

from khronos_tpu.active_window.frame_data import FrameData
from khronos_tpu.active_window.motion_detection import (
    FreeSpaceMotionDetector,
    FreeSpaceMotionDetectorConfig,
)
from khronos_tpu.active_window.object_detection import (
    ConnectedSemantics,
    ConnectedSemanticsConfig,
    LabelSpace,
)
from khronos_tpu.data import synthetic as syn
from khronos_tpu.geometry.camera import Camera
from khronos_tpu.map import active_volume as av


def make_seq(scene, duration=10.0, fps=5.0):
    return syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=duration,
            fps=fps,
            height=120,
            width=160,
            fx=100.0,
            fy=100.0,
            cx=80.0,
            cy=60.0,
        ),
    )


def to_frame(f):
    return FrameData(
        stamp_ns=f["stamp_ns"],
        depth=f["depth"],
        color=f["color"],
        labels=f["labels"],
        R_w_c=f["R_w_c"],
        t_w_c=f["t_w_c"],
    )


def volume_for_scene(scene):
    cfg = av.VolumeConfig(grid_shape=(128, 128, 32), voxel_size=0.1, truncation_distance=0.2, temporal_buffer=0.4)
    state = av.create(cfg, origin_xyz=np.array([-6.4, -6.4, -0.2]))
    return cfg, state


def integrate(vol_cfg, cam, state, frame, t, mask=None):
    if mask is None:
        mask = jnp.zeros(frame.depth.shape, jnp.bool_)
    return av.integrate_frame(
        vol_cfg,
        cam,
        state,
        frame.depth,
        frame.color,
        frame.labels,
        mask,
        frame.R_w_c,
        frame.t_w_c,
        jnp.float32(t),
    )


class TestMotionDetection:
    def test_moving_human_clustered(self):
        """A walking human entering established free space must produce one
        dynamic cluster covering its pixels; static walls must not."""
        scene = syn.office_scene(duration=20.0)
        seq = make_seq(scene, duration=20.0, fps=5.0)
        vol_cfg, state = volume_for_scene(scene)
        det = FreeSpaceMotionDetectorConfig(min_cluster_size=80, grow_iterations=12).create(
            vol_cfg, seq.camera
        )
        found_human_cluster = False
        correct_pixels = 0
        wrong_pixels = 0
        for i in range(40):
            f = seq.render_frame(i)
            frame = to_frame(f)
            t = f["t"]
            clusters = det.process(state, frame)
            dyn = np.asarray(frame.dynamic_image)
            labels = np.asarray(f["labels"])
            if clusters and i > 12:
                found_human_cluster = True
                correct_pixels += int(((dyn > 0) & (labels == syn.HUMAN)).sum())
                wrong_pixels += int(((dyn > 0) & (labels != syn.HUMAN)).sum())
            mask = frame.dynamic_image > 0
            state = integrate(vol_cfg, seq.camera, state, frame, t, mask)
        assert found_human_cluster, "no dynamic cluster ever detected"
        assert correct_pixels > 500
        # dynamic pixels should mostly be humans
        assert wrong_pixels < 0.3 * (correct_pixels + wrong_pixels)

    def test_static_scene_no_clusters(self):
        scene = syn.apartment_scene()
        seq = make_seq(scene, duration=8.0, fps=5.0)
        vol_cfg, state = volume_for_scene(scene)
        det = FreeSpaceMotionDetectorConfig(min_cluster_size=80).create(vol_cfg, seq.camera)
        n_clusters = 0
        for i in range(30):
            f = seq.render_frame(i)
            frame = to_frame(f)
            clusters = det.process(state, frame)
            n_clusters += len(clusters)
            state = integrate(vol_cfg, seq.camera, state, frame, f["t"])
        assert n_clusters == 0


class TestObjectDetection:
    def test_semantic_clusters_found(self):
        scene = syn.apartment_scene()
        seq = make_seq(scene, duration=8.0, fps=5.0)
        vol_cfg, state = volume_for_scene(scene)
        ls = syn.default_label_space()
        det = ConnectedSemanticsConfig(min_cluster_size=40).create(vol_cfg, seq.camera, ls)
        seen_categories = set()
        for i in range(16):
            f = seq.render_frame(i)
            frame = to_frame(f)
            clusters = det.process(state, frame)
            obj = np.asarray(frame.object_image)
            labels = np.asarray(f["labels"])
            for c in clusters:
                seen_categories.add(c.category_id)
                assert c.num_pixels >= 40
            # object_image pixels must carry object-class labels
            lut = ls.is_object_lut()
            on = obj > 0
            if on.any():
                lab_on = labels[on]
                assert (lut[np.clip(lab_on, 0, len(lut) - 1)] & (lab_on >= 0)).mean() > 0.99
            state = integrate(vol_cfg, seq.camera, state, frame, f["t"])
        # table, ball(BOXLBL), shelf all get seen during the orbit
        assert syn.TABLE in seen_categories
        assert syn.SHELF in seen_categories

    def test_background_not_clustered(self):
        scene = syn.apartment_scene()
        seq = make_seq(scene, duration=8.0, fps=5.0)
        vol_cfg, state = volume_for_scene(scene)
        ls = syn.default_label_space()
        det = ConnectedSemanticsConfig(min_cluster_size=40).create(vol_cfg, seq.camera, ls)
        f = seq.render_frame(0)
        frame = to_frame(f)
        det.process(state, frame)
        obj = np.asarray(frame.object_image)
        labels = np.asarray(f["labels"])
        assert (obj[labels == 0] == 0).all()

    def test_two_instances_same_class_distinct(self):
        """Two separated tables must produce two clusters, not one."""
        scene = syn.office_scene(duration=10.0)
        seq = make_seq(scene, duration=10.0, fps=5.0)
        vol_cfg, state = volume_for_scene(scene)
        ls = syn.default_label_space()
        det = ConnectedSemanticsConfig(min_cluster_size=40).create(vol_cfg, seq.camera, ls)
        max_tables_in_frame = 0
        for i in range(50):
            f = seq.render_frame(i)
            frame = to_frame(f)
            clusters = det.process(state, frame)
            n_tables = sum(1 for c in clusters if c.category_id == syn.TABLE)
            max_tables_in_frame = max(max_tables_in_frame, n_tables)
        # the two tables are far apart; at most one is in view at a time in
        # this orbit — check at least that ids are distinct within a frame
        ids = [c.cluster_id for c in clusters]
        assert len(ids) == len(set(ids))
        assert max_tables_in_frame >= 1


class TestDetectionStride:
    def test_strided_detection_matches_full_res(self):
        """detection_stride=2 must find the same object cluster (same centroid
        within 5 cm, upsampled mask IoU > 0.8) as full-res detection."""
        import jax.numpy as jnp

        from khronos_tpu.active_window import fused_step as fs
        from khronos_tpu.map import active_volume as av

        H, W = 96, 128
        cfg = av.VolumeConfig(grid_shape=(64, 64, 32), voxel_size=0.1)
        cam = Camera(height=H, width=W, fx=80.0, fy=80.0, cx=64.0, cy=48.0, max_range=5.0)
        ls = syn.default_label_space()
        md = FreeSpaceMotionDetectorConfig(min_cluster_size=40)
        od = ConnectedSemanticsConfig(min_cluster_size=40)

        depth = np.full((H, W), 1.2, np.float32)
        labels = np.zeros((H, W), np.int32)
        labels[30:60, 40:80] = syn.TABLE
        color = np.full((H, W, 3), 0.5, np.float32)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)

        outs = {}
        for s in (1, 2):
            step = fs.make_frame_step(cfg, cam, md, od, ls, donate=False, detection_stride=s)
            state = av.create(cfg, origin_xyz=np.array([-3.2, -3.2, -1.6]))
            _, _, oimg, packed = step(
                state, jnp.asarray(depth), jnp.asarray(color), jnp.asarray(labels),
                R, t, jnp.float32(0.5),
            )
            _, sem_c, _, _ = fs.unpack_stats(np.asarray(packed))
            outs[s] = (np.asarray(oimg), sem_c)

        (o1, c1), (o2, c2) = outs[1], outs[2]
        assert o1.shape == o2.shape == (H, W)
        assert len(c1) == len(c2) == 1
        assert c1[0].category_id == c2[0].category_id == syn.TABLE
        np.testing.assert_allclose(c1[0].centroid, c2[0].centroid, atol=0.05)
        m1, m2 = o1 > 0, o2 > 0
        iou = (m1 & m2).sum() / (m1 | m2).sum()
        assert iou > 0.8, f"upsampled object mask IoU {iou:.2f}"
        # detection-res pixel counts scale ~1/4
        assert abs(c2[0].num_pixels * 4 - c1[0].num_pixels) < 0.2 * c1[0].num_pixels
