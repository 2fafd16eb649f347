"""rosbag2 ingestion: write a synthetic .db3 bag with CDR-encoded messages,
read it back through Rosbag2Dataset, and feed a frame to the fused step."""

import os
import sqlite3
import struct

import numpy as np
import pytest

from khronos_tpu.data import rosbag2 as rb


# ----------------------------------------------------------------------------
# CDR writer (test-side inverse of the module's reader)
# ----------------------------------------------------------------------------


class CdrWriter:
    def __init__(self):
        self.buf = bytearray(b"\x00\x01\x00\x00")  # CDR_LE encapsulation

    def _align(self, n):
        rel = len(self.buf) - 4
        self.buf.extend(b"\x00" * ((-rel) % n))

    def u8(self, v):
        self.buf.append(v & 0xFF)

    def u32(self, v):
        self._align(4)
        self.buf += struct.pack("<I", v)

    def i32(self, v):
        self._align(4)
        self.buf += struct.pack("<i", v)

    def f64(self, v):
        self._align(8)
        self.buf += struct.pack("<d", v)

    def string(self, s):
        b = s.encode() + b"\x00"
        self.u32(len(b))
        self.buf += b

    def raw_seq(self, b):
        self.u32(len(b))
        self.buf += b

    def header(self, stamp_ns, frame_id="cam"):
        self.i32(stamp_ns // 1_000_000_000)
        self.u32(stamp_ns % 1_000_000_000)
        self.string(frame_id)

    def done(self):
        return bytes(self.buf)


def encode_image(stamp_ns, img, encoding):
    w = CdrWriter()
    w.header(stamp_ns)
    H, W = img.shape[:2]
    w.u32(H)
    w.u32(W)
    w.string(encoding)
    w.u8(0)
    step = img.nbytes // H
    w.u32(step)
    w.raw_seq(img.tobytes())
    return w.done()


def encode_odometry(stamp_ns, t, q_wxyz):
    w = CdrWriter()
    w.header(stamp_ns)
    w.string("base")
    for v in t:
        w.f64(v)
    qw, qx, qy, qz = q_wxyz
    for v in (qx, qy, qz, qw):
        w.f64(v)
    for _ in range(36):  # pose covariance
        w.f64(0.0)
    return w.done()


def encode_camera_info(stamp_ns, H, W, fx, fy, cx, cy):
    w = CdrWriter()
    w.header(stamp_ns)
    w.u32(H)
    w.u32(W)
    w.string("plumb_bob")
    w.u32(0)  # empty d
    for v in (fx, 0, cx, 0, fy, cy, 0, 0, 1):
        w.f64(v)
    return w.done()


def write_bag(path, topics, messages):
    """topics: {name: type}; messages: [(topic, bag_ts, payload)]."""
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,"
        " serialization_format TEXT, offered_qos_profiles TEXT)"
    )
    con.execute(
        "CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,"
        " timestamp INTEGER, data BLOB)"
    )
    ids = {}
    for i, (name, typ) in enumerate(topics.items(), start=1):
        con.execute("INSERT INTO topics VALUES (?,?,?,?,?)", (i, name, typ, "cdr", ""))
        ids[name] = i
    for k, (topic, ts, payload) in enumerate(messages, start=1):
        con.execute("INSERT INTO messages VALUES (?,?,?,?)", (k, ids[topic], ts, payload))
    con.commit()
    con.close()


@pytest.fixture()
def bag_dir(tmp_path):
    H, W = 24, 32
    topics = {
        "/depth": "sensor_msgs/msg/Image",
        "/color": "sensor_msgs/msg/Image",
        "/labels": "sensor_msgs/msg/Image",
        "/odom": "nav_msgs/msg/Odometry",
        "/camera_info": "sensor_msgs/msg/CameraInfo",
    }
    msgs = []
    rng = np.random.default_rng(0)
    depths = []
    for k in range(4):
        ts = int(1e9 + k * 1e8)
        depth = np.full((H, W), 1500 + k, np.uint16)  # mm
        color = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        labels = np.full((H, W), k % 3, np.int16)
        depths.append(depth)
        msgs.append(("/depth", ts, encode_image(ts, depth, "16UC1")))
        msgs.append(("/color", ts + 1000, encode_image(ts + 1000, color, "rgb8")))
        msgs.append(("/labels", ts - 1000, encode_image(ts - 1000, labels, "16SC1")))
    for k in range(6):
        ts = int(0.9e9 + k * 1e8)
        msgs.append(("/odom", ts, encode_odometry(ts, [0.1 * k, 0.0, 0.0], [1, 0, 0, 0])))
    msgs.append(("/camera_info", int(1e9), encode_camera_info(int(1e9), H, W, 20.0, 20.0, 16.0, 12.0)))
    write_bag(str(tmp_path / "bag_0.db3"), topics, msgs)
    return str(tmp_path), depths


def encode_compressed_image(stamp_ns, payload_bytes, fmt):
    w = CdrWriter()
    w.header(stamp_ns)
    w.string(fmt)
    w.raw_seq(payload_bytes)
    return w.done()


def png_bytes(arr):
    import io

    from PIL import Image

    buf = io.BytesIO()
    mode = "I;16" if arr.dtype == np.uint16 else None
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


def jpeg_bytes(arr_bgr):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_bgr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def rot_to_quat_wxyz(R):
    """Rotation matrix -> unit quaternion (w,x,y,z)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


LABEL_PALETTE = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
     [255, 0, 255], [0, 255, 255]], np.uint8,
)


class TestCompressedImages:
    def test_compressed_decode_roundtrip(self):
        """PNG depth (compressedDepth framing), JPEG bgr color, PNG labels."""
        depth = (np.arange(24 * 32, dtype=np.uint16) % 3000).reshape(24, 32)
        # compressed_depth_image_transport: 12-byte config header + PNG
        payload = b"\x00" * 12 + png_bytes(depth)
        msg = rb.decode_compressed_image(
            encode_compressed_image(7, payload, "16UC1; compressedDepth png")
        )
        assert msg.encoding == "16UC1"
        np.testing.assert_array_equal(msg.data, depth)

        # plain PNG depth (no framing header) also decodes
        msg2 = rb.decode_compressed_image(
            encode_compressed_image(7, png_bytes(depth), "16UC1; png")
        )
        np.testing.assert_array_equal(msg2.data, depth)

        rgb = np.zeros((16, 16, 3), np.uint8)
        rgb[:, :8] = [200, 30, 40]
        bgr = rgb[..., ::-1].copy()
        msg3 = rb.decode_compressed_image(
            encode_compressed_image(9, jpeg_bytes(bgr), "rgb8; jpeg compressed bgr8")
        )
        assert msg3.encoding == "rgb8"
        # lossy codec: check away from the color boundary (ringing at col 7)
        assert np.abs(msg3.data[:, :6].astype(int) - [200, 30, 40]).max() < 12

        labels_rgb = LABEL_PALETTE[np.arange(16 * 16) % 7].reshape(16, 16, 3)
        msg4 = rb.decode_compressed_image(
            encode_compressed_image(11, png_bytes(labels_rgb), "rgb8; png")
        )
        np.testing.assert_array_equal(msg4.data, labels_rgb)

    def test_color_label_mapping_in_dataset(self, tmp_path):
        H, W = 16, 24
        label_ids = np.arange(H * W).reshape(H, W) % 7
        labels_rgb = LABEL_PALETTE[label_ids]
        depth = np.full((H, W), 2000, np.uint16)
        topics = {
            "/depth/compressed": "sensor_msgs/msg/CompressedImage",
            "/labels/compressed": "sensor_msgs/msg/CompressedImage",
            "/odom": "nav_msgs/msg/Odometry",
            "/camera_info": "sensor_msgs/msg/CameraInfo",
        }
        ts = int(1e9)
        msgs = [
            ("/depth/compressed", ts,
             encode_compressed_image(ts, b"\x00" * 12 + png_bytes(depth),
                                     "16UC1; compressedDepth png")),
            ("/labels/compressed", ts,
             encode_compressed_image(ts, png_bytes(labels_rgb), "rgb8; png")),
            ("/odom", ts - int(1e8), encode_odometry(ts - int(1e8), [0, 0, 0], [1, 0, 0, 0])),
            ("/odom", ts + int(1e8), encode_odometry(ts + int(1e8), [0, 0, 0], [1, 0, 0, 0])),
            ("/camera_info", ts, encode_camera_info(ts, H, W, 20.0, 20.0, W / 2, H / 2)),
        ]
        write_bag(str(tmp_path / "bag_0.db3"), topics, msgs)
        ds = rb.Rosbag2Dataset(
            rb.Rosbag2DatasetConfig(
                path=str(tmp_path), depth_topic="/depth/compressed",
                color_topic="/missing", label_topic="/labels/compressed",
                pose_topic="/odom", camera_info_topic="/camera_info",
                label_palette=tuple(map(tuple, LABEL_PALETTE)),
                label_palette_ids=tuple(range(7)),
            )
        )
        frames = [f for f, _ in ds]
        assert len(frames) == 1
        np.testing.assert_allclose(np.asarray(frames[0].depth), 2.0, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(frames[0].labels), label_ids)


class TestRealBagEndToEnd:
    @pytest.mark.slow
    def test_jackal_real_config_on_compressed_bag(self, tmp_path):
        """The real-data story (reference README.md:101-142): a rosbag2 with
        COMPRESSED depth/color/labels + drifting odometry (no GT oracle),
        run through configs/jackal_real.yaml — descriptor LCD + GNC
        registration must close the loop and the run must finish cleanly."""
        import os

        from khronos_tpu.config import build, load_mapping
        from khronos_tpu.data import synthetic as syn
        from khronos_tpu.pipeline.pipeline import (
            ExperimentConfig,
            ExperimentManager,
            KhronosPipeline,
            PipelineConfig,
        )

        duration, fps = 24.0, 3.0
        scene = syn.office_scene(duration=duration)
        seq = syn.SyntheticSequence(
            scene,
            syn.SyntheticSequenceConfig(
                duration=duration, fps=fps, height=60, width=80,
                fx=50.0, fy=50.0, cx=40.0, cy=30.0, n_loops=2.0,
                drift_rate=0.02,  # real odometry drifts; LCD must fix it
                # real sensors are noisy too (r5 VERDICT task 9: fold the
                # rosbag2 reader into one noisy e2e): depth^2 range noise +
                # quantization, edge jitter/dropout, label flicker
                noise=syn.SensorNoiseConfig(),
            ),
        )
        # write every rendered frame into a compressed bag with drifted odom
        topics = {
            "/depth/compressed": "sensor_msgs/msg/CompressedImage",
            "/color/compressed": "sensor_msgs/msg/CompressedImage",
            "/labels/compressed": "sensor_msgs/msg/CompressedImage",
            "/odom": "nav_msgs/msg/Odometry",
            "/camera_info": "sensor_msgs/msg/CameraInfo",
        }
        msgs = []
        gt_stamps, gt_pos = [], []
        for i in range(seq.n_frames):
            f = seq.render_frame(i)
            ts = int(f["stamp_ns"])
            depth_mm = (np.asarray(f["depth"]) * 1000).astype(np.uint16)
            color = (np.clip(np.asarray(f["color"]), 0, 1) * 255).astype(np.uint8)
            labels = np.clip(np.asarray(f["labels"]), 0, 6)
            msgs.append(("/depth/compressed", ts, encode_compressed_image(
                ts, b"\x00" * 12 + png_bytes(depth_mm), "16UC1; compressedDepth png")))
            msgs.append(("/color/compressed", ts, encode_compressed_image(
                ts, jpeg_bytes(color[..., ::-1].copy()), "rgb8; jpeg compressed bgr8")))
            msgs.append(("/labels/compressed", ts, encode_compressed_image(
                ts, png_bytes(LABEL_PALETTE[labels]), "rgb8; png")))
            # DRIFTED odometry (GT + accumulated noise, drift_rate above)
            Ro, to = seq.odometry_pose(i)
            q = rot_to_quat_wxyz(np.asarray(Ro, np.float64))
            msgs.append(("/odom", ts, encode_odometry(
                ts, [float(v) for v in np.asarray(to)], q)))
            gt_stamps.append(ts)
            gt_pos.append(np.asarray(f["t_gt"], np.float64))
        cam = seq.camera
        msgs.append(("/camera_info", gt_stamps[0], encode_camera_info(
            gt_stamps[0], cam.height, cam.width, cam.fx, cam.fy, cam.cx, cam.cy)))
        write_bag(str(tmp_path / "bag_0.db3"), topics, msgs)

        # the REAL config, overridden only for test scale + synthetic labels
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        data = load_mapping(
            [os.path.join(repo, "configs", "jackal_real.yaml")],
            [
                "pipeline.active_window.volumetric_map.grid_shape=[128,128,32]",
                "pipeline.active_window.motion_detector.max_range=5.0",
                "pipeline.active_window.object_detector.max_range=5.0",
                "pipeline.active_window.tracker.min_num_observations=3",
                "pipeline.active_window.object_extractor.min_num_observations=3",
                "pipeline.backend.lcd.min_time_gap=8.0",
                "pipeline.backend.lcd.min_descriptor_similarity=0.9",
                "pipeline.label_space.num_classes=7",
                "pipeline.label_space.object_labels=[2,3,4,5,6]",
                "pipeline.run_change_detection_every_n_frames=60",
            ],
        )
        pipe_cfg = build(PipelineConfig, data["pipeline"])
        ds = rb.Rosbag2Dataset(
            rb.Rosbag2DatasetConfig(
                path=str(tmp_path),
                depth_topic="/depth/compressed", color_topic="/color/compressed",
                label_topic="/labels/compressed", pose_topic="/odom",
                camera_info_topic="/camera_info", max_range=5.0,
                label_palette=tuple(map(tuple, LABEL_PALETTE)),
                label_palette_ids=tuple(range(7)),
            )
        )
        pipe = KhronosPipeline(pipe_cfg, ds.camera)
        out_dir = str(tmp_path / "run")
        mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, pipe_cfg)
        frames = [f for f, _ in ds]
        assert len(frames) == seq.n_frames
        mgr.run(frames, None)  # NO GT oracle anywhere

        from khronos_tpu.utils.logging import ExperimentLogger

        assert ExperimentLogger.has_flag(out_dir, "Experiment Finished Cleanly")
        assert len(pipe.backend.loop_closures) >= 1, "descriptor LCD never fired"
        assert pipe.backend.num_optimizations >= 1
        # the loop closure must actually help: optimized ATE < odometry ATE
        from khronos_tpu.eval.evaluators import evaluate_trajectory

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


class TestRosbag2:
    def test_topic_types_and_decode(self, bag_dir):
        root, depths = bag_dir
        reader = rb.Rosbag2Reader(root)
        types = reader.topic_types()
        assert types["/depth"] == "sensor_msgs/msg/Image"
        ts, raw = next(iter(reader.messages("/depth")))
        img = rb.decode_image(raw)
        assert img.encoding == "16UC1" and img.data.shape == (24, 32)
        np.testing.assert_array_equal(img.data, depths[0])

    def test_dataset_frames(self, bag_dir):
        root, depths = bag_dir
        ds = rb.Rosbag2Dataset(
            rb.Rosbag2DatasetConfig(
                path=root, depth_topic="/depth", color_topic="/color",
                label_topic="/labels", pose_topic="/odom",
                camera_info_topic="/camera_info", depth_scale=0.001,
            )
        )
        assert len(ds) == 4
        assert ds.camera.fx == 20.0 and ds.camera.height == 24
        frames = [f for f, _ in ds]
        assert len(frames) == 4
        f0 = frames[0]
        np.testing.assert_allclose(np.asarray(f0.depth), 1.5, atol=1e-3)
        assert np.asarray(f0.labels).max() <= 2
        assert f0.color.shape == (24, 32, 3)
        # pose interpolation: depth stamp 1.0e9 is between odom 0.9/1.0e9
        np.testing.assert_allclose(f0.t_w_c, [0.1, 0, 0], atol=1e-6)

    def test_feeds_active_window(self, bag_dir):
        root, _ = bag_dir
        from khronos_tpu.active_window.active_window import ActiveWindow, ActiveWindowConfig
        from khronos_tpu.pipeline.pipeline import LabelSpaceConfig
        from khronos_tpu.config import build

        ds = rb.Rosbag2Dataset(
            rb.Rosbag2DatasetConfig(
                path=root, depth_topic="/depth", color_topic="/color",
                pose_topic="/odom", camera_info_topic="/camera_info",
            )
        )
        cfg = build(ActiveWindowConfig, {"volumetric_map": {"grid_shape": [32, 32, 16]}})
        ls = LabelSpaceConfig(num_classes=3, object_labels=[2]).create()
        aw = ActiveWindow(cfg, ds.camera, ls)
        for frame, _ in ds:
            aw.spin_once(frame)
        assert float(np.asarray(aw.state.weight).sum()) > 0
