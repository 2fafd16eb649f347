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
