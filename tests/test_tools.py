"""CLI, datasets, viewer export, plotting, and multi-device sharding tests."""

import json
import os

import numpy as np
import pytest


class TestDatasets:
    def test_synthetic_dataset_iterates(self):
        from khronos_tpu.data.datasets import SyntheticDataset

        ds = SyntheticDataset(scene_name="apartment", duration=2.0, fps=2.0, height=60, width=80)
        frames = list(ds)
        assert len(frames) == len(ds) == 4
        frame, gt = frames[0]
        assert frame.depth.shape == (60, 80)
        assert gt is not None

    def test_directory_dataset_roundtrip(self, tmp_path):
        from khronos_tpu.data.datasets import DirectoryDataset

        root = tmp_path / "ds"
        (root / "frames").mkdir(parents=True)
        intr = {"height": 4, "width": 6, "fx": 5.0, "fy": 5.0, "cx": 3.0, "cy": 2.0,
                "depth_scale": 0.001, "max_range": 5.0}
        (root / "intrinsics.json").write_text(json.dumps(intr))
        with open(root / "poses.csv", "w") as fh:
            fh.write("stamp_ns,tx,ty,tz,qw,qx,qy,qz\n")
            fh.write("1000,1.0,2.0,3.0,1.0,0.0,0.0,0.0\n")
        np.savez(root / "frames" / "1000.npz",
                 depth=np.full((4, 6), 2000, np.uint16),
                 color=np.full((4, 6, 3), 128, np.uint8),
                 labels=np.ones((4, 6), np.int16))
        ds = DirectoryDataset(str(root))
        assert len(ds) == 1
        frame, gt = next(iter(ds))
        assert float(frame.depth[0, 0]) == pytest.approx(2.0)
        assert float(frame.color[0, 0, 0]) == pytest.approx(128 / 255)
        np.testing.assert_allclose(np.asarray(frame.t_w_c), [1, 2, 3])


class TestViewerExport:
    def test_export_html(self, tmp_path):
        from khronos_tpu.eval.viewer import export_html
        from khronos_tpu.stm.spatio_temporal_map import SpatioTemporalMap
        from khronos_tpu.stm.scene_graph import Mesh, SceneGraph

        stm = SpatioTemporalMap()
        dsg = SceneGraph()
        V = 50
        dsg.mesh = Mesh(
            vertices=np.random.rand(V, 3).astype(np.float32),
            colors=np.random.rand(V, 3).astype(np.float32),
            labels=np.zeros(V, np.int32),
            first_seen_ns=np.arange(V, dtype=np.int64),
            last_seen_ns=np.arange(V, dtype=np.int64) + 5,
            faces=np.zeros((0, 3), np.int64),
        )
        stm.update(dsg, 10**9)
        path = str(tmp_path / "viewer.html")
        export_html(stm, path)
        html = open(path).read()
        assert "<canvas" in html and "robot time" in html
        assert len(html) > 2000


class TestPlotting:
    def test_tables_and_timing(self, tmp_path):
        from khronos_tpu.eval import plotting
        import csv

        rdir = tmp_path / "results"
        rdir.mkdir()
        with open(rdir / "background_mesh.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=["accuracy@0.2", "completeness@0.2", "f1@0.2", "rmse", "chamfer"])
            w.writeheader()
            w.writerow({"accuracy@0.2": 0.9, "completeness@0.2": 0.8, "f1@0.2": 0.85, "rmse": 0.1, "chamfer": 0.2})
        table = plotting.results_table(str(rdir), thresholds=(0.2,))
        assert "90.0" in table and "80.0" in table

        tdir = tmp_path / "timing"
        tdir.mkdir()
        with open(tdir / "stats.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=["name", "n_samples", "total_s", "mean_s", "stddev_s", "min_s", "max_s"])
            w.writeheader()
            w.writerow({"name": "active_window/all", "n_samples": 10, "total_s": 1.0,
                        "mean_s": 0.1, "stddev_s": 0, "min_s": 0.1, "max_s": 0.1})
            w.writerow({"name": "active_window/scroll", "n_samples": 2, "total_s": 0.5,
                        "mean_s": 0.25, "stddev_s": 0, "min_s": 0.25, "max_s": 0.25})
        tt = plotting.timing_table(str(tdir))
        assert "active_window/all" in tt
        tree = plotting.timing_hierarchy(str(tdir))
        assert "active_window" in tree
        assert "scroll" in tree["active_window"]["children"]
        png = plotting.plot_timing(str(tdir))
        assert os.path.exists(png)


class TestMultiDevice:
    def test_sharded_integration_matches_single_device(self):
        """Spatially-sharded fused map update over 8 virtual devices must
        produce the same map as the unsharded program (halo exchange for the
        tracking stencils included)."""
        import jax
        import jax.numpy as jnp

        from khronos_tpu.map import active_volume as av
        from khronos_tpu.parallel import sharding as sh

        assert len(jax.devices()) >= 8
        cfg = av.VolumeConfig(grid_shape=(64, 32, 16), voxel_size=0.1, truncation_distance=0.2)
        from khronos_tpu.geometry.camera import Camera

        cam = Camera(48, 64, 40.7, 41.3, 31.83, 23.71)
        state0 = av.create(cfg, origin_xyz=np.array([-3.2, -1.6, -0.6]))
        depth = jnp.full((48, 64), 2.03, jnp.float32)
        color = jnp.full((48, 64, 3), 0.3, jnp.float32)
        labels = jnp.full((48, 64), 2, jnp.int32)
        mask = jnp.zeros((48, 64), jnp.bool_)
        R = jnp.eye(3)
        t = jnp.asarray([0.013, -0.021, 0.017], jnp.float32)

        # single device reference
        ref = state0
        for k in range(3):
            ref = av.integrate_frame(cfg, cam, ref, depth, color, labels, mask, R, t, jnp.float32(0.1 * k))
            ref = av.update_archival(cfg, ref, jnp.float32(0.1 * k))

        mesh = sh.make_mesh(8)
        sharded = sh.shard_volume(state0, mesh)
        step = sh.make_sharded_step(cfg, cam, mesh)
        for k in range(3):
            sharded = step(sharded, depth, color, labels, mask, R, t, jnp.float32(0.1 * k))

        np.testing.assert_allclose(np.asarray(ref.tsdf), np.asarray(sharded.tsdf), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ref.weight), np.asarray(sharded.weight), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ref.ever_free), np.asarray(sharded.ever_free))
        # sharding actually applied
        assert len(sharded.tsdf.sharding.device_set) == 8

    def test_sharded_full_frame_step_matches_single_device(self):
        """The FULL fused frame step (motion+object detection + integration +
        packed stats) over 8 devices must match the unsharded program."""
        import jax
        import jax.numpy as jnp

        from khronos_tpu.active_window import fused_step as fs
        from khronos_tpu.active_window.motion_detection import (
            FreeSpaceMotionDetectorConfig,
        )
        from khronos_tpu.active_window.object_detection import (
            ConnectedSemanticsConfig,
            LabelSpace,
        )
        from khronos_tpu.geometry.camera import Camera
        from khronos_tpu.map import active_volume as av
        from khronos_tpu.parallel import sharding as sh

        assert len(jax.devices()) >= 8
        cfg = av.VolumeConfig(grid_shape=(64, 32, 16), voxel_size=0.1)
        cam = Camera(48, 64, 40.0, 40.0, 32.0, 24.0, max_range=5.0)
        ls = LabelSpace(num_classes=7, object_labels=[2, 3, 4, 5, 6], dynamic_labels=[1])
        md = FreeSpaceMotionDetectorConfig(min_cluster_size=5)
        od = ConnectedSemanticsConfig(min_cluster_size=5)

        depth = jnp.full((48, 64), 0.8, jnp.float32)
        color = jnp.full((48, 64, 3), 0.4, jnp.float32)
        labels = np.zeros((48, 64), np.int32)
        labels[10:30, 20:44] = 3
        labels = jnp.asarray(labels)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)

        ref_step = fs.make_frame_step(cfg, cam, md, od, ls, donate=False, crop=False)
        st0 = av.create(cfg, origin_xyz=np.array([-3.2, -1.6, -0.6]))
        ref, rd, ro, rp = ref_step(st0, depth, color, labels, R, t, jnp.float32(0.5))

        mesh = sh.make_mesh(8)
        sh_state = sh.shard_volume(st0, mesh)
        step = sh.make_sharded_frame_step(cfg, cam, md, od, ls, mesh)
        out, sd, so, sp = step(sh_state, depth, color, labels, R, t, jnp.float32(0.5))

        np.testing.assert_allclose(np.asarray(ref.tsdf), np.asarray(out.tsdf), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(ro), np.asarray(so))
        # packed stats: the pixel pipeline is row-sharded over the mesh, so
        # cluster reductions accumulate per-device partials in a different
        # order than single-device (float sums differ in the last bits)
        np.testing.assert_allclose(np.asarray(rp), np.asarray(sp), atol=2e-3, rtol=1e-5)
        assert len(out.tsdf.sharding.device_set) == 8
        assert np.asarray(so).max() > 0, "object not detected in sharded step"

    def test_sharded_ray_query_matches_single_device(self):
        import jax

        from khronos_tpu.changes.ray_verificator import (
            RayVerificator,
            RayVerificatorConfig,
        )
        from khronos_tpu.parallel import sharding as sh
        from khronos_tpu.stm.scene_graph import AgentNode, Mesh, SceneGraph

        rng = np.random.default_rng(3)
        dsg = SceneGraph()
        nv = 50
        dsg.mesh = Mesh(
            vertices=rng.uniform(-2, 2, (nv, 3)).astype(np.float32),
            colors=np.zeros((nv, 3), np.float32),
            faces=np.zeros((0, 3), np.int64),
            first_seen_ns=np.full(nv, 10**9, np.int64),
            last_seen_ns=np.full(nv, 20 * 10**9, np.int64),
            labels=np.zeros(nv, np.int32),
        )
        dsg.agents = [
            AgentNode(int(k * 1e9), np.eye(3), rng.uniform(-1, 1, 3).astype(np.float32), k)
            for k in range(12)
        ]
        ver = RayVerificator(RayVerificatorConfig(ray_policy="All"))
        ver.build(dsg)
        ref = ver.query(dsg.mesh.vertices)
        mesh = sh.make_mesh(8)
        squery = sh.make_sharded_ray_query(ver, mesh)
        got = squery(dsg.mesh.vertices)
        np.testing.assert_array_equal(ref, got)


class TestMultiDeviceOrchestrator:
    def test_active_window_device_mesh_mode(self):
        """ActiveWindow with n_devices=4: the ORCHESTRATOR path (spin_once,
        scroll, emission, finish) runs on a sharded grid and matches the
        single-device run (VERDICT r1 task 5 — mesh mode must be reachable
        from the orchestrator, not a hand-built step)."""
        import jax

        from khronos_tpu.active_window.active_window import (
            ActiveWindow,
            ActiveWindowConfig,
        )
        from khronos_tpu.active_window.frame_data import FrameData
        from khronos_tpu.config import build
        from khronos_tpu.data import synthetic as syn

        assert len(jax.devices()) >= 4
        scene = syn.office_scene(duration=10.0)
        seq = syn.SyntheticSequence(scene, syn.SyntheticSequenceConfig(
            duration=10.0, fps=2.0, height=48, width=64,
            fx=40.0, fy=40.0, cx=32.0, cy=24.0,
        ))

        def run(n_dev):
            cfg = build(ActiveWindowConfig, {
                "volumetric_map": {"grid_shape": [64, 64, 32], "voxel_size": 0.2},
                "n_devices": n_dev,
                "motion_detector": {"type": "FreeSpaceMotionDetector",
                                    "min_cluster_size": 40},
                "object_detector": {"type": "ConnectedSemantics",
                                    "min_cluster_size": 20},
                "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
                "object_extractor": {"type": "MeshObjectExtractor",
                                     "min_num_observations": 2},
            })
            aw = ActiveWindow(cfg, seq.camera, syn.default_label_space())
            outs = []
            for i in range(12):
                f = seq.render_frame(i)
                out = aw.spin_once(FrameData(
                    stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                    labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
                ))
                if out is not None:
                    outs.append(out)
            outs.append(aw.finish_mapping())
            w = float(np.asarray(aw.state.weight).sum())
            tris = sum(len(o.mesh_vertices) for o in outs)
            return w, tris, aw

        w1, t1, _ = run(0)
        w4, t4, aw4 = run(4)
        assert len(aw4.state.tsdf.sharding.device_set) == 4
        # crop on (single) vs off (sharded) gives small boundary deltas
        assert abs(w1 - w4) / max(w1, 1) < 2e-2, (w1, w4)
        assert t4 > 0 and abs(t1 - t4) <= max(0.1 * t1, 50), (t1, t4)


class TestCli:
    def test_run_module_smoke(self, tmp_path):
        from khronos_tpu import run as run_mod

        cfg = tmp_path / "cfg.yaml"
        cfg.write_text(
            """
pipeline:
  active_window:
    volumetric_map: {grid_shape: [64, 64, 24]}
    motion_detector: null
    tracker: {type: MaxIouTracker, min_num_observations: 2}
  backend: {lcd: null}
  label_space: {num_classes: 7, object_labels: [2, 3, 4, 5, 6]}
  run_change_detection_every_n_frames: -1
  places: null
dataset: {kind: synthetic, scene_name: apartment, duration: 2.0, fps: 2.0, height: 60, width: 80}
run: {evaluate: false, export_viewer: true}
"""
        )
        out = run_mod.main(["--config", str(cfg), f"run.output_dir={tmp_path}/out"])
        assert os.path.exists(os.path.join(out, "dsg.npz"))
        assert os.path.exists(os.path.join(out, "viewer.html"))
