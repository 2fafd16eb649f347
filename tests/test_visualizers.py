"""Debug visualizers: AW frame sink, CD ray inspector, eval association SVG
(file-based equivalents of the reference's RViz tooling, SURVEY.md §2.4/2.5)."""

import os

import numpy as np
import pytest

from khronos_tpu.eval import visualizers as vz


class TestColormaps:
    def test_depth_colormap_shapes_and_invalid(self):
        d = np.array([[0.5, 2.0], [0.0, np.inf]], np.float32)
        img = vz.depth_colormap(d, max_range=4.0)
        assert img.shape == (2, 2, 3) and img.dtype == np.uint8
        assert (img[1, 0] == 0).all() and (img[1, 1] == 0).all()  # invalid black
        assert (img[0, 0] != img[0, 1]).any()  # different depths differ

    def test_id_colormap_background_black_and_distinct(self):
        ids = np.array([[0, 1], [2, 1]])
        img = vz.id_colormap(ids)
        assert (img[0, 0] == 0).all()
        assert (img[0, 1] == img[1, 1]).all()
        assert (img[0, 1] != img[1, 0]).any()


class TestActiveWindowVisualizer:
    def test_sink_writes_debug_frames(self, tmp_path):
        """Attach the sink to a real ActiveWindow run on a tiny sequence."""
        from khronos_tpu.active_window.active_window import (
            ActiveWindow,
            ActiveWindowConfig,
        )
        from khronos_tpu.active_window.frame_data import FrameData
        from khronos_tpu.active_window.object_detection import LabelSpace
        from khronos_tpu.config import build
        from khronos_tpu.data import synthetic as syn

        scene = syn.office_scene(duration=4.0)
        seq = syn.SyntheticSequence(
            scene,
            syn.SyntheticSequenceConfig(
                duration=4.0, fps=2.0, height=48, width=64,
                fx=40.0, fy=40.0, cx=32.0, cy=24.0,
            ),
        )
        cfg = build(
            ActiveWindowConfig,
            {"volumetric_map": {"grid_shape": [96, 96, 32], "voxel_size": 0.15}},
        )
        aw = ActiveWindow(cfg, seq.camera, LabelSpace(7, (2, 3, 4, 5, 6), (1,)))
        vis = vz.ActiveWindowVisualizer(
            vz.ActiveWindowVisualizerConfig(
                output_dir=str(tmp_path / "aw"), every_n_frames=2
            )
        )
        aw.add_sink(vis)
        for i in range(6):
            f = seq.render_frame(i)
            aw.spin_once(
                FrameData(
                    stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                    labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
                )
            )
        files = sorted(os.listdir(tmp_path / "aw"))
        pngs = [f for f in files if f.endswith(".png")]
        assert len(pngs) == 3  # every 2nd of 6 frames
        assert "index.html" in files
        from PIL import Image

        img = np.asarray(Image.open(tmp_path / "aw" / pngs[0]))
        assert img.shape == (48 * 2, 64 * 2, 3)  # 2x2 tiling


class TestCdInspector:
    @pytest.fixture()
    def verificator(self):
        """Verificator over a simple DSG: agent walks +x looking at a wall
        vertex; rays from several poses."""
        from khronos_tpu.changes.ray_verificator import (
            RayVerificator,
            RayVerificatorConfig,
        )
        from khronos_tpu.stm.scene_graph import AgentNode, Mesh, SceneGraph

        dsg = SceneGraph()
        n = 6
        for i in range(n):
            dsg.agents.append(
                AgentNode(int(i * 1e9), np.eye(3), np.array([i * 0.3, 0.0, 0.0]), i)
            )
        verts = np.array([[1.0, 2.0, 0.0], [1.2, 2.0, 0.0], [1.1, 2.1, 0.0]], np.float32)
        dsg.mesh = Mesh(
            vertices=verts,
            colors=np.zeros_like(verts),
            labels=np.zeros(3, np.int32),
            first_seen_ns=np.zeros(3, np.int64),
            last_seen_ns=np.full(3, int((n - 1) * 1e9), np.int64),
            faces=np.array([[0, 1, 2]], np.int64),
        )
        v = RayVerificator(RayVerificatorConfig(ray_policy="All", active_window_duration=0.0))
        v.build(dsg)
        assert v._built
        return v

    def test_inspect_point_on_surface_matches(self, verificator):
        rays = vz.inspect_point(verificator, np.array([1.0, 2.0, 0.0]))
        assert rays, "expected candidate rays through the vertex cell"
        assert any(e["cls"] == "match" for e in rays)
        for e in rays:
            assert e["cls"] in ("match", "absent", "occluded", "no_overlap")
            assert e["stamp_s"] >= 0.0

    def test_inspect_point_in_front_is_absent(self, verificator):
        # a point halfway between the sources and the wall: rays pass through
        rays = vz.inspect_point(verificator, np.array([1.0, 1.0, 0.0]))
        if rays:  # point's cell must be traversed by some ray
            assert any(e["cls"] in ("absent", "no_overlap") for e in rays)

    def test_export_html(self, verificator, tmp_path):
        out = str(tmp_path / "inspect.html")
        rays = vz.export_point_inspection(verificator, np.array([1.0, 2.0, 0.0]), out)
        assert os.path.exists(out)
        html = open(out).read()
        assert "<svg" in html and str(rays[0]["ray"]) in html


class TestEvalVisualizer:
    def test_association_svg(self, tmp_path):
        from khronos_tpu.eval.evaluators import GtObject
        from khronos_tpu.stm.scene_graph import KhronosObject

        def est_obj(oid, center, cat=2):
            c = np.asarray(center, np.float32)
            return KhronosObject(
                node_id=oid,
                semantic_category=cat,
                bbox_min=c - 0.2,
                bbox_max=c + 0.2,
                mesh_vertices=np.zeros((0, 3), np.float32),
                mesh_faces=np.zeros((0, 3), np.int64),
                mesh_colors=np.zeros((0, 3), np.float32),
                first_observed_ns=[0],
                last_observed_ns=[10**10],
            )

        est = [est_obj(1, [1, 1, 0]), est_obj(2, [5, 5, 0])]  # 2nd hallucinated
        gt = [
            GtObject(1, 2, np.array([1.05, 1.0, 0.0]), np.array([0.8, 0.8, -0.2]), np.array([1.3, 1.2, 0.2])),
            GtObject(2, 3, np.array([3.0, 3.0, 0.0]), np.array([2.8, 2.8, -0.2]), np.array([3.2, 3.2, 0.2])),  # missed
        ]
        out = str(tmp_path / "assoc.html")
        stats = vz.export_association_svg(est, gt, 10**9, out)
        assert os.path.exists(out)
        assert stats["detected"] == 1
        assert stats["missed"] == 1
        assert stats["hallucinated"] == 1
        html = open(out).read()
        assert "<svg" in html and "hallucinated" in html
