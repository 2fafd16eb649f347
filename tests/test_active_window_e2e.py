"""End-to-end active-window test on synthetic scenes: frames -> TSDF -> mesh
+ tracked objects. This is the minimum end-to-end slice of SURVEY.md §7.2."""

import numpy as np
import pytest

from khronos_tpu.active_window.active_window import ActiveWindow, ActiveWindowConfig
from khronos_tpu.active_window.frame_data import FrameData
from khronos_tpu.config import build
from khronos_tpu.data import synthetic as syn
from khronos_tpu.stm.scene_graph import MeshAccumulator


def run_sequence(scene, duration, fps=5.0, n_frames=None, aw_over=None):
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=duration, fps=fps, height=120, width=160,
            fx=100.0, fy=100.0, cx=80.0, cy=60.0,
        ),
    )
    over = {
        "volumetric_map": {"grid_shape": [160, 160, 40], "voxel_size": 0.1},
        "motion_detector": {"type": "FreeSpaceMotionDetector", "min_cluster_size": 80, "grow_iterations": 12},
        "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 40},
        "tracker": {"type": "MaxIouTracker", "min_num_observations": 4},
        "object_extractor": {"type": "MeshObjectExtractor", "min_num_observations": 4, "max_frames": 12},
    }
    if aw_over:
        for k, v in aw_over.items():
            over.setdefault(k, {}).update(v) if isinstance(v, dict) else over.update({k: v})
    cfg = build(ActiveWindowConfig, over)
    aw = ActiveWindow(cfg, seq.camera, syn.default_label_space())
    acc = MeshAccumulator(resolution=0.02)
    objects = []
    n = n_frames or seq.n_frames
    last_frame = None
    for i in range(n):
        f = seq.render_frame(i)
        frame = FrameData(
            stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
            labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
        )
        out = aw.spin_once(frame)
        last_frame = frame
        if out is not None:
            acc.add_triangles(out.mesh_vertices, out.mesh_colors, out.mesh_first_ns, out.mesh_last_ns, out.mesh_labels)
            objects.extend(out.objects)
    out = aw.finish_mapping(last_frame)
    acc.add_triangles(out.mesh_vertices, out.mesh_colors, out.mesh_first_ns, out.mesh_last_ns, out.mesh_labels)
    objects.extend(out.objects)
    return seq, acc.build(), objects


def completeness(gt_points, mesh_vertices, tau=0.15):
    """Fraction of GT points with a mesh vertex within tau (brute force)."""
    if len(mesh_vertices) == 0:
        return 0.0
    hits = 0
    step = 2048
    for s in range(0, len(gt_points), step):
        chunk = gt_points[s : s + step]
        d2 = ((chunk[:, None, :] - mesh_vertices[None, :, :]) ** 2).sum(-1)
        hits += (d2.min(axis=1) <= tau * tau).sum()
    return hits / len(gt_points)


class TestApartmentSlice:
    def test_mesh_reconstruction_and_objects(self):
        scene = syn.apartment_scene()
        seq, mesh, objects = run_sequence(scene, duration=16.0, fps=5.0)
        assert mesh.num_vertices > 2000
        assert mesh.num_faces > 2000
        # completeness vs GT wall/furniture samples (visible band only: the
        # orbit at 1.4 m with limited vertical fov does not see everything)
        gt_pts, gt_labs = syn.sample_scene_surface(scene, 0.0, 4000, seed=1)
        band = (gt_pts[:, 2] > 0.4) & (gt_pts[:, 2] < 2.2)
        comp = completeness(gt_pts[band], mesh.vertices, tau=0.2)
        assert comp > 0.5, f"completeness={comp}"
        # accuracy: mesh vertices lie on some GT surface
        acc = completeness(mesh.vertices[:: max(1, mesh.num_vertices // 2000)], gt_pts, tau=0.2)
        assert acc > 0.75, f"accuracy={acc}"
        # static objects extracted with sane bboxes
        static_objs = [o for o in objects if not o.is_dynamic]
        assert len(static_objs) >= 1
        cats = {o.semantic_category for o in static_objs}
        assert cats & {syn.TABLE, syn.SHELF, syn.BOXLBL}
        for o in static_objs:
            ext = o.bbox_max - o.bbox_min
            # single-view flat objects reconstruct as thin sheets — gate on
            # volume (reference min/max_object_volume) and max extent
            assert float(np.prod(ext)) > 0.001 and (ext < 3.0).all()
            assert len(o.mesh_vertices) > 0

    def test_mesh_has_stamps(self):
        scene = syn.apartment_scene()
        _, mesh, _ = run_sequence(scene, duration=10.0, fps=5.0, n_frames=30)
        assert (mesh.first_seen_ns >= 0).all()
        assert (mesh.last_seen_ns >= mesh.first_seen_ns).all()


class TestOfficeDynamics:
    def test_dynamic_objects_tracked(self):
        scene = syn.office_scene(duration=24.0)
        seq, mesh, objects = run_sequence(scene, duration=24.0, fps=5.0)
        dyn = [o for o in objects if o.is_dynamic]
        assert len(dyn) >= 1, "no dynamic objects extracted"
        for o in dyn:
            traj = o.trajectory_positions
            assert len(traj) >= 2
            disp = np.linalg.norm(traj - traj[0], axis=1).max()
            assert disp >= 1.0
            # trajectory heights near human center
            assert 0.2 < traj[:, 2].mean() < 1.6
        # dynamic objects do not pollute the background mesh: no mesh
        # vertices in the open middle of the room where only humans walked
        mid = mesh.vertices
        in_mid = (
            (np.abs(mid[:, 0]) < 1.0) & (np.abs(mid[:, 1]) < 0.7)
            & (mid[:, 2] > 0.3) & (mid[:, 2] < 1.6)
        )
        assert in_mid.sum() < 0.02 * len(mid), f"{in_mid.sum()} ghost vertices mid-room"


class TestPullTimingRobustness:
    """The host-pull bus polls async device->host transfers with is_ready();
    WHEN a transfer lands must not change WHAT the engine produces. Round-2
    regression: frames of finished-but-unextracted tracks were trimmed when
    pulls landed late, silently degrading object reconstruction. This test
    delays pull delivery artificially and asserts the final mesh and objects
    are identical to the undelayed run."""

    def _run(self, delay: bool):
        import khronos_tpu.data.synthetic as syn_mod

        scene = syn_mod.office_scene(duration=16.0)
        seq = syn_mod.SyntheticSequence(
            scene,
            syn_mod.SyntheticSequenceConfig(
                duration=16.0, fps=4.0, height=96, width=128,
                fx=80.0, fy=80.0, cx=64.0, cy=48.0,
            ),
        )
        cfg = build(ActiveWindowConfig, {
            "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
            "motion_detector": {"type": "FreeSpaceMotionDetector",
                                "min_cluster_size": 60, "grow_iterations": 12},
            "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 30},
            "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
            "object_extractor": {"type": "MeshObjectExtractor",
                                 "min_num_observations": 2, "max_frames": 8,
                                 "min_dynamic_displacement": 0.4},
        })
        aw = ActiveWindow(cfg, seq.camera, syn_mod.default_label_space())
        if delay:
            # deliver buses/pulls only every 3rd non-blocking poll — emulates
            # slow transfer landings (e.g. a congested PCIe/tunnel link)
            orig_poll = aw._poll_bus
            orig_adv = aw._advance_mesh_pulls
            n = {"p": 0, "a": 0}

            def delayed_poll(block=False, min_drain=0):
                n["p"] += 1
                if not block and min_drain == 0 and n["p"] % 3:
                    return
                orig_poll(block=block, min_drain=min_drain)

            def delayed_adv(force=0):
                n["a"] += 1
                if force == 0 and n["a"] % 3:
                    return
                orig_adv(force=force)

            aw._poll_bus = delayed_poll
            aw._advance_mesh_pulls = delayed_adv
        acc = MeshAccumulator(resolution=0.02)
        objects = []
        last = None
        for i in range(seq.n_frames):
            f = seq.render_frame(i)
            frame = FrameData(
                stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
            )
            out = aw.spin_once(frame)
            last = frame
            if out is not None:
                acc.add_triangles(out.mesh_vertices, out.mesh_colors,
                                  out.mesh_first_ns, out.mesh_last_ns, out.mesh_labels)
                objects.extend(out.objects)
        out = aw.finish_mapping(last)
        acc.add_triangles(out.mesh_vertices, out.mesh_colors,
                          out.mesh_first_ns, out.mesh_last_ns, out.mesh_labels)
        objects.extend(out.objects)
        return acc.build(), objects

    @pytest.mark.slow
    def test_starved_completions_stay_bounded(self):
        """Round-3 regression: on a platform whose async-copy completions
        never report ready under a continuous dispatch stream (observed on
        the axon tunnel), the in-flight backlog must stay bounded by
        max_inflight_pulls via blocking consumption — and the engine must
        still deliver mesh geometry (before the fix the backend saw an
        empty map for the whole run)."""
        import khronos_tpu.data.synthetic as syn_mod
        from khronos_tpu.active_window.active_window import (
            ActiveWindow, ActiveWindowConfig,
        )
        from khronos_tpu.active_window.frame_data import FrameData
        from khronos_tpu.config import build

        scene = syn_mod.office_scene(duration=8.0)
        seq = syn_mod.SyntheticSequence(
            scene,
            syn_mod.SyntheticSequenceConfig(
                duration=8.0, fps=4.0, height=48, width=64,
                fx=40.0, fy=40.0, cx=32.0, cy=24.0,
            ),
        )
        cfg = build(ActiveWindowConfig, {
            "volumetric_map": {"grid_shape": [96, 96, 32], "voxel_size": 0.12},
            "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
            "max_inflight_pulls": 2,
        })
        aw = ActiveWindow(cfg, seq.camera, syn_mod.default_label_space())

        # make every is_ready() report False: only forced (blocking)
        # consumption can deliver
        import unittest.mock as mock

        class _NeverReady:
            def __get__(self, obj, objtype=None):
                return lambda: False

        nv = 0
        with mock.patch.object(
            type(aw.state.tsdf), "is_ready", _NeverReady(), create=True
        ):
            for i in range(seq.n_frames):
                f = seq.render_frame(i)
                out = aw.spin_once(FrameData(
                    stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                    labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
                ))
                if out is not None:
                    nv += len(out.mesh_vertices)
                assert len(aw._bus_pending) <= 2 + 1, len(aw._bus_pending)
                assert len(aw._pending_mesh_dev) <= 2 + 2, len(aw._pending_mesh_dev)
        assert nv > 0, "no geometry delivered under starved completions"

    def test_delayed_pulls_same_result(self):
        mesh_a, objs_a = self._run(delay=False)
        mesh_b, objs_b = self._run(delay=True)
        # mesh: identical triangle soup (delta order may differ -> compare
        # as sorted vertex multisets)
        assert mesh_a.num_vertices == mesh_b.num_vertices, (
            mesh_a.num_vertices, mesh_b.num_vertices)
        va = np.sort(np.round(mesh_a.vertices, 4).view(
            [("x", "f4"), ("y", "f4"), ("z", "f4")]), axis=0)
        vb = np.sort(np.round(mesh_b.vertices, 4).view(
            [("x", "f4"), ("y", "f4"), ("z", "f4")]), axis=0)
        assert (va == vb).all()
        # objects: same set (by category + rounded centroid), same
        # reconstruction sizes
        def key(o):
            c = np.round(o.position(), 2)
            return (o.semantic_category, o.is_dynamic, c[0], c[1], c[2],
                    len(o.mesh_vertices))
        ka = sorted(key(o) for o in objs_a)
        kb = sorted(key(o) for o in objs_b)
        assert ka == kb, (ka, kb)


class TestSemanticMotionSeeding:
    """seed_dynamic_labels: dynamic-labeled pixels seed motion clusters in
    freshly-first-observed space, bypassing the ever-free warm-up (the
    Dynablox-inherent blind spot: a voxel must be SEEN free before occupancy
    there can read as motion, so a human in never-observed space is
    invisible to the geometry-only detector)."""

    def _first_dynamic_frame(self, seed: bool):
        import khronos_tpu.data.synthetic as syn_mod

        scene = syn_mod.office_scene(duration=12.0)
        seq = syn_mod.SyntheticSequence(
            scene,
            syn_mod.SyntheticSequenceConfig(
                duration=12.0, fps=4.0, height=96, width=128,
                fx=80.0, fy=80.0, cx=64.0, cy=48.0,
            ),
        )
        cfg = build(ActiveWindowConfig, {
            "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
            "motion_detector": {"type": "FreeSpaceMotionDetector",
                                "min_cluster_size": 60, "grow_iterations": 12,
                                "seed_dynamic_labels": seed},
            "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 30},
            "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
        })
        import khronos_tpu.data.synthetic as syn2
        aw = ActiveWindow(cfg, seq.camera, syn2.default_label_space())
        first, purity = None, None
        # start AT the frame where humans first enter view (frame 4 of this
        # sequence): the first frame the detector ever sees has a human
        # standing in never-before-observed space — the ever-free blind spot
        for i in range(4, 16):
            f = seq.render_frame(i)
            frame = FrameData(
                stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
            )
            aw.spin_once(frame)
            dyn = np.asarray(frame.dynamic_image)
            if first is None and (dyn > 0).sum() > 30:
                first = i
                labels = np.asarray(f["labels"])
                human = int(((dyn > 0) & (labels == syn_mod.HUMAN)).sum())
                purity = human / max(int((dyn > 0).sum()), 1)
        return first if first is not None else 999, purity

    def test_seeding_bypasses_ever_free_warmup(self):
        base, _ = self._first_dynamic_frame(False)
        seeded, purity = self._first_dynamic_frame(True)
        assert seeded < base, (seeded, base)
        # seeded clusters are still humans, not background leakage
        assert purity is not None and purity > 0.7, purity
