"""Open-set path: InstanceForwarding + feature-carrying tracks/objects."""

import jax.numpy as jnp
import numpy as np
import pytest

from khronos_tpu.active_window.active_window import ActiveWindow, ActiveWindowConfig
from khronos_tpu.active_window.frame_data import FrameData
from khronos_tpu.active_window.instance_forwarding import OPENSET_CATEGORY
from khronos_tpu.config import build
from khronos_tpu.data import synthetic as syn


def make_seq():
    scene = syn.apartment_scene()
    return syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=12.0, fps=4.0, height=96, width=128,
            fx=80.0, fy=80.0, cx=64.0, cy=48.0,
        ),
    )


def to_frame(f):
    return FrameData(
        stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
        labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
        instances=f["instances"], label_features=f["features"],
    )


class TestInstanceForwarding:
    def test_openset_objects_with_features(self):
        seq = make_seq()
        cfg = build(ActiveWindowConfig, {
            "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
            "motion_detector": None,
            "object_detector": {"type": "InstanceForwarding", "min_cluster_size": 40},
            "tracker": {"type": "ExternalTracker", "min_num_observations": 3},
            "object_extractor": {"type": "MeshObjectExtractor", "min_num_observations": 3, "max_frames": 8},
        })
        aw = ActiveWindow(cfg, seq.camera, syn.default_label_space())
        assert aw._fused_step is None  # open-set runs the modular path
        objects = []
        last = None
        for i in range(30):
            f = seq.render_frame(i)
            frame = to_frame(f)
            out = aw.spin_once(frame)
            last = frame
            if out:
                objects.extend(out.objects)
            if i == 3:
                # instance image forwards only kept ids; clusters carry features
                assert frame.semantic_clusters, "no instances forwarded"
                for c in frame.semantic_clusters:
                    assert c.category_id == OPENSET_CATEGORY
                    assert c.feature is not None and c.feature.shape == (32,)
        out = aw.finish_mapping(last)
        objects.extend(out.objects)
        static = [o for o in objects if not o.is_dynamic]
        assert static, "no open-set objects extracted"
        feats = [o for o in static if o.feature is not None]
        assert feats, "extracted objects lost their features"
        # features should match one of the scene primitives' embeddings
        lib = seq.instance_features()
        f = feats[0].feature / np.linalg.norm(feats[0].feature)
        sims = lib @ f
        assert sims.max() > 0.99

    def test_background_prompt_filtering(self):
        from khronos_tpu.active_window.instance_forwarding import (
            InstanceForwarding,
            InstanceForwardingConfig,
        )
        from khronos_tpu.map import active_volume as av

        seq = make_seq()
        vol = av.VolumeConfig(grid_shape=(64, 64, 32))
        det = InstanceForwarding(InstanceForwardingConfig(min_cluster_size=40), vol, seq.camera)
        f = seq.render_frame(0)
        frame = to_frame(f)
        state = av.create(vol)
        n_before = len(det.process(state, frame))
        assert n_before >= 1
        # now declare every instance's own feature as a background prompt:
        # everything must be filtered
        det.set_background_embeddings(seq.instance_features())
        frame2 = to_frame(seq.render_frame(0))
        n_after = len(det.process(state, frame2))
        assert n_after == 0
        assert int(np.asarray(frame2.object_image).max()) == 0


class TestFusedOpenset:
    def _cfg(self):
        return build(ActiveWindowConfig, {
            "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
            "motion_detector": None,
            "object_detector": {
                "type": "InstanceForwarding",
                "min_cluster_size": 40,
                "max_instances": 32,  # <= fused cap -> fused device path
            },
            "tracker": {"type": "MaxIouTracker", "min_num_observations": 3},
            "object_extractor": {"type": "MeshObjectExtractor",
                                 "min_num_observations": 3, "max_frames": 8},
        })

    def test_fused_path_used_and_matches_modular(self):
        seq = make_seq()
        aw = ActiveWindow(self._cfg(), seq.camera, syn.default_label_space())
        assert aw._fused_step is not None and aw._openset_fused

        cfg_mod = self._cfg()
        cfg_mod.fused = False
        aw_mod = ActiveWindow(cfg_mod, seq.camera, syn.default_label_space())
        assert aw_mod._fused_step is None

        fused_frames, mod_frames = [], []
        for i in range(6):
            f = seq.render_frame(i)
            fr_f, fr_m = to_frame(f), to_frame(f)
            aw.spin_once(fr_f)
            aw_mod.spin_once(fr_m)
            fused_frames.append(fr_f)
            mod_frames.append(fr_m)
        aw._flush_tracker_queue()

        compared = 0
        for fr_f, fr_m in zip(fused_frames, mod_frames):
            assert len(fr_f.semantic_clusters) == len(fr_m.semantic_clusters)
            for c in fr_f.semantic_clusters:
                assert c.category_id == OPENSET_CATEGORY
                assert c.feature is not None and c.feature.shape == (32,)
            cf = sorted(round(float(c.centroid[0]), 1) for c in fr_f.semantic_clusters)
            cm = sorted(round(float(c.centroid[0]), 1) for c in fr_m.semantic_clusters)
            assert cf == cm, (cf, cm)
            compared += len(fr_f.semantic_clusters)
        assert compared >= 3, "too few clusters to be a meaningful comparison"

    def test_fused_background_filter(self):
        seq = make_seq()
        aw = ActiveWindow(self._cfg(), seq.camera, syn.default_label_space())
        aw.set_background_embeddings(seq.instance_features())
        assert aw._fused_step is not None and aw._openset_fused
        for i in range(3):
            frame = to_frame(seq.render_frame(i))
            aw.spin_once(frame)
        aw._flush_tracker_queue()
        assert not frame.semantic_clusters, "background prompts must filter all"
        assert int(np.asarray(frame.object_image).max()) == 0


class TestOpensetPipeline:
    @pytest.mark.slow
    def test_full_pipeline_preserves_features_into_4dmap(self, tmp_path):
        """Open-set full run (reference: FastSAM+CLIP instances through the
        whole stack, sam_clip.yaml): instances + embeddings -> external
        tracking -> objects -> backend -> CD snapshots. Features must
        survive into the saved 4D map."""
        from khronos_tpu.pipeline.pipeline import (
            ExperimentConfig,
            ExperimentManager,
            KhronosPipeline,
            PipelineConfig,
        )
        from khronos_tpu.stm.spatio_temporal_map import SpatioTemporalMap

        seq = make_seq()
        cfg = build(PipelineConfig, {
            "active_window": {
                "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
                "motion_detector": None,
                "object_detector": {"type": "InstanceForwarding", "min_cluster_size": 40},
                "tracker": {"type": "ExternalTracker", "min_num_observations": 3},
                "object_extractor": {"type": "MeshObjectExtractor",
                                     "min_num_observations": 3, "max_frames": 8},
            },
            "backend": {"lcd": {"type": "GtLoopClosure", "min_time_gap": 6.0,
                                "max_distance": 1.0}},
            "label_space": {"num_classes": 7, "object_labels": [2, 3, 4, 5, 6]},
            "run_change_detection_every_n_frames": 24,
        })
        pipe = KhronosPipeline(cfg, seq.camera)
        out_dir = str(tmp_path / "openset_run")
        mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)
        frames, gts = [], []
        for i in range(seq.n_frames):
            f = seq.render_frame(i)
            frames.append(to_frame(f))
            gts.append((f["R_gt"], f["t_gt"]))
        mgr.run(frames, gts)

        from khronos_tpu.utils.logging import ExperimentLogger

        assert ExperimentLogger.has_flag(out_dir, "Experiment Finished Cleanly")
        assert pipe.map.num_snapshots >= 1
        final = pipe.map.get_dsg(pipe.map.latest_ns())
        objs = [o for o in final.objects.values() if not o.is_dynamic]
        assert objs, "no open-set objects in the 4D map"
        feats = [o for o in objs if o.feature is not None]
        assert feats, "objects lost their embeddings through backend/CD"
        lib = seq.instance_features()
        f0 = feats[0].feature / np.linalg.norm(feats[0].feature)
        assert (lib @ f0).max() > 0.99
        # round-trip through the saved .4dmap
        import os

        stm = SpatioTemporalMap.load(os.path.join(out_dir, "final.4dmap.npz"))
        final2 = stm.get_dsg(stm.latest_ns())
        feats2 = [o for o in final2.objects.values() if o.feature is not None]
        assert feats2, "features lost in .4dmap serialization"
