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
