"""Diagnose hallucinated object changes on the toy office e2e (round-3
task 4 follow-up: change precision is ~0.5, target 1.0).

Runs the e2e-quality config once, then prints per reported-change detail:
which object, its observation intervals, its merge relations, where the
absent evidence lies, and whether the evaluator matched it to a GT change.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=. \
        python scripts/change_diag.py
"""

import json
import sys
import tempfile

import numpy as np


def main():
    from khronos_tpu.active_window.frame_data import FrameData
    from khronos_tpu.config import build
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.eval.pipeline_evaluator import (
        PipelineEvaluator,
        PipelineEvaluatorConfig,
        SceneGroundTruth,
    )
    from khronos_tpu.pipeline.pipeline import (
        ExperimentConfig,
        ExperimentManager,
        KhronosPipeline,
        PipelineConfig,
    )

    duration, fps = 24.0, 4.0
    scene = syn.office_scene(duration=duration)
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=duration, fps=fps, height=96, width=128,
            fx=80.0, fy=80.0, cx=64.0, cy=48.0, n_loops=2.0,
        ),
    )
    cfg = build(
        PipelineConfig,
        {
            "active_window": {
                "volumetric_map": {"grid_shape": [160, 160, 40], "voxel_size": 0.1},
                "motion_detector": {"type": "FreeSpaceMotionDetector", "min_cluster_size": 60, "grow_iterations": 12},
                "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 30},
                "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
                "object_extractor": {
                    "type": "MeshObjectExtractor",
                    "min_num_observations": 2,
                    "max_frames": 10,
                    "min_dynamic_displacement": 0.4,
                },
            },
            "backend": {"lcd": {"type": "GtLoopClosure", "min_time_gap": 8.0, "max_distance": 1.0}},
            "label_space": {
                "num_classes": 7,
                "object_labels": [2, 3, 4, 5, 6],
                "dynamic_labels": [1],
            },
            "run_change_detection_every_n_frames": 24,
            "change_detection": {
                "verificator": {"ray_policy": "All", "temporal_resolution": 2.0, "num_bins": 32},
                "detector": {"window_size": 3, "evidence_prior": 2.0},
            },
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)
    out_dir = tempfile.mkdtemp(prefix="chdiag_")
    mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)
    frames, gts = [], []
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        frames.append(FrameData(stamp_ns=f["stamp_ns"], depth=f["depth"],
                                color=f["color"], labels=f["labels"],
                                R_w_c=f["R_w_c"], t_w_c=f["t_w_c"]))
        gts.append((f["R_gt"], f["t_gt"]))
    mgr.run(frames, gts)

    gt = SceneGroundTruth(scene, duration, n_bg_points=30000)
    ev = PipelineEvaluator(PipelineEvaluatorConfig(only_final=True))
    summary = ev.evaluate(pipe.map, gt, out_dir + "/results")
    print(json.dumps(summary["changes"], indent=1, default=str))

    # GT changes
    print("\nGT changes (name, t_appear, t_disappear):", file=sys.stderr)
    for p in scene.primitives:
        if np.isfinite(p.t_appear) or np.isfinite(p.t_disappear):
            print(f"  {p.name}: appear={p.t_appear} disappear={p.t_disappear}",
                  file=sys.stderr)

    changes = pipe.change_detector.changes
    merges = pipe.backend.validated_merges()
    merged_from = {}
    for m in merges:
        merged_from.setdefault(m.into_id, []).append(m.from_id)
    dsg = pipe.backend.get_dsg()
    print("\nreported object changes:", file=sys.stderr)
    for oid, oc in sorted(changes.object_changes.items()):
        o = dsg.objects.get(oid)
        pos = np.round(o.position(), 2).tolist() if o is not None else None
        f_s = o.first_observed_ns[0] * 1e-9 if o is not None else None
        l_s = o.last_observed_ns[-1] * 1e-9 if o is not None else None
        print(
            f"  obj {oid} cat={getattr(o, 'semantic_category', '?')} pos={pos} "
            f"obs=[{f_s}, {l_s}] "
            f"first_abs={oc.first_absent_ns*1e-9 if oc.first_absent_ns>=0 else None} "
            f"last_abs={oc.last_absent_ns*1e-9 if oc.last_absent_ns>=0 else None} "
            f"merged_id={oc.merged_id} absorbed={merged_from.get(oid, [])}",
            file=sys.stderr,
        )
        if o is not None and (oc.last_absent_ns >= 0 or oc.first_absent_ns >= 0):
            w = o.world_mesh_vertices()
            if len(w):
                print(f"    mesh bbox {np.round(w.min(0),2).tolist()} .. "
                      f"{np.round(w.max(0),2).tolist()} ({len(w)} verts)",
                      file=sys.stderr)


main()
