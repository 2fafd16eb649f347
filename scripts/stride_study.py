"""Quantify detection_stride: run the office e2e at stride 1 vs 2 and print
the evaluation metric deltas (VERDICT r1 task 7 — the bench runs stride 2,
so its accuracy cost must be on record; results go in METRICS.md).

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/stride_study.py \
        [--height 96 --width 128 --fps 4 --duration 24]
"""

import argparse
import json
import sys
import tempfile

import numpy as np


def run_once(stride: int, args) -> dict:
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

    scene = syn.office_scene(duration=args.duration)
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=args.duration, fps=args.fps, height=args.height,
            width=args.width, fx=args.width * 0.625, fy=args.width * 0.625,
            cx=args.width / 2, cy=args.height / 2, n_loops=2.0,
        ),
    )
    cfg = build(
        PipelineConfig,
        {
            "active_window": {
                "volumetric_map": {"grid_shape": [160, 160, 40], "voxel_size": 0.1},
                "detection_stride": stride,
                "motion_detector": {"type": "FreeSpaceMotionDetector",
                                    "min_cluster_size": 60 // (stride * stride),
                                    "grow_iterations": 12},
                "object_detector": {"type": "ConnectedSemantics",
                                    "min_cluster_size": 30 // (stride * stride)},
                "tracker": {"type": "MaxIouTracker", "min_num_observations": 3},
                "object_extractor": {"type": "MeshObjectExtractor",
                                     "min_num_observations": 3, "max_frames": 10,
                                     "min_dynamic_displacement": 0.8},
            },
            "backend": {"lcd": {"type": "GtLoopClosure", "min_time_gap": 8.0,
                                "max_distance": 1.0}},
            "label_space": {"num_classes": 7, "object_labels": [2, 3, 4, 5, 6],
                            "dynamic_labels": [1]},
            "run_change_detection_every_n_frames": 24,
            "change_detection": {
                "verificator": {"ray_policy": "All", "temporal_resolution": 2.0,
                                "num_bins": 32},
                "detector": {"window_size": 3},
            },
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)
    out_dir = tempfile.mkdtemp(prefix=f"stride{stride}_")
    mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)
    frames, gts = [], []
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        frames.append(FrameData(stamp_ns=f["stamp_ns"], depth=f["depth"],
                                color=f["color"], labels=f["labels"],
                                R_w_c=f["R_w_c"], t_w_c=f["t_w_c"]))
        gts.append((f["R_gt"], f["t_gt"]))
    mgr.run(frames, gts)
    gt = SceneGroundTruth(scene, args.duration, n_bg_points=30000)
    ev = PipelineEvaluator(PipelineEvaluatorConfig(only_final=True))
    summary = ev.evaluate(pipe.map, gt, out_dir + "/results")
    return {
        "stride": stride,
        "accuracy@0.2": summary["mesh"]["accuracy@0.2"],
        "completeness@0.2": summary["mesh"]["completeness@0.2"],
        "f1@0.2": summary["mesh"]["f1@0.2"],
        "obj_precision": summary["objects"]["precision"],
        "obj_recall": summary["objects"]["recall"],
        "dyn_precision": summary["dynamic"]["dynamic_precision"],
        "dyn_recall": summary["dynamic"]["dynamic_recall"],
        "change_precision": summary["changes"]["change_precision"],
        "change_recall": summary["changes"]["change_recall"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--fps", type=float, default=4.0)
    ap.add_argument("--duration", type=float, default=24.0)
    args = ap.parse_args()
    rows = [run_once(s, args) for s in (1, 2)]
    for r in rows:
        print(json.dumps(r))
    keys = [k for k in rows[0] if k != "stride"]
    print("\n| metric | stride 1 | stride 2 | delta |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for k in keys:
        d = rows[1][k] - rows[0][k]
        print(f"| {k} | {rows[0][k]:.3f} | {rows[1][k]:.3f} | {d:+.3f} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
