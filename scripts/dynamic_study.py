"""Dynamic-object recall study: office e2e under tracker/extractor knob
variants. Dynamic recall is the one metric below the reference's own number
(METRICS.md: 17.7 vs 26.6); the visibility ceiling of the office sequence is
~31% of GT trajectory timestamps (frustum+range, no occlusion), so the gap is
track formation, not visibility. Knobs under study:

  - min_num_observations (tracker + extractor): confirmation lag per track
  - min_dynamic_displacement: drops short crossings / turnarounds

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/dynamic_study.py
"""

import argparse
import json
import sys
import tempfile


def run_once(name: str, min_obs: int, min_disp: float, args, extra=None) -> dict:
    import numpy as np  # noqa: F401

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
                "volumetric_map": {"grid_shape": [160, 160, 40], "voxel_size": 0.1,
                                   **(extra or {}).get("volumetric_map", {})},
                "motion_detector": {"type": "FreeSpaceMotionDetector",
                                    "min_cluster_size": 60,
                                    "grow_iterations": 12,
                                    **(extra or {}).get("motion_detector", {})},
                "object_detector": {"type": "ConnectedSemantics",
                                    "min_cluster_size": 30},
                "tracker": {"type": "MaxIouTracker",
                            "min_num_observations": min_obs},
                "object_extractor": {"type": "MeshObjectExtractor",
                                     "min_num_observations": min_obs,
                                     "max_frames": 10,
                                     "min_dynamic_displacement": min_disp},
            },
            "backend": {"lcd": {"type": "GtLoopClosure", "min_time_gap": 8.0,
                                "max_distance": 1.0}},
            "label_space": {"num_classes": 7, "object_labels": [2, 3, 4, 5, 6],
                            "dynamic_labels": [1]},
            "run_change_detection_every_n_frames": 24,
            "change_detection": {
                "verificator": {"ray_policy": "All", "temporal_resolution": 2.0,
                                "num_bins": 32},
                "detector": {"window_size": 3, "evidence_prior": 2.0},
            },
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)
    out_dir = tempfile.mkdtemp(prefix=f"dyn_{name}_")
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
        "variant": name,
        "min_obs": min_obs,
        "min_disp": min_disp,
        "dyn_precision": summary["dynamic"]["dynamic_precision"],
        "dyn_recall": summary["dynamic"]["dynamic_recall"],
        "dyn_f1": summary["dynamic"]["dynamic_f1"],
        "obj_precision": summary["objects"]["precision"],
        "obj_recall": summary["objects"]["recall"],
        "change_precision": summary["changes"]["change_precision"],
        "change_recall": summary["changes"]["change_recall"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--fps", type=float, default=4.0)
    ap.add_argument("--duration", type=float, default=24.0)
    ap.add_argument("--seed-only", action="store_true",
                    help="only the baseline + semantic-seeding variants")
    args = ap.parse_args()
    # round-2 best was obs2_disp04 (recall 0.219); round-3 attacks the
    # remaining gap terms named in METRICS.md: ever-free warm-up
    # (temporal_buffer) and confirmation lag (min_obs 1 with the
    # displacement filter guarding precision)
    variants = [
        ("obs2_disp04", 2, 0.4, None),
        ("obs1_disp04", 1, 0.4, None),
        ("tb025", 2, 0.4, {"volumetric_map": {"temporal_buffer": 0.25}}),
        ("tb010", 2, 0.4, {"volumetric_map": {"temporal_buffer": 0.1}}),
        ("obs1_tb025", 1, 0.4, {"volumetric_map": {"temporal_buffer": 0.25}}),
        ("obs1_tb025_mc40", 1, 0.4, {"volumetric_map": {"temporal_buffer": 0.25},
                                      "motion_detector": {"min_cluster_size": 40}}),
        # semantic motion seeding: dynamic-labeled pixels seed clusters
        # without ever-free history (the warm-up blind spot attacked
        # directly; off by default for reference parity)
        ("seed", 2, 0.4, {"motion_detector": {"seed_dynamic_labels": True}}),
    ]
    if args.seed_only:
        variants = [v for v in variants if v[0] in ("obs2_disp04", "seed")]
    rows = [run_once(n, o, d, args, x) for (n, o, d, x) in variants]
    for r in rows:
        print(json.dumps(r))
    keys = [k for k in rows[0] if k not in ("variant", "min_obs", "min_disp")]
    hdr = " | ".join(r["variant"] for r in rows)
    print(f"\n| metric | {hdr} |", file=sys.stderr)
    print("|---|" + "---|" * len(rows), file=sys.stderr)
    for k in keys:
        cells = " | ".join(f"{r[k]:.3f}" for r in rows)
        print(f"| {k} | {cells} |", file=sys.stderr)


if __name__ == "__main__":
    main()
