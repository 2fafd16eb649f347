"""One run, both numbers: quality at the BENCH operating point (round-3
VERDICT task 3).

Runs the office pipeline at the exact bench configuration (480x640 RGB-D at
10 fps, grid 160x160x48 voxel 0.1 m, detection stride per --stride, CD every
50 frames + on loop closure, GT-gated loop closures) WITH evaluation enabled,
and prints the full metrics table from THAT run — the same config bench.py
times. Also reports wall fps for the run so throughput and quality come from
one operating point.

    python -c "import sys; sys.path.insert(0,'.'); \
        exec(open('scripts/bench_quality.py').read())"      # real chip
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DURATION = 24.0
FPS = 10.0


def run(stride: int, out_dir: str, seed_dynamic: bool = True, noise: bool = False):
    import jax

    from khronos_tpu.active_window.frame_data import FrameData
    from khronos_tpu.config import build
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.eval.pipeline_evaluator import (
        PipelineEvaluator,
        PipelineEvaluatorConfig,
        SceneGroundTruth,
    )
    from khronos_tpu.pipeline.pipeline import KhronosPipeline, PipelineConfig

    scene = syn.office_scene(duration=DURATION)
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=DURATION, fps=FPS, height=480, width=640,
            fx=640 * 0.625, fy=640 * 0.625, cx=320.0, cy=240.0, n_loops=2.0,
            # r5 task 9: measured sensor-noise model (depth^2 range noise +
            # quantization, edge jitter/dropout, label flicker)
            noise=syn.SensorNoiseConfig() if noise else None,
        ),
    )
    cfg = build(
        PipelineConfig,
        {
            "active_window": {
                "volumetric_map": {"grid_shape": [160, 160, 48], "voxel_size": 0.1},
                "detection_stride": stride,
                # thresholds scaled to the operating point: cluster sizes
                # follow pixel density (96x128 e2e values x25), confirmation
                # follows TIME (0.5 s at 10 fps = 5 observations)
                # seed_dynamic_labels: the adopted quality config (r3
                # semantic motion seeding; re-measured at the bench point in
                # r4 per VERDICT task 3)
                "motion_detector": {"type": "FreeSpaceMotionDetector", "min_cluster_size": 1500, "grow_iterations": 12, "seed_dynamic_labels": seed_dynamic,
                                    # ground removal (reference min_z_coordinate,
                                    # free_space_motion_detector.h:92): floor pixels
                                    # admitted by the one-step label spread dragged
                                    # cluster centroids to z~0 vs GT agent centers at
                                    # 0.85 - every centroid then missed the 0.5 m
                                    # 3D match gate (r5: 29 of 40 dynamic FP points
                                    # had dz 0.78-0.85)
                                    "min_z": 0.1},
                "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 750},
                "tracker": {"type": "MaxIouTracker", "min_num_observations": 5},
                "object_extractor": {
                    "type": "MeshObjectExtractor",
                    "min_num_observations": 5,
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
            "run_change_detection_every_n_frames": 50,
            "change_detection": {
                "verificator": {"ray_policy": "All", "temporal_resolution": 2.0},
                "detector": {"window_size": 3, "evidence_prior": 2.0},
            },
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)

    print(f"rendering {seq.n_frames} frames ...", file=sys.stderr)
    frames, gts = [], []
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        jax.block_until_ready(f["depth"])
        frames.append(f)
        gts.append((f["R_gt"], f["t_gt"]))

    print("running pipeline ...", file=sys.stderr)
    t0 = time.perf_counter()
    for f, gt in zip(frames, gts):
        pipe.process_frame(
            FrameData(
                stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
            ),
            gt_pose=gt,
        )
    fps_wall = seq.n_frames / (time.perf_counter() - t0)
    pipe.finish()

    print("evaluating ...", file=sys.stderr)
    gt = SceneGroundTruth(scene, DURATION, n_bg_points=30000)
    gt_traj = (
        np.asarray([f["stamp_ns"] for f in frames], np.int64),
        np.stack([t for _, t in gts]).astype(np.float64),
    )
    ev = PipelineEvaluator(PipelineEvaluatorConfig(only_final=True))
    summary = ev.evaluate(pipe.map, gt, out_dir, gt_trajectory=gt_traj)
    out = {
        "stride": stride,
        "noise": noise,
        "wall_fps_incl_compile": round(fps_wall, 2),
        "ate_rmse": round(summary["trajectory"]["ate_rmse"], 4),
        "mesh_acc@0.2": round(summary["mesh"]["accuracy@0.2"], 4),
        "mesh_comp@0.2": round(summary["mesh"]["completeness@0.2"], 4),
        "mesh_f1@0.2": round(summary["mesh"]["f1@0.2"], 4),
        "obj_precision": round(summary["objects"]["precision"], 4),
        "obj_recall": round(summary["objects"]["recall"], 4),
        "change_precision": round(summary["changes"]["change_precision"], 4),
        "change_recall": round(summary["changes"]["change_recall"], 4),
    }
    dyn = summary.get("dynamic", {})
    if dyn:
        out["dyn_precision"] = round(dyn.get("dynamic_precision", dyn.get("precision", 0.0)), 4)
        out["dyn_recall"] = round(dyn.get("dynamic_recall", dyn.get("recall", 0.0)), 4)
    # diagnostics: what the map actually holds
    dsg = pipe.backend.get_dsg()
    out["n_objects"] = len(dsg.objects)
    out["n_dynamic"] = sum(1 for o in dsg.objects.values() if o.is_dynamic)
    ch = pipe.change_detector.changes
    out["n_absent_changes"] = sum(
        1 for oc in ch.object_changes.values()
        if oc.last_absent_ns >= 0 or oc.first_absent_ns >= 0
    )
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--strides", type=int, nargs="+", default=[2])
    ap.add_argument("--out", default="/tmp/bench_quality")
    ap.add_argument("--no-seed", action="store_true", help="disable seed_dynamic_labels")
    ap.add_argument("--noise", action="store_true", help="enable the sensor-noise model")
    args = ap.parse_args([a for a in sys.argv[1:] if a != "-c"]) if "__file__" in globals() else ap.parse_args([])
    rows = [
        run(s, f"{args.out}_s{s}", seed_dynamic=not args.no_seed, noise=args.noise)
        for s in args.strides
    ]
    print(json.dumps(rows, indent=1))


main()
