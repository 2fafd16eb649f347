"""Hard-mode scene evaluation (r4 VERDICT task 2).

Runs the full pipeline + evaluation suite on `synthetic.hard_scene` — the
uHumans2-office-class difficulty tier: 4 rooms, 31 object instances
(compound/spherical shapes, near-duplicates, stacked clutter), 7 change
events (incl. a moved object and a partially-viewed removal), 4 crossing
humans — and prints the metrics table. The point is NON-SATURATED metrics:
the reference's own numbers are low because tesse_cd is hard
(object recall 43.3, change precision 34.7, khronos_eval/README.md:13-16).

    python scripts/hard_scene_eval.py                  # 96x128 (fast)
    python scripts/hard_scene_eval.py --bench-point    # 480x640 bench shape
    python scripts/hard_scene_eval.py --seed 1         # GT sampling seed
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

# repo root on sys.path WITHOUT requiring PYTHONPATH (setting PYTHONPATH
# breaks the axon TPU plugin registration in this environment)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(height=96, width=128, fps=3.0, duration=60.0, voxel=0.1,
        grid=(128, 128, 32), out_dir=None, seed=0, drift=0.0,
        ray_policy="All", all_max_observers=0):
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

    scene = syn.hard_scene(duration=duration)
    fx = 80.0 * (width / 128.0)
    seq = syn.TourSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=duration, fps=fps, height=height, width=width,
            fx=fx, fy=fx, cx=width / 2, cy=height / 2, n_loops=2.0,
            drift_rate=drift,
        ),
    )
    cfg = build(
        PipelineConfig,
        {
            "active_window": {
                "volumetric_map": {"grid_shape": list(grid), "voxel_size": voxel},
                "motion_detector": {"type": "FreeSpaceMotionDetector",
                                    "min_cluster_size": 60 * (height // 96),
                                    "grow_iterations": 12,
                                    "seed_dynamic_labels": True},
                "object_detector": {"type": "ConnectedSemantics",
                                    "min_cluster_size": 30 * (height // 96)},
                "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
                "object_extractor": {
                    "type": "MeshObjectExtractor",
                    "min_num_observations": 2,
                    "max_frames": 10,
                    "min_dynamic_displacement": 0.4,
                },
            },
            "backend": {"lcd": {"type": "GtLoopClosure", "min_time_gap": 20.0,
                                "max_distance": 1.0}},
            "label_space": {
                "num_classes": 7,
                "object_labels": [2, 3, 4, 5, 6],
                "dynamic_labels": [1],
            },
            "run_change_detection_every_n_frames": int(8 * fps),
            "change_detection": {
                "verificator": {"ray_policy": ray_policy,
                                "all_max_observers": all_max_observers,
                                "temporal_resolution": 2.0, "num_bins": 32},
                "detector": {"window_size": 3, "evidence_prior": 2.0},
            },
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)
    out_dir = out_dir or tempfile.mkdtemp(prefix="hard_scene_")
    mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)

    frames, gts = [], []
    t0 = time.time()
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        frames.append(FrameData(
            stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
            labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
        ))
        gts.append((f["R_gt"], f["t_gt"]))
    print(f"rendered {len(frames)} frames in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    mgr.run(frames, gts)
    print(f"pipeline ran in {time.time()-t0:.1f}s", flush=True)

    gt = SceneGroundTruth(scene, duration, n_bg_points=40000, seed=seed)
    gt_traj = (
        np.asarray([f.stamp_ns for f in frames], np.int64),
        np.stack([t for _, t in gts]).astype(np.float64),
    )
    ev = PipelineEvaluator(PipelineEvaluatorConfig(only_final=True))
    t0 = time.time()
    summary = ev.evaluate(pipe.map, gt, os.path.join(out_dir, "results"),
                          gt_trajectory=gt_traj)
    print(f"evaluated in {time.time()-t0:.1f}s", flush=True)

    # places/rooms check (r4 task 8: room count on the hard scene)
    final = pipe.map.snapshots[-1] if pipe.map.num_snapshots else None
    rooms = None
    if final is not None and getattr(final, "places", None) is not None:
        rooms = final.places.num_rooms
    # CD cost of the configured ray policy (task-4 cost/quality table)
    from khronos_tpu.utils.timing import TimingRecorder

    cd_stats = {}
    for s in TimingRecorder.instance().stats():
        if s["name"] in ("change_detection/all", "change_detection/update_verificator"):
            cd_stats[s["name"].split("/")[-1]] = round(s["mean_s"], 2)
    out = {
        "shape": f"{height}x{width}", "fps": fps, "n_frames": len(frames),
        "seed": seed, "ray_policy": ray_policy,
        "all_max_observers": all_max_observers,
        "cd_pass_mean_s": cd_stats,
        "mesh": {k: round(float(v), 4) for k, v in summary["mesh"].items()},
        "objects": {k: (round(float(v), 4) if isinstance(v, float) else v)
                    for k, v in summary["objects"].items()},
        "dynamic": {k: (round(float(v), 4) if isinstance(v, float) else v)
                    for k, v in summary["dynamic"].items()},
        "changes": {k: (round(float(v), 4) if isinstance(v, float) else v)
                    for k, v in summary["changes"].items()},
        "trajectory": {k: round(float(v), 4) for k, v in summary.get("trajectory", {}).items()},
        "num_rooms": rooms,
        "out_dir": out_dir,
    }
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench-point", action="store_true",
                    help="480x640 / voxel 0.1 (the throughput bench shape)")
    ap.add_argument("--fps", type=float, default=3.0)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--drift", type=float, default=0.0)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--ray-policy", type=str, default="All")
    ap.add_argument("--cap", type=int, default=0, help="all_max_observers")
    args = ap.parse_args()
    kw = dict(fps=args.fps, duration=args.duration, out_dir=args.out,
              seed=args.seed, drift=args.drift, ray_policy=args.ray_policy,
              all_max_observers=args.cap)
    if args.bench_point:
        run(height=480, width=640, grid=(160, 160, 48), **kw)
    else:
        run(**kw)


if __name__ == "__main__":
    main()
