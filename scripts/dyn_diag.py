"""Per-timestamp dynamic-recall diagnosis (round-3 task 6).

For every GT human trajectory timestamp: was it inside the camera frustum +
range, and did a tracked dynamic trajectory match it? Misses are bucketed by
position within their visibility window (entry / middle / exit) to separate
warm-up, confirmation lag, and mid-window losses.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=. \
        python scripts/dyn_diag.py
"""

import json
import sys
import tempfile

import numpy as np


def main():
    from khronos_tpu.active_window.frame_data import FrameData
    from khronos_tpu.config import build
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.eval.pipeline_evaluator import SceneGroundTruth
    from khronos_tpu.pipeline.pipeline import (
        ExperimentConfig, ExperimentManager, KhronosPipeline, PipelineConfig,
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
                    "type": "MeshObjectExtractor", "min_num_observations": 2,
                    "max_frames": 10, "min_dynamic_displacement": 0.4,
                },
            },
            "backend": {"lcd": {"type": "GtLoopClosure", "min_time_gap": 8.0, "max_distance": 1.0}},
            "label_space": {"num_classes": 7, "object_labels": [2, 3, 4, 5, 6], "dynamic_labels": [1]},
            "run_change_detection_every_n_frames": 24,
            "change_detection": {
                "verificator": {"ray_policy": "All", "temporal_resolution": 2.0, "num_bins": 32},
                "detector": {"window_size": 3, "evidence_prior": 2.0},
            },
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)
    out_dir = tempfile.mkdtemp(prefix="dyndiag_")
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
    gt_dyn = gt.gt_dynamic_trajectories()
    dsg = pipe.map.snapshots[-1]
    est_dyn = [o for o in dsg.objects.values() if o.is_dynamic]
    print(f"{len(est_dyn)} dynamic tracks:", file=sys.stderr)
    for e in est_dyn:
        es = np.asarray(e.trajectory_stamps_ns) * 1e-9
        print(f"  obj {e.node_id}: [{es[0]:.2f}, {es[-1]:.2f}] ({len(es)} pts)",
              file=sys.stderr)

    cam = seq.camera
    rows = []
    for gid, (stamps, pos) in gt_dyn.items():
        # visibility per GT timestamp: in frustum + range from the GT pose
        vis = np.zeros(len(stamps), bool)
        match = np.zeros(len(stamps), bool)
        for k, (t, p) in enumerate(zip(stamps, pos)):
            R, tw = seq.pose_at(t * 1e-9)
            pc = R.T @ (np.asarray(p) - tw)
            if pc[2] <= 0.2 or np.linalg.norm(pc) > cam.max_range:
                continue
            u = pc[0] / pc[2] * cam.fx + cam.cx
            v = pc[1] / pc[2] * cam.fy + cam.cy
            if not (0 <= u < cam.width and 0 <= v < cam.height):
                continue
            vis[k] = True
            for e in est_dyn:
                es = np.asarray(e.trajectory_stamps_ns)
                if len(es) == 0 or t < es[0] or t > es[-1]:
                    continue
                i = np.clip(np.searchsorted(es, t), 0, len(es) - 1)
                ep = np.asarray(e.trajectory_positions).reshape(-1, 3)[i]
                if np.linalg.norm(ep - np.asarray(p)) <= 0.5:
                    match[k] = True
                    break
        # visibility windows and where the misses sit
        rows.append((gid, stamps, vis, match))
        n_windows = 0
        in_win = False
        for k in range(len(stamps)):
            if vis[k] and not in_win:
                n_windows += 1
                in_win = True
            elif not vis[k]:
                in_win = False
        print(
            f"human {gid}: {vis.sum()}/{len(stamps)} visible "
            f"({n_windows} windows), matched {int((vis & match).sum())} "
            f"visible + {int((~vis & match).sum())} non-visible",
            file=sys.stderr,
        )
        # miss structure within each window
        k = 0
        while k < len(stamps):
            if not vis[k]:
                k += 1
                continue
            j = k
            while j < len(stamps) and vis[j]:
                j += 1
            seg = match[k:j]
            t0, t1 = stamps[k] * 1e-9, stamps[j - 1] * 1e-9
            pat = "".join("X" if m else "." for m in seg)
            print(f"   window [{t0:6.2f},{t1:6.2f}] {pat}", file=sys.stderr)
            k = j

    total = sum(len(s) for _, s, _, _ in rows)
    visible = sum(int(v.sum()) for _, _, v, _ in rows)
    matched = sum(int(m.sum()) for _, _, _, m in rows)
    print(json.dumps({
        "gt_timestamps": total,
        "visible": visible,
        "visible_frac": round(visible / total, 3),
        "matched": matched,
        "recall_all": round(matched / total, 3),
        "recall_visible": round(
            sum(int((v & m).sum()) for _, _, v, m in rows) / max(visible, 1), 3
        ),
    }))


main()
