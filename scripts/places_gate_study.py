"""Places-gate efficacy study (r4 VERDICT task 8).

The hydra-LCD places tier (clearance-histogram descriptors, L1-matched,
reference uHumans2.yaml:262,288-296) gates loop-closure candidates top-down.
Round 3 wired it but never measured it; this study runs the drifted office
e2e, then scores EVERY described keyframe pair offline and splits them into

    true-loop pairs:   GT distance <= 1.5 m, time gap >= 8 s
    false candidates:  GT distance >= 4 m

reporting the score distributions, the false-veto rate (true pairs under
threshold) and rejection rate (false pairs under threshold) across candidate
thresholds — the data `PlacesGateConfig.min_score` is chosen from — plus the
LIVE gate audit trail of the run (place_gate_events).

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=. \
        python scripts/places_gate_study.py
"""

import json

import numpy as np


def main():
    from khronos_tpu.active_window.frame_data import FrameData
    from khronos_tpu.backend.loop_closure import _place_descriptor_score
    from khronos_tpu.config import build
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.pipeline.pipeline import (
        ExperimentConfig,
        ExperimentManager,
        KhronosPipeline,
        PipelineConfig,
    )
    import tempfile

    duration, fps = 24.0, 3.0
    scene = syn.office_scene(duration=duration)
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=duration, fps=fps, height=60, width=80,
            fx=50.0, fy=50.0, cx=40.0, cy=30.0, n_loops=2.0, drift_rate=0.06,
        ),
    )
    cfg = build(
        PipelineConfig,
        {
            "active_window": {
                "volumetric_map": {"grid_shape": [128, 128, 32], "voxel_size": 0.1},
                "tracker": {"type": "MaxIouTracker", "min_num_observations": 3},
            },
            "backend": {
                "lcd": {
                    "type": "HybridLoopClosure",
                    "constellation": {"min_time_gap": 8.0, "min_objects": 3},
                    "appearance": {
                        "min_time_gap": 8.0,
                        "max_registration_rms": 0.3,
                        "noise_bound": 0.15,
                    },
                }
            },
            "label_space": {"num_classes": 7, "object_labels": [], "dynamic_labels": [1]},
            "run_change_detection_every_n_frames": 60,
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)
    out_dir = tempfile.mkdtemp(prefix="places_gate_")
    mgr = ExperimentManager(ExperimentConfig(output_dir=out_dir), pipe, cfg)
    frames, gt_pos = [], []
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        Ro, to = seq.odometry_pose(i)
        frames.append(
            FrameData(
                stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
                labels=f["labels"], R_w_c=np.asarray(Ro, np.float32),
                t_w_c=np.asarray(to, np.float32),
            )
        )
        gt_pos.append(np.asarray(f["t_gt"], np.float64))
    mgr.run(frames, None)

    lcd = pipe.backend.lcd
    be = pipe.backend
    # key -> (GT position, stamp): agents are in frame order
    stamps = np.asarray([f.stamp_ns for f in frames], np.int64)
    key_info = {}
    for i, a in enumerate(be.agents):
        fi = int(np.argmin(np.abs(stamps - a.stamp_ns)))
        key_info[be.agent_keys[i]] = (gt_pos[fi], a.stamp_ns)

    described = {
        k: d for k, d in lcd._place_descs.items() if d is not None and k in key_info
    }
    keys = sorted(described)
    true_scores, false_scores = [], []
    for ii, ka in enumerate(keys):
        for kb in keys[ii + 1:]:
            pa, sa = key_info[ka]
            pb, sb = key_info[kb]
            if abs(sa - sb) < int(8e9):
                continue
            d = float(np.linalg.norm(pa - pb))
            s = _place_descriptor_score(described[ka], described[kb])
            if d <= 1.5:
                true_scores.append(s)
            elif d >= 4.0:
                false_scores.append(s)
    true_scores = np.asarray(true_scores)
    false_scores = np.asarray(false_scores)
    print(json.dumps({
        "described_keyframes": len(keys),
        "true_pairs": len(true_scores),
        "false_pairs": len(false_scores),
        "true_score_min": round(float(true_scores.min()), 3) if len(true_scores) else None,
        "true_score_p05": round(float(np.percentile(true_scores, 5)), 3) if len(true_scores) else None,
        "true_score_mean": round(float(true_scores.mean()), 3) if len(true_scores) else None,
        "false_score_mean": round(float(false_scores.mean()), 3) if len(false_scores) else None,
        "false_score_p95": round(float(np.percentile(false_scores, 95)), 3) if len(false_scores) else None,
        "false_score_max": round(float(false_scores.max()), 3) if len(false_scores) else None,
    }))
    for thr in (0.2, 0.3, 0.35, 0.4, 0.5, 0.6, 0.7):
        fv = float((true_scores < thr).mean()) if len(true_scores) else 0.0
        rej = float((false_scores < thr).mean()) if len(false_scores) else 0.0
        print(json.dumps({"min_score": thr,
                          "false_veto_rate_true_pairs": round(fv, 3),
                          "rejection_rate_false_pairs": round(rej, 3)}))
    # live audit from the run
    ev = lcd.place_gate_events
    live_false_vetoes = 0
    for qk, ck, s, ok, desc in ev:
        if not ok and desc and qk in key_info and ck in key_info:
            d = float(np.linalg.norm(key_info[qk][0] - key_info[ck][0]))
            if d <= 1.5:
                live_false_vetoes += 1
    print(json.dumps({
        "live_gate_checks": len(ev),
        "live_rejections": lcd.place_gate_rejections,
        "live_false_vetoes_true_pairs": live_false_vetoes,
    }))
    for qk, ck, s, ok, desc in ev:
        d = (
            float(np.linalg.norm(key_info[qk][0] - key_info[ck][0]))
            if qk in key_info and ck in key_info else None
        )
        print(json.dumps({"event": [qk, ck], "score": round(s, 3), "passed": ok,
                          "described": desc, "gt_distance_m": round(d, 2) if d is not None else None}))


if __name__ == "__main__":
    main()
