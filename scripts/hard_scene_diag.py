"""Per-GT-change diagnosis of a saved hard-scene run (r4 VERDICT task 2:
'report the table even where it is ugly, then tune' — with a written
diagnosis per loss).

    python scripts/hard_scene_diag.py <run_dir>

For every GT change: the associated estimated object (as the change
evaluator associates), its raw + reconciled observation interval, its
change-record absent times, and WHY the evaluator scored it TP/FN.
Also: dynamic-recall visibility ceiling and missed-object detail.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    run_dir = sys.argv[1]
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else 60.0
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.eval.pipeline_evaluator import SceneGroundTruth
    from khronos_tpu.eval.evaluators import ObjectEvaluatorConfig
    from khronos_tpu.stm.spatio_temporal_map import SpatioTemporalMap

    scene = syn.hard_scene(duration=duration)
    gt = SceneGroundTruth(scene, duration)
    stm = SpatioTemporalMap.load(os.path.join(run_dir, "final.4dmap.npz"))
    final = stm.get_dsg(stm.stamps()[-1])
    est = [o for o in final.objects.values() if not o.is_dynamic]
    acfg = ObjectEvaluatorConfig()
    end_ns = int(duration * 1e9)
    tol_ns = int(10e9)

    names = {}
    for i, p in enumerate(scene.primitives):
        names[i] = p.name
    print("=== GT changes ===")
    for g in gt.gt_objects():
        appeared = g.t_appear_ns > 0
        disappeared = g.t_disappear_ns < end_ns
        if not (appeared or disappeared):
            continue
        cand = sorted(
            (float(np.linalg.norm(e.position() - g.center)), e) for e in est
        )
        near = [(d, e) for d, e in cand if d <= acfg.max_match_distance]
        print(f"\nGT '{names.get(g.gt_id, g.gt_id)}' label={g.label} "
              f"center={np.round(g.center, 1).tolist()} "
              f"appear={g.t_appear_ns/1e9 if appeared else None} "
              f"disappear={g.t_disappear_ns/1e9 if disappeared else None}")
        if not near:
            print("   -> NO estimated object within match distance (object never "
                  "extracted or mis-localized): change unscoreable = FN")
            continue
        d, e = near[0]
        first = e.first_observed_ns[0] / 1e9
        last = e.last_observed_ns[-1] / 1e9
        print(f"   associated est obj {e.node_id} at {d:.2f} m, reconciled "
              f"presence [{first:.1f}, {last:.1f}]s "
              f"(intervals={[(round(a/1e9,1), round(b/1e9,1)) for a,b in zip(e.first_observed_ns, e.last_observed_ns)]})")
        if appeared:
            ok = e.first_observed_ns[0] > 0 and abs(e.first_observed_ns[0] - g.t_appear_ns) <= tol_ns
            print(f"   appearance: est_t={first:.1f} gt_t={g.t_appear_ns/1e9:.1f} "
                  f"err={abs(e.first_observed_ns[0]-g.t_appear_ns)/1e9:.1f}s -> {'TP' if ok else 'FN'}")
        if disappeared:
            claimed = e.last_observed_ns[-1] < end_ns
            ok = claimed and abs(e.last_observed_ns[-1] - g.t_disappear_ns) <= tol_ns
            print(f"   disappearance: est_t={last:.1f} gt_t={g.t_disappear_ns/1e9:.1f} "
                  f"claimed={claimed} err={abs(e.last_observed_ns[-1]-g.t_disappear_ns)/1e9:.1f}s -> {'TP' if ok else 'FN'}")
        # other nearby est objects (identity splits / duplicates)
        for d2, e2 in near[1:4]:
            print(f"   (also near: obj {e2.node_id} at {d2:.2f} m, presence "
                  f"[{e2.first_observed_ns[0]/1e9:.1f}, {e2.last_observed_ns[-1]/1e9:.1f}])")

    print("\n=== missed static objects (present at end, no est within 2 m) ===")
    q_ns = stm.stamps()[-1]
    from khronos_tpu.utils.intervals import is_present
    for g in gt.gt_objects():
        if not (g.t_appear_ns <= q_ns <= g.t_disappear_ns):
            continue
        dmin = min(
            (float(np.linalg.norm(e.position() - g.center)) for e in est),
            default=np.inf,
        )
        if dmin > acfg.max_match_distance:
            print(f"  MISSED '{names.get(g.gt_id, g.gt_id)}' label={g.label} "
                  f"center={np.round(g.center, 1).tolist()} nearest est {dmin:.1f} m")

    print("\n=== dynamic visibility ceiling ===")
    # fraction of GT human timestamps inside the camera frustum + range
    seq = syn.TourSequence(scene, syn.SyntheticSequenceConfig(
        duration=duration, fps=3.0, height=96, width=128, fx=80.0, fy=80.0,
        cx=64.0, cy=48.0, n_loops=2.0))
    gt_dyn = gt.gt_dynamic_trajectories()
    vis = tot = 0
    for gid, (stamps, pos) in gt_dyn.items():
        for s, p in zip(stamps, pos):
            t = s / 1e9
            if t > duration:
                continue
            R, c = seq.pose_at(t)
            rel = R.T @ (p - c)
            tot += 1
            if rel[2] > 0.3 and np.linalg.norm(rel) < 5.0:
                u = 80.0 * rel[0] / rel[2] + 64.0
                v = 80.0 * rel[1] / rel[2] + 48.0
                if 0 <= u < 128 and 0 <= v < 96:
                    vis += 1
    print(f"  humans in frustum+range: {vis}/{tot} = {vis/max(tot,1):.3f} "
          f"(dynamic recall is bounded by this)")


if __name__ == "__main__":
    main()
