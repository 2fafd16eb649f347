"""GT builders: clustering, color mapping, consolidation, prune-to-observed."""

import os

import numpy as np

from khronos_tpu.eval import ground_truth as gt
from khronos_tpu.eval.evaluators import GtObject


def _blob(center, n=50, scale=0.05, seed=0):
    rng = np.random.default_rng(seed)
    return center + rng.normal(0, scale, (n, 3)).astype(np.float32)


def test_euclidean_cluster_splits_and_merges():
    a = _blob([0, 0, 0], seed=1)
    b = _blob([3, 0, 0], seed=2)  # far -> separate
    c = _blob([0.15, 0, 0], seed=3)  # near a -> merged
    pts = np.concatenate([a, b, c])
    ids = gt.euclidean_cluster(pts, tolerance=0.3, min_size=5)
    assert ids.min() >= 0
    assert len(np.unique(ids)) == 2
    # a and c share a cluster, b is its own
    assert ids[0] == ids[100]
    assert ids[0] != ids[50]


def test_euclidean_cluster_min_size():
    a = _blob([0, 0, 0], n=50)
    tiny = _blob([5, 5, 5], n=3)
    ids = gt.euclidean_cluster(np.concatenate([a, tiny]), tolerance=0.3, min_size=10)
    assert (ids[:50] >= 0).all()
    assert (ids[50:] == -1).all()


def test_color_label_map():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    m = gt.ColorLabelMap(palette, [1, 2, 3])
    labs = m(np.array([[0, 255, 0], [255, 0, 0], [7, 7, 7]], np.uint8))
    assert labs.tolist() == [2, 1, -1]
    m2 = gt.ColorLabelMap(palette, [1, 2, 3], nearest=True)
    labs2 = m2(np.array([[250, 5, 5], [10, 10, 250]], np.uint8))
    assert labs2.tolist() == [1, 3]


def test_build_gt_map():
    bg = _blob([0, 0, 0], n=200, scale=2.0, seed=4)
    chair = _blob([2, 2, 1], n=80, scale=0.1, seed=5)
    table = _blob([-2, 1, 1], n=80, scale=0.1, seed=6)
    pts = np.concatenate([bg, chair, table])
    labels = np.concatenate([np.zeros(200), np.full(80, 5), np.full(80, 5)]).astype(np.int32)
    cfg = gt.GtBuilderConfig(cluster_tolerance=0.3, min_cluster_size=10, object_labels=(5,))
    m = gt.build_gt_map(pts, labels, cfg)
    assert len(m.objects) == 2
    assert len(m.background_points) == 200
    centers = sorted(float(o.center[0]) for o in m.objects)
    assert abs(centers[0] - (-2)) < 0.2 and abs(centers[1] - 2) < 0.2
    # DSG view roundtrips through serialization
    dsg = m.to_scene_graph()
    assert len(dsg.objects) == 2 and dsg.mesh.num_vertices == 200


def test_build_gt_map_from_colors():
    pts = _blob([1, 1, 1], n=60, scale=0.1)
    colors = np.tile(np.array([[255, 0, 0]], np.uint8), (60, 1))
    cmap = gt.ColorLabelMap(np.array([[255, 0, 0]], np.uint8), [7])
    cfg = gt.GtBuilderConfig(cluster_tolerance=0.3, min_cluster_size=5, object_labels=(7,))
    m = gt.build_gt_map(pts, None, cfg, colors=colors, color_map=cmap)
    assert len(m.objects) == 1 and m.objects[0].label == 7


def test_prune_to_observed():
    cfg = gt.GtBuilderConfig(cluster_tolerance=0.3, min_cluster_size=5, object_labels=(5,))
    seen = _blob([0, 0, 0], n=60, scale=0.1, seed=7)
    unseen = _blob([10, 10, 10], n=60, scale=0.1, seed=8)
    pts = np.concatenate([seen, unseen])
    labels = np.full(120, 5, np.int32)
    m = gt.build_gt_map(pts, labels, cfg)
    assert len(m.objects) == 2
    observed = _blob([0, 0, 0], n=100, scale=0.2, seed=9)
    pruned = gt.prune_to_observed(m, observed, max_distance=0.5)
    assert len(pruned.objects) == 1
    assert np.linalg.norm(pruned.objects[0].center) < 1.0


def test_consolidation_appear_disappear():
    def mk(centers, stamp):
        objs = [
            GtObject(gt_id=i, label=5, center=np.asarray(c, np.float32),
                     bbox_min=np.asarray(c, np.float32) - 0.1,
                     bbox_max=np.asarray(c, np.float32) + 0.1)
            for i, c in enumerate(centers)
        ]
        return gt.GroundTruthMap(np.zeros((0, 3), np.float32), objs, stamp_ns=stamp)

    t1, t2 = 10**9, 2 * 10**9
    maps = [
        mk([[0, 0, 0], [5, 0, 0]], 0),  # chair + cooler-to-be-removed
        mk([[0, 0, 0]], t1),  # cooler removed
        mk([[0, 0, 0], [2, 2, 0]], t2),  # new object appears
    ]
    merged = gt.consolidate_gt_maps(maps)
    assert len(merged.objects) == 3
    by_center = {tuple(np.round(o.center).astype(int)): o for o in merged.objects}
    persistent = by_center[(0, 0, 0)]
    removed = by_center[(5, 0, 0)]
    added = by_center[(2, 2, 0)]
    assert persistent.t_appear_ns == gt.T_NEVER_APPEARED
    assert persistent.t_disappear_ns == gt.T_NEVER_DISAPPEARED
    assert removed.t_disappear_ns == t1
    assert added.t_appear_ns == t2
    assert added.t_disappear_ns == gt.T_NEVER_DISAPPEARED


def test_dynamic_gt_csv_roundtrip(tmp_path):
    seqs = {
        3: [(0, _blob([0, 0, 0], n=10)), (10**9, _blob([1, 0, 0], n=10))],
        4: [(0, _blob([5, 5, 0], n=10))],
    }
    trajs = gt.dynamic_gt_from_point_sequences(seqs)
    assert trajs[3][1].shape == (2, 3)
    path = os.path.join(tmp_path, "dyn.csv")
    gt.save_dynamic_gt_csv(path, trajs)
    back = gt.load_dynamic_gt_csv(path)
    assert set(back) == {3, 4}
    np.testing.assert_allclose(back[3][1], trajs[3][1], atol=1e-3)


def test_gt_map_save_load(tmp_path):
    cfg = gt.GtBuilderConfig(cluster_tolerance=0.3, min_cluster_size=5, object_labels=(5,))
    pts = np.concatenate([_blob([0, 0, 0], n=60, scale=0.1), _blob([3, 3, 3], n=100, scale=1.0)])
    labels = np.concatenate([np.full(60, 5), np.zeros(100)]).astype(np.int32)
    m = gt.build_gt_map(pts, labels, cfg)
    m.objects[0].t_disappear_ns = 123
    d = os.path.join(tmp_path, "gt")
    gt.save_gt_map(m, d)
    back = gt.load_gt_map(d)
    assert len(back.objects) == 1
    assert back.objects[0].t_disappear_ns == 123
    assert len(back.background_points) == 100
    np.testing.assert_allclose(back.objects[0].center, m.objects[0].center, atol=1e-3)


def test_gt_from_synthetic_scene_matches_oracle():
    """Build GT from a sampled synthetic-scene cloud; instance count and
    centers must match the scene's primitive oracle."""
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.eval.pipeline_evaluator import SceneGroundTruth

    scene = syn.office_scene(duration=30.0)
    pts, labs = syn.sample_scene_surface(scene, 1.0, n_points=30000, seed=0)
    oracle = SceneGroundTruth(scene, 30.0)
    gt_objs = [g for g in oracle.gt_objects() if g.present_at(int(1e9))]
    obj_labels = tuple(sorted({g.label for g in gt_objs}))
    cfg = gt.GtBuilderConfig(cluster_tolerance=0.35, min_cluster_size=15,
                             object_labels=obj_labels)
    m = gt.build_gt_map(pts, labs, cfg, stamp_ns=int(1e9))
    # every oracle object present at t=1s has a built instance within 0.5 m
    for g in gt_objs:
        d = min(np.linalg.norm(o.center - g.center) for o in m.objects)
        assert d < 0.5, f"gt object label={g.label} center={g.center} unmatched (d={d:.2f})"
