"""Worker for the FULL-pipeline multi-process parity test (r4 VERDICT task 6).

Launched by tests/test_multihost.py as 2 python processes x 2 CPU devices
(4 global): initializes jax.distributed, then runs a short synthetic office
sequence through a complete KhronosPipeline in device-mesh mode
(active window + backend factor graph + one change-detection pass + 4D
snapshot) over the GLOBAL mesh. Host-side state (tracker, mesh accumulator,
factor graph, CD caches) runs replicated in every process; device state is
sharded over the global mesh. Prints end-state checksums for the parent to
compare against a single-process run of the same config.
"""

import json
import os
import sys


def run_pipeline(n_devices: int) -> dict:
    import numpy as np

    from khronos_tpu.active_window.frame_data import FrameData
    from khronos_tpu.config import build
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.pipeline.pipeline import KhronosPipeline, PipelineConfig

    X = max(n_devices * 8, 32)
    scene = syn.office_scene(duration=8.0)
    seq = syn.SyntheticSequence(scene, syn.SyntheticSequenceConfig(
        duration=8.0, fps=1.0, height=48, width=64,
        fx=40.0, fy=40.0, cx=32.0, cy=24.0,
    ))
    cfg = build(PipelineConfig, {
        "active_window": {
            "n_devices": n_devices,
            "volumetric_map": {"grid_shape": [X, 32, 16], "voxel_size": 0.3,
                               "truncation_distance": 0.6},
            "motion_detector": {"type": "FreeSpaceMotionDetector", "min_cluster_size": 5},
            "object_detector": {"type": "ConnectedSemantics", "min_cluster_size": 5},
            "tracker": {"type": "MaxIouTracker", "min_num_observations": 2},
            "object_extractor": {"type": "MeshObjectExtractor", "min_num_observations": 2},
        },
        "backend": {"lcd": {"type": "GtLoopClosure", "min_time_gap": 4.0,
                            "max_distance": 1.0}},
        "label_space": {"num_classes": 7, "object_labels": [2, 3, 4, 5, 6],
                        "dynamic_labels": [1]},
        "run_change_detection_every_n_frames": 4,
        "places": None,
    })
    pipe = KhronosPipeline(cfg, seq.camera)
    for i in range(seq.n_frames):
        f = seq.render_frame(i)
        pipe.process_frame(FrameData(
            stamp_ns=f["stamp_ns"], depth=f["depth"], color=f["color"],
            labels=f["labels"], R_w_c=f["R_w_c"], t_w_c=f["t_w_c"],
        ), gt_pose=(f["R_gt"], f["t_gt"]))
    pipe.finish()

    state = pipe.active_window.state
    dsg = pipe.backend.get_dsg()
    bg = pipe.change_detector.changes.background_states
    bg_counts = [int((bg == s).sum()) for s in (-1, 0, 1, 2)] if bg is not None else []
    # the weight grid is sharded over the GLOBAL mesh — reduce it to a
    # replicated scalar on device (addressable in every process) instead of
    # fetching the global array to one host
    import jax
    import jax.numpy as jnp

    if pipe.active_window.mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(pipe.active_window.mesh, PartitionSpec())
        wsum = jax.jit(jnp.sum, out_shardings=rep)(state.weight)
    else:
        wsum = jnp.sum(state.weight)
    return {
        "n_state_devices": len(state.tsdf.sharding.device_set),
        "weight_sum": float(np.asarray(wsum)),
        "n_agents": len(dsg.agents),
        "n_objects": len(dsg.objects),
        "n_mesh_vertices": int(dsg.mesh.num_vertices),
        "mesh_vertex_sum": round(float(np.abs(dsg.mesh.vertices).sum()), 1),
        "n_graph_nodes": pipe.backend.graph.num_nodes,
        "n_optimizations": pipe.backend.num_optimizations,
        "bg_state_counts": bg_counts,
        "n_snapshots": pipe.map.num_snapshots,
    }


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    import jax

    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert jax.process_count() == nproc
    out = run_pipeline(len(jax.devices()))
    out["pid"] = pid
    out["devices"] = len(jax.devices())
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
