"""Roofline/bandwidth accounting for the three hot kernels (VERDICT r1
task 8): the fused frame step (integrate + detection gather), the mesh
extraction program, and the change-detection ray query.

Methodology:
  - time: K calls dispatched back-to-back, ONE block_until_ready at the end
    (the dev tunnel adds ~10-30 ms latency per host sync; chaining amortizes
    it like the real frame loop does), median of several rounds.
  - analytic bytes: the MINIMUM HBM traffic = every distinct input read once
    + every output written once (sum of array nbytes). Fusion cannot beat
    this; the gap between achieved and peak bandwidth is the room left.
  - XLA logical bytes ("bytes accessed" from cost_analysis) are reported for
    reference but COUNT OPERAND REUSE inside fusions — they exceed physical
    HBM traffic by 10-100x and must not be read as achieved bandwidth.

TPU v5e: HBM ~819 GB/s peak.

    PYTHONPATH=.:$PYTHONPATH python scripts/roofline.py     # real chip

Prints JSON lines + a markdown table for METRICS.md.
"""

import json
import sys
import time

import numpy as np

HBM_PEAK_GBS = 819.0  # TPU v5e


def nbytes(tree) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree.leaves(tree) if hasattr(x, "nbytes"))


def measure(name, jitted, args, chain_state: bool, k: int = 20, rounds: int = 5):
    """chain_state=True: output[0] is the state fed back as args[0]."""
    import jax

    out = jitted(*args)  # compile
    jax.block_until_ready(out)
    cost = jitted.lower(*args).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    in_b = nbytes(args)
    out_b = nbytes(out)
    analytic = in_b + out_b
    times = []
    for _ in range(rounds):
        state_args = args
        t0 = time.perf_counter()
        for _ in range(k):
            out = jitted(*state_args)
            if chain_state:
                state_args = (out[0],) + args[1:]
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / k)
    dt = float(np.median(times))
    row = {
        "kernel": name,
        "ms": round(dt * 1e3, 3),
        "analytic_GB": round(analytic / 1e9, 4),
        "achieved_GBs": round(analytic / dt / 1e9, 1),
        "pct_HBM_peak": round(100.0 * analytic / dt / 1e9 / HBM_PEAK_GBS, 1),
        "xla_logical_GB": round(float(cost.get("bytes accessed", 0.0)) / 1e9, 2),
        "GFLOPs": round(float(cost.get("flops", 0.0)) / 1e9, 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    import jax
    import jax.numpy as jnp

    from khronos_tpu.active_window import fused_step as fs
    from khronos_tpu.active_window.motion_detection import FreeSpaceMotionDetectorConfig
    from khronos_tpu.active_window.object_detection import ConnectedSemanticsConfig, LabelSpace
    from khronos_tpu.changes import ray_verificator as rv
    from khronos_tpu.geometry.camera import Camera
    from khronos_tpu.map import active_volume as av
    from khronos_tpu.map import meshing

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rows = []

    # --- 1) fused frame step at the bench operating point
    H, W = 480, 640
    cfg = av.VolumeConfig(grid_shape=(160, 160, 48), voxel_size=0.1,
                          truncation_distance=0.2)
    cam = Camera(H, W, W * 0.625, W * 0.625, W / 2, H / 2, max_range=5.0)
    ls = LabelSpace(num_classes=7, object_labels=[2, 3, 4, 5, 6], dynamic_labels=[1])
    state = av.create(cfg, origin_xyz=np.array([-8.0, -8.0, -1.0]))
    depth = jnp.full((H, W), 2.5, jnp.float32)
    color = jnp.full((H, W, 3), 0.5, jnp.float32)
    labels = jnp.full((H, W), 2, jnp.int32)
    R = jnp.eye(3)
    t = jnp.zeros(3)
    for stride in (2, 1):
        step = fs.make_frame_step(
            cfg, cam, FreeSpaceMotionDetectorConfig(min_cluster_size=400),
            ConnectedSemanticsConfig(min_cluster_size=50), ls,
            donate=False, detection_stride=stride,
        )
        rows.append(measure(
            f"fused_frame_step 480x640 grid160 stride{stride}",
            step, (state, depth, color, labels, R, t, jnp.float32(0.5)),
            chain_state=True,
        ))

    # --- 2) mesh extraction program (one async round's device part)
    state2 = av.integrate_frame(cfg, cam, state, depth, color, labels,
                                jnp.zeros((H, W), jnp.bool_), R, t,
                                jnp.float32(0.5))
    emit_mask = meshing.finish_emission_mask(state2)

    def extract_once(st, mask):
        st, packed, meta = meshing.extract_mesh_async(
            st, mask, cfg, max_cells=8192, copy_meta=False)
        return st, packed

    ex = jax.jit(extract_once)
    rows.append(measure("mesh_extract 8192cells", ex, (state2, emit_mask),
                        chain_state=True))

    # --- 3) change-detection ray query at office-final scale
    rng = np.random.default_rng(0)
    nv = 200_000
    verts = rng.uniform(-8, 8, (nv, 3)).astype(np.float32)
    agents = rng.uniform(-6, 6, (600, 3)).astype(np.float32)
    ver = rv.RayVerificator(rv.RayVerificatorConfig(ray_policy="Middle"))
    obs = rng.integers(0, len(agents), nv)
    ver._build_index(agents[obs], verts,
                     rng.uniform(0, 300, nv).astype(np.float32))
    pts = jnp.asarray(verts[: ver.QUERY_CHUNK])
    lib = (ver.sorted_rays, ver.cell_start, ver.ray_table)

    def q(p, sr, cs, table):
        return rv._query_device(
            p, sr, cs, table, ver.config.hash_cells,
            ver.config.block_size,
            ver.config.radial_tolerance, ver.config.depth_tolerance,
            ver.config.temporal_resolution, ver.config.num_bins,
            ver.config.max_candidates,
        )

    rows.append(measure(f"ray_query chunk{ver.QUERY_CHUNK} of {nv // 1000}k rays",
                        jax.jit(q), (pts,) + lib, chain_state=False))

    print("\n| kernel | ms | analytic GB (min HBM) | achieved GB/s | % peak | XLA logical GB |",
          file=sys.stderr)
    print("|---|---|---|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['kernel']} | {r['ms']} | {r['analytic_GB']} | "
              f"{r['achieved_GBs']} | {r['pct_HBM_peak']} | {r['xla_logical_GB']} |",
              file=sys.stderr)


if __name__ == "__main__":
    main()
