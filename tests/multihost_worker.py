"""Worker for the multi-process (multi-host analog) sharding test.

Launched by tests/test_multihost.py as 2 separate python processes, each
owning 2 CPU devices (4 global): initializes jax.distributed (Gloo CPU
collectives = the DCN analog), builds the identical volume state in every
process, shards it over the GLOBAL mesh, runs the full fused frame step
twice, and prints checksums for the parent to compare against the
single-process reference.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    import jax

    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from khronos_tpu.active_window.motion_detection import FreeSpaceMotionDetectorConfig
    from khronos_tpu.active_window.object_detection import (
        ConnectedSemanticsConfig,
        LabelSpace,
    )
    from khronos_tpu.geometry.camera import Camera
    from khronos_tpu.map import active_volume as av
    from khronos_tpu.parallel import sharding as sh

    n_dev = len(jax.devices())
    assert jax.process_count() == nproc

    cfg = av.VolumeConfig(grid_shape=(32, 32, 16), voxel_size=0.1)
    cam = Camera(48, 64, 40.0, 40.0, 32.0, 24.0, max_range=5.0)
    ls = LabelSpace(num_classes=7, object_labels=[2, 3, 4, 5, 6], dynamic_labels=[1])
    md = FreeSpaceMotionDetectorConfig(min_cluster_size=5)
    od = ConnectedSemanticsConfig(min_cluster_size=5)

    # identical deterministic inputs in every process
    rng = np.random.default_rng(11)
    depth = rng.uniform(0.4, 1.4, (48, 64)).astype(np.float32)
    color = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    labels = np.zeros((48, 64), np.int32)
    labels[10:30, 20:44] = 3
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)

    mesh = Mesh(np.asarray(jax.devices()), ("x",))
    state_np = jax.tree.map(np.asarray, av.create(cfg, origin_xyz=np.array([-1.6, -1.6, -0.6])))
    vol_shard = sh.volume_sharding(mesh)

    def shard_field(arr, sharding):
        return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])

    state = jax.tree.map(shard_field, state_np, vol_shard)
    step = sh.make_sharded_frame_step(cfg, cam, md, od, ls, mesh)

    rep = NamedSharding(mesh, P())
    dj = jax.device_put(jnp.asarray(depth), rep)
    cj = jax.device_put(jnp.asarray(color), rep)
    lj = jax.device_put(jnp.asarray(labels), rep)
    for k in range(2):
        state, dyn_img, obj_img, packed = step(
            state, dj, cj, lj, R, t, jnp.float32(0.5 + 0.5 * k)
        )

    # replicated scalar checksums via a jitted global reduction
    def checksums(state, obj_img, packed):
        return (
            jnp.sum(state.weight),
            jnp.sum(jnp.abs(state.tsdf)),
            jnp.sum(obj_img),
            jnp.sum(jnp.where(jnp.isfinite(packed), packed, 0.0)),
        )

    out = jax.jit(checksums, out_shardings=rep)(state, obj_img, packed)
    vals = [float(np.asarray(jax.device_get(v))) for v in out]
    print(json.dumps({
        "pid": pid,
        "devices": n_dev,
        "weight_sum": vals[0],
        "tsdf_abs_sum": vals[1],
        "obj_sum": vals[2],
        "packed_sum": vals[3],
    }), flush=True)


if __name__ == "__main__":
    main()
