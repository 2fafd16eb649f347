"""Decompose the fused frame step's on-chip cost (round-3 task 2).

Times make_frame_step variants (motion detection / object detection toggled,
stride swept) on the real chip at the bench operating point (480x640, grid
160x160x48, voxel 0.1). Methodology matches scripts/roofline.py: K chained
dispatches, one sync, median of rounds.

    PYTHONPATH=. python scripts/step_profile.py
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from khronos_tpu.active_window.fused_step import make_frame_step
    from khronos_tpu.active_window.motion_detection import FreeSpaceMotionDetectorConfig
    from khronos_tpu.active_window.object_detection import ConnectedSemanticsConfig
    from khronos_tpu.data import synthetic as syn
    from khronos_tpu.geometry.camera import Camera
    from khronos_tpu.map import active_volume as av

    H, W = 480, 640
    camera = Camera(H, W, W * 0.625, W * 0.625, W / 2, H / 2, 0.1, 5.0)
    vol_cfg = av.VolumeConfig(grid_shape=(160, 160, 48), voxel_size=0.1)
    label_space = syn.default_label_space()
    md_cfg = FreeSpaceMotionDetectorConfig(min_cluster_size=400)
    od_cfg = ConnectedSemanticsConfig(min_cluster_size=50)

    scene = syn.office_scene(duration=30.0)
    seq = syn.SyntheticSequence(
        scene,
        syn.SyntheticSequenceConfig(
            duration=30.0, fps=10.0, height=H, width=W,
            fx=W * 0.625, fy=W * 0.625, cx=W / 2, cy=H / 2,
        ),
    )
    f = seq.render_frame(50)
    depth, color, labels = f["depth"], f["color"], f["labels"]
    R, t = jnp.asarray(f["R_w_c"]), jnp.asarray(f["t_w_c"])

    origin = np.floor(
        np.asarray(t) / vol_cfg.voxel_size
        - np.asarray(vol_cfg.grid_shape) / 2.0
    ).astype(np.int32)
    state0 = av.create(vol_cfg)._replace(origin=jnp.asarray(origin))

    def timeit(step, state, k=10, rounds=5):
        out = step(state, depth, color, labels, R, t, jnp.float32(5.0))
        jax.block_until_ready(out)
        times = []
        for _ in range(rounds):
            s = out[0]
            t0 = time.perf_counter()
            for i in range(k):
                o = step(s, depth, color, labels, R, t, jnp.float32(5.0 + i))
                s = o[0]
            jax.block_until_ready(o)
            times.append((time.perf_counter() - t0) / k)
        return float(np.median(times)) * 1e3

    variants = [
        ("full_stride2", md_cfg, od_cfg, 2),
        ("integrate_only", None, None, 2),
        ("md_only_stride2", md_cfg, None, 2),
        ("od_only_stride2", None, od_cfg, 2),
        ("full_stride1", md_cfg, od_cfg, 1),
        ("full_stride4", md_cfg, od_cfg, 4),
    ]
    results = {}
    for name, md, od, stride in variants:
        step = make_frame_step(
            vol_cfg, camera, md, od, label_space,
            donate=False, detection_stride=stride,
        )
        ms = timeit(step, state0)
        results[name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
