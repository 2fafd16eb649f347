"""Micro-profile the detection ops inside the fused step (round-3 task 2).

Times each device op in isolation at the bench operating point's shapes
(480x640 stride 2 detection = 240x320 pixels; camera crop of the 160^2x48
grid). Run from the repo root: python -c "import sys; sys.path.insert(0,'.');
exec(open('scripts/det_ops_profile.py').read())"
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from khronos_tpu.geometry.camera import Camera
    from khronos_tpu.map import active_volume as av
    from khronos_tpu.ops import clusters as cl
    from khronos_tpu.ops.dense import (
        dilate,
        max_pool3,
        propagate_labels_3d,
        propagate_labels_keyed_3d,
    )

    H, W = 240, 320  # detection res at stride 2
    vol_cfg = av.VolumeConfig(grid_shape=(160, 160, 48), voxel_size=0.1)
    camera = Camera(480, 640, 400.0, 400.0, 320.0, 240.0, 0.1, 5.0)
    crop = av.crop_shape_for_camera(vol_cfg, camera)
    n_crop = int(np.prod(crop))
    print(f"crop {crop} = {n_crop} voxels", file=sys.stderr)

    rng = np.random.default_rng(0)
    N = H * W
    ci = jnp.asarray(rng.integers(0, crop[0], (H, W)).astype(np.int32))
    cj = jnp.asarray(rng.integers(0, crop[1], (H, W)).astype(np.int32))
    ck = jnp.asarray(rng.integers(0, crop[2], (H, W)).astype(np.int32))
    in_grid = jnp.asarray(rng.random((H, W)) < 0.9)
    pts = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    seeds_np = rng.random(crop) < 0.02
    seeds = jnp.asarray(seeds_np)
    lin = jnp.arange(n_crop, dtype=jnp.int32).reshape(crop)
    labels0 = jnp.where(seeds, lin, -1)
    key = jnp.asarray(rng.integers(-1, 6, crop).astype(np.int32))
    compact_img = jnp.asarray(
        np.where(rng.random((H, W)) < 0.3, rng.integers(0, 8, (H, W)), -1).astype(np.int32)
    )
    vox_lin = (ci * crop[1] + cj) * crop[2] + ck
    raw77k = jnp.asarray(rng.integers(0, n_crop, (H, W)).astype(np.int32))

    ops = {
        "scatter_bool": jax.jit(
            lambda c1, c2, c3, g: jnp.zeros(crop, jnp.bool_).at[c1, c2, c3].max(g)
        ),
        "propagate_3d_16": jax.jit(
            lambda l, g: propagate_labels_3d(l, g, 16)
        ),
        "propagate_keyed_16": jax.jit(
            lambda l, k, g: propagate_labels_keyed_3d(l, k, g, 16)
        ),
        "dilate1": jax.jit(lambda m: dilate(m, 1)),
        "max_pool3": jax.jit(lambda l: max_pool3(l)),
        "gather_grid_at_pix": jax.jit(lambda l, c1, c2, c3: l[c1, c2, c3]),
        "compact_labels_table": jax.jit(
            lambda r: cl.compact_labels(r, 32, num_values=n_crop)
        ),
        "cluster_stats": jax.jit(
            lambda c, p: cl.cluster_stats(c, p, max_clusters=32)
        ),
        "cluster_voxel_counts": jax.jit(
            lambda c, v: cl.cluster_voxel_counts(c, v, 32, num_voxels=n_crop)
        ),
        "cluster_point_samples": jax.jit(
            lambda c, p: cl.cluster_point_samples(c, p, 64, 32)
        ),
        "argsort_77k": jax.jit(lambda x: jnp.argsort(x.reshape(-1))),
    }
    args = {
        "scatter_bool": (ci, cj, ck, in_grid),
        "propagate_3d_16": (labels0, seeds | (jnp.asarray(rng.random(crop) < 0.1))),
        "propagate_keyed_16": (labels0, key, key >= 0),
        "dilate1": (seeds,),
        "max_pool3": (labels0,),
        "gather_grid_at_pix": (labels0, ci, cj, ck),
        "compact_labels_table": (raw77k,),
        "cluster_stats": (compact_img, pts),
        "cluster_voxel_counts": (compact_img, vox_lin),
        "cluster_point_samples": (compact_img, pts),
        "argsort_77k": (raw77k,),
    }

    results = {}
    for name, fn in ops.items():
        a = args[name]
        out = fn(*a)
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(20):
                out = fn(*a)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / 20)
        results[name] = round(float(np.median(times)) * 1e3, 3)
        print(f"{name}: {results[name]} ms", file=sys.stderr)
    print(json.dumps(results))


main()
