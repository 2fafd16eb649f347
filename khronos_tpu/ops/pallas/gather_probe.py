"""Pallas integrate-frame gather experiment (VERDICT r1 task 8 / r3 task 2).

The fused frame step's per-voxel image lookup gathers an 8-byte payload
(depth f32 + packed rgb/label/exclusion word) per in-frustum voxel from the
camera image (active_volume.py integrate_frame: `packed_img[lin_pix]` with
packed_img [H*W, 2] f32). `scripts/roofline.py` shows the step runs at <1%
of HBM peak — the question is whether a VMEM-resident Pallas gather beats
XLA's native gather on this exact pattern, so the keep-or-reject call is
measured, not guessed (see METRICS.md "Pallas gather verdict").

Kernel design: the whole 480x640x2 payload image (2.4 MB f32) stays
resident in VMEM across grid blocks; each block owns a contiguous run of
flattened voxel indices and gathers its payload rows with `jnp.take`
(Mosaic supports 2D gather; the earlier 1D form failed to lower with
"Only 2D gather is supported").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def make_pallas_gather(hw: int, channels: int, n: int, block: int = 65536):
    """gather(img [hw, C] f32, idx [n] int32) -> [n, C] f32 via Pallas."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(img_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(img_ref[:], idx_ref[:], axis=0)

    grid = (n // block,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, channels), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((hw, channels), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, channels), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )


def benchmark(n_voxels: int = 1_228_800, hw=(480, 640), channels: int = 2, iters: int = 30):
    """Times Pallas vs XLA gather on the integrate-frame access pattern
    (one [C]-row payload per in-frustum voxel). Returns dict of ms/call."""
    import time

    H, W = hw
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((H * W, channels), np.float32))
    # projective access pattern: nearby voxels hit nearby pixels
    base = rng.integers(0, H * W - 256, n_voxels // 256)
    idx = (base[:, None] + rng.integers(0, 256, (len(base), 256))).reshape(-1)
    idx = jnp.asarray(idx.astype(np.int32))

    xla = jax.jit(lambda im, ix: jnp.take(im, ix, axis=0))

    def time_fn(fn):
        out = fn(img, idx)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(img, idx)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    out = {"xla_gather_ms": round(time_fn(xla), 3)}
    try:
        pk = jax.jit(make_pallas_gather(H * W, channels, len(np.asarray(idx))))
        np.testing.assert_allclose(
            np.asarray(pk(img, idx))[:1024], np.asarray(xla(img, idx))[:1024]
        )
        out["pallas_gather_ms"] = round(time_fn(pk), 3)
    except Exception as e:  # Mosaic lowering not available for this pattern
        out["pallas_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    return out


if __name__ == "__main__":
    import json

    print(json.dumps(benchmark(), indent=1))
