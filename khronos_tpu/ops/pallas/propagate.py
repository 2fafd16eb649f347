"""Pallas TPU kernel: iterated 3D label propagation with the grid in VMEM.

The XLA version of connected-component growth (`ops.dense.propagate_labels_3d`)
runs `iterations` x 3 separable max-pool passes. This kernel loads the label
grid + growable mask into VMEM ONCE and runs every iteration on-chip — one
HBM read and one write total.

MEASURED (v5e, 112x112x48 crop, 16 iterations): XLA 0.12 ms, this kernel
0.17 ms — XLA's fusion already keeps this stencil chain on-chip, so the
default hot path stays on the XLA version (`detect` profiling showed the
per-frame cost lives in pixel scatter/sort/segment ops, which do not map to
Pallas on TPU — no vectorized arbitrary gather/scatter). Kept as the
exact-parity VMEM-resident implementation: it is the right starting point
when the propagation couples with ops XLA cannot fuse (e.g. per-iteration
semantics changes, or fused multi-grid variants).

Layout: the [X, Y, Z] grid is viewed as [X, Y*Z] so the lane dimension is a
multiple of 128 (Z=48, Y a multiple of 8 -> Y*Z multiple of 384; padded to
128 lanes by Mosaic at worst). Neighbor shifts become:
  x +-1: roll along sublanes (axis 0), first/last row masked;
  y +-1: roll along lanes by Z, masked where y wraps;
  z +-1: roll along lanes by 1, masked where z wraps.
Each iteration takes the 26-neighborhood max via 3 separable axis passes.

Used for the motion detector's region growing (reference
free_space_motion_detector.cpp:205-272 replaces a stack-based flood fill);
the fused step picks this kernel when the crop fits the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# label grid + growable mask + scratch must fit comfortably in ~16 MB VMEM
VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def fits_vmem(shape) -> bool:
    X, Y, Z = shape
    return (X * Y * Z) * (4 + 4) + 2 * (X * Y * Z) * 4 <= VMEM_BUDGET_BYTES


def _propagate_kernel(Z: int, iterations: int, labels_ref, grow_ref, out_ref):
    lab = labels_ref[:]
    grow = grow_ref[:]
    R, L = lab.shape  # [X, Y*Z]
    fill = jnp.int32(-1)
    lab = jnp.where(grow, lab, fill)

    row = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    z = lane % Z
    # edge masks: True where the rolled-in value crossed a grid boundary
    xm_lo = row == 0          # roll +1 along axis 0 brings row R-1 into row 0
    xm_hi = row == R - 1
    ym_lo = lane < Z          # roll +Z brings the last y into y 0
    ym_hi = lane >= L - Z
    zm_lo = z == 0
    zm_hi = z == Z - 1

    def body(_, lab):
        # pltpu.roll requires non-negative shifts: roll(v, -s) == roll(v, n-s)
        # z pass
        v = lab
        v = jnp.maximum(v, jnp.where(zm_lo, fill, pltpu.roll(lab, 1, 1)))
        v = jnp.maximum(v, jnp.where(zm_hi, fill, pltpu.roll(lab, L - 1, 1)))
        # y pass
        w = v
        w = jnp.maximum(w, jnp.where(ym_lo, fill, pltpu.roll(v, Z, 1)))
        w = jnp.maximum(w, jnp.where(ym_hi, fill, pltpu.roll(v, L - Z, 1)))
        # x pass
        u = w
        u = jnp.maximum(u, jnp.where(xm_lo, fill, pltpu.roll(w, 1, 0)))
        u = jnp.maximum(u, jnp.where(xm_hi, fill, pltpu.roll(w, R - 1, 0)))
        return jnp.where(grow, u, fill)

    out_ref[:] = jax.lax.fori_loop(0, iterations, body, lab)


@functools.partial(jax.jit, static_argnames=("iterations",))
def propagate_labels_3d_pallas(
    labels: jnp.ndarray, growable: jnp.ndarray, iterations: int
) -> jnp.ndarray:
    """Drop-in for ops.dense.propagate_labels_3d on grids that fit VMEM.

    labels: int32 [X, Y, Z] (-1 = unlabeled), growable: bool [X, Y, Z]."""
    X, Y, Z = labels.shape
    lab2 = labels.reshape(X, Y * Z)
    grow2 = growable.reshape(X, Y * Z)
    out = pl.pallas_call(
        functools.partial(_propagate_kernel, Z, iterations),
        out_shape=jax.ShapeDtypeStruct((X, Y * Z), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",  # tests run on CPU
    )(lab2, grow2)
    return out.reshape(X, Y, Z)
