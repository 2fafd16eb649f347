"""Pallas TPU kernels: exact parity vs the XLA reference implementations.

Runs in interpret mode on the CPU test backend; on a real TPU the same
kernels compile natively (parity re-verified there, see propagate.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from khronos_tpu.ops.dense import propagate_labels_3d
from khronos_tpu.ops.pallas.propagate import fits_vmem, propagate_labels_3d_pallas


class TestPropagatePallas:
    @pytest.mark.parametrize("iterations", [1, 4, 12])
    def test_matches_xla_reference(self, iterations):
        rng = np.random.default_rng(7)
        shape = (32, 16, 48)
        seeds = rng.random(shape) < 0.02
        grow = (rng.random(shape) < 0.4) | seeds
        lin = np.arange(np.prod(shape), dtype=np.int32).reshape(shape)
        labels = jnp.asarray(np.where(seeds, lin, -1).astype(np.int32))
        grow = jnp.asarray(grow)
        ref = np.asarray(propagate_labels_3d(labels, grow, iterations))
        got = np.asarray(propagate_labels_3d_pallas(labels, grow, iterations))
        np.testing.assert_array_equal(ref, got)

    def test_blocked_growth_stays_separated(self):
        """A non-growable wall must stop label spread."""
        shape = (8, 8, 48)
        labels = np.full(shape, -1, np.int32)
        labels[1, 1, 1] = 100
        labels[6, 6, 40] = 200
        grow = np.ones(shape, bool)
        grow[:, 4, :] = False  # wall
        out = np.asarray(
            propagate_labels_3d_pallas(jnp.asarray(labels), jnp.asarray(grow), 12)
        )
        assert (out[:, :4, :][out[:, :4, :] >= 0] == 100).all()
        assert (out[:, 5:, :][out[:, 5:, :] >= 0] == 200).all()
        assert (out[:, 4, :] == -1).all()

    def test_fits_vmem(self):
        assert fits_vmem((112, 112, 48))
        assert not fits_vmem((512, 512, 64))
