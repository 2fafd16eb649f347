"""Distributed PGO: SPMD factor-sharded assembly (psum over the mesh) and
Schur-complement reduction must match the single-device dense solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from khronos_tpu.backend import distributed as dist
from khronos_tpu.backend import factor_graph as fg
from khronos_tpu.parallel.sharding import make_mesh


def loop_graph(n=12, noise=0.03, with_outlier=True, seed=0):
    """Drifted odometry around a ring + one EXACT loop closure (computed from
    the ground-truth ring poses, so GNC must keep it) + optional outlier LC."""
    rng = np.random.default_rng(seed)
    g = fg.FactorGraphData()
    angle = 2 * np.pi / n
    Rz = np.array(
        [[np.cos(angle), -np.sin(angle), 0],
         [np.sin(angle), np.cos(angle), 0],
         [0, 0, 1]], np.float32,
    )
    step_t = np.array([1.0, 0.0, 0.0], np.float32)
    # ground-truth ring
    gt_R, gt_t = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
    for k in range(1, n):
        gt_R.append(gt_R[-1] @ Rz)
        gt_t.append(gt_t[-1] + gt_R[-1] @ step_t)
    # drifted initial estimates, exact odometry measurements + noise
    R, t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
    prev = g.add_node(R, t)
    g.add_prior(prev, R, t)
    for k in range(1, n):
        R = R @ Rz
        t = t + R @ step_t + rng.normal(0, noise, 3).astype(np.float32)
        cur = g.add_node(R, t)
        g.add_between(prev, cur, Rz, step_t, sigma_rot=0.02, sigma_trans=0.05)
        prev = cur
    # exact loop closure last -> first from GT relative pose
    R_rel = gt_R[-1].T @ gt_R[0]
    t_rel = gt_R[-1].T @ (gt_t[0] - gt_t[-1])
    g.add_between(prev, 0, R_rel.astype(np.float32), t_rel.astype(np.float32),
                  sigma_rot=0.02, sigma_trans=0.05, robust=True)
    if with_outlier:
        g.add_between(2, n - 2, np.eye(3, dtype=np.float32),
                      np.array([9.0, 9.0, 0.0], np.float32), robust=True)
    return g


class TestShardedAssembly:
    def test_matches_single_device(self):
        g = loop_graph()
        H1, g1, e1 = dist.assemble_normal_equations(g, mesh=None)
        mesh = make_mesh(8)
        H8, g8, e8 = dist.assemble_normal_equations(g, mesh=mesh)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H8), atol=1e-4)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g8), atol=1e-5)
        assert abs(float(e1) - float(e8)) < 1e-4 * max(float(e1), 1.0)

    def test_matches_reference_linearization(self):
        """Assembly must agree with factor_graph._linearize_and_solve's
        system: same delta for the same damping."""
        g = loop_graph(with_outlier=False)
        H, grad, _ = dist.assemble_normal_equations(g, mesh=None)
        N = g.num_nodes
        damping = 1e-4
        delta_ref, _ = fg._linearize_and_solve(
            jnp.asarray(np.stack(g.node_R)), jnp.asarray(np.stack(g.node_t)),
            jnp.asarray(g.b_i, jnp.int32), jnp.asarray(g.b_j, jnp.int32),
            jnp.asarray(np.stack(g.b_R)), jnp.asarray(np.stack(g.b_t)),
            jnp.asarray(np.stack(g.b_sqrt_info)),
            jnp.ones(g.num_between, jnp.float32),
            jnp.asarray(g.p_i, jnp.int32), jnp.asarray(np.stack(g.p_R)),
            jnp.asarray(np.stack(g.p_t)), jnp.asarray(np.stack(g.p_sqrt_info)),
            jnp.float32(damping), N,
        )
        Hd = np.asarray(H) + (damping + 1e-6) * np.eye(N * 6)
        delta = np.linalg.solve(Hd, -np.asarray(grad)).reshape(N, 6)
        np.testing.assert_allclose(delta, np.asarray(delta_ref), atol=1e-3)


class TestSchur:
    def test_schur_equals_direct(self):
        g = loop_graph(with_outlier=False)
        H, grad, _ = dist.assemble_normal_equations(g)
        H, grad = np.asarray(H), np.asarray(grad)
        n = H.shape[0]
        damping = 1e-3
        direct = np.linalg.solve(H + damping * np.eye(n), -grad)
        for n_a in (2, 5, g.num_nodes - 1):
            x = np.asarray(dist.solve_schur(jnp.asarray(H), jnp.asarray(grad), n_a, damping))
            np.testing.assert_allclose(x, direct, atol=1e-3)


class TestOptimizeDistributed:
    def test_matches_single_chip_optimizer(self):
        g = loop_graph()
        ref = fg.optimize(g)
        mesh = make_mesh(8)
        got = dist.optimize_distributed(g, mesh=mesh, n_pose_nodes=6)
        # both must reject the outlier LC and land on similar poses
        assert got.outlier_mask.sum() == ref.outlier_mask.sum() == 1
        err_t = np.linalg.norm(got.node_t - ref.node_t, axis=1)
        assert err_t.max() < 0.15, err_t

    def test_reduces_drift(self):
        g = loop_graph(noise=0.1, with_outlier=False)
        before = np.stack(g.node_t)
        got = dist.optimize_distributed(g, mesh=make_mesh(4))
        # the loop closure should pull the last node back toward the circle
        gt_last = before[0] + np.zeros(3)  # node 0 anchored by prior
        # consistency: relative step lengths ~1
        steps = np.linalg.norm(np.diff(got.node_t, axis=0), axis=1)
        assert np.abs(steps - 1.0).mean() < 0.1


class TestBackendGraphSchur:
    def test_interleaved_backend_graph(self):
        """A backend-shaped graph (poses interleaved with mesh-control nodes,
        pgmo MESH_ONLY style) solved via permuted Schur must match the plain
        dense optimizer in the original node order."""
        rng = np.random.default_rng(5)
        g = fg.FactorGraphData()
        pose_ids = []
        prev = None
        for k in range(6):
            t_k = np.array([0.6 * k, 0.0, 0.0], np.float32)
            i = g.add_node(np.eye(3, dtype=np.float32), t_k + rng.normal(0, 0.02, 3).astype(np.float32))
            pose_ids.append(i)
            if prev is None:
                g.add_prior(i, np.eye(3, dtype=np.float32), t_k)
            else:
                g.add_between(prev, i, np.eye(3, dtype=np.float32),
                              np.array([0.6, 0, 0], np.float32), sigma_trans=0.05)
            prev = i
            # two mesh-control nodes hanging off each keyframe
            for m in range(2):
                c = t_k + np.array([0.1, 0.5 + 0.3 * m, 0.2], np.float32)
                ci = g.add_node(np.eye(3, dtype=np.float32), c + rng.normal(0, 0.02, 3).astype(np.float32))
                g.add_between(i, ci, np.eye(3, dtype=np.float32), c - t_k,
                              sigma_rot=0.05, sigma_trans=0.3)
        ref = fg.optimize(g, fg.OptimizerConfig(gnc_enabled=False))
        got = dist.optimize_backend_graph(
            g, pose_ids, mesh=make_mesh(8), config=fg.OptimizerConfig(gnc_enabled=False)
        )
        np.testing.assert_allclose(got.node_t, ref.node_t, atol=2e-2)
        np.testing.assert_allclose(got.node_R, ref.node_R, atol=2e-2)
