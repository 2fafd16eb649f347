"""SE(3) factor-graph optimizer: Gauss-Newton/LM with GNC robust weights.

TPU-native replacement for the reference's GTSAM + Kimera-RPGO backbone
(SURVEY.md §2.3: `optimizer: type: KimeraRpgoOptimizer, solver: LM, gnc:
inlier_probability 0.9`, uHumans2.yaml:212-219; backend.cpp:316-327). The
graph couples agent keyframe poses and mesh deformation-control nodes
(kimera_pgmo MESH_ONLY deformation graph) through between factors.

Design: factors are struct-of-arrays; per-factor 6x6 Jacobian blocks come
from `jax.jacfwd` vmapped over the factor batch (no hand-derived Jacobians to
get wrong); the normal equations are scatter-assembled into a dense [6N, 6N]
matrix and solved with Cholesky on device (MXU-friendly; graphs here are
10^2-10^3 nodes so dense is the right call — the Schur/CG path is the
multi-host extension). Robustness: GNC with Geman-McClure over loop-closure
factors, mu-annealed on host (Yang et al. 2020), matching RPGO semantics.

Factor types:
  prior   : r = Log(T_i^{-1} Z)
  between : r = Log(Z^{-1} T_i^{-1} T_j)
Each factor has a 6-vector sqrt information (diagonal) and a robust flag.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from khronos_tpu.geometry import transforms as tf


@dataclasses.dataclass
class FactorGraphData:
    """Host-side graph under construction (append-only)."""

    # nodes
    node_R: List[np.ndarray] = dataclasses.field(default_factory=list)
    node_t: List[np.ndarray] = dataclasses.field(default_factory=list)
    # between factors
    b_i: List[int] = dataclasses.field(default_factory=list)
    b_j: List[int] = dataclasses.field(default_factory=list)
    b_R: List[np.ndarray] = dataclasses.field(default_factory=list)
    b_t: List[np.ndarray] = dataclasses.field(default_factory=list)
    b_sqrt_info: List[np.ndarray] = dataclasses.field(default_factory=list)
    b_robust: List[bool] = dataclasses.field(default_factory=list)
    # shadow factors: ZERO weight in the solve (they cannot distort the
    # solution), classified against the GNC inlier gate at the final
    # geometry. Used for merge-proposal judging (r4): an in-graph identity
    # factor stiff enough to separate twins from distinct pairs also bends a
    # consistent trajectory by centimeters per judging solve, forcing full
    # CD ray-library rebuilds; a soft one lets the trajectory bend to excuse
    # wrong merges. Judging at the UNBENT optimum has neither failure.
    b_shadow: List[bool] = dataclasses.field(default_factory=list)
    # prior factors
    p_i: List[int] = dataclasses.field(default_factory=list)
    p_R: List[np.ndarray] = dataclasses.field(default_factory=list)
    p_t: List[np.ndarray] = dataclasses.field(default_factory=list)
    p_sqrt_info: List[np.ndarray] = dataclasses.field(default_factory=list)

    def add_node(self, R: np.ndarray, t: np.ndarray) -> int:
        self.node_R.append(np.asarray(R, np.float32))
        self.node_t.append(np.asarray(t, np.float32))
        return len(self.node_R) - 1

    def add_between(self, i: int, j: int, R: np.ndarray, t: np.ndarray,
                    sigma_rot: float = 0.01, sigma_trans: float = 0.01,
                    robust: bool = False, shadow: bool = False):
        self.b_i.append(i)
        self.b_j.append(j)
        self.b_R.append(np.asarray(R, np.float32))
        self.b_t.append(np.asarray(t, np.float32))
        info = np.array([1 / sigma_trans] * 3 + [1 / sigma_rot] * 3, np.float32)
        self.b_sqrt_info.append(info)
        self.b_robust.append(robust)
        self.b_shadow.append(shadow)

    def add_prior(self, i: int, R: np.ndarray, t: np.ndarray,
                  sigma_rot: float = 0.001, sigma_trans: float = 0.001):
        self.p_i.append(i)
        self.p_R.append(np.asarray(R, np.float32))
        self.p_t.append(np.asarray(t, np.float32))
        self.p_sqrt_info.append(
            np.array([1 / sigma_trans] * 3 + [1 / sigma_rot] * 3, np.float32)
        )

    @property
    def num_nodes(self) -> int:
        return len(self.node_R)

    @property
    def num_between(self) -> int:
        return len(self.b_i)


# ----------------------------------------------------------------------------
# residuals (tangent increments x: [N, 6] around linearization point)
# ----------------------------------------------------------------------------


def _retract(R, t, xi):
    dR, dt = tf.se3_exp(xi)
    return R @ dR, (R @ dt[..., None])[..., 0] + t


def _between_residual(xi_i, xi_j, Ri, ti, Rj, tj, Zr, Zt):
    """r = Log(Z^{-1} (Ti Exp(xi_i))^{-1} (Tj Exp(xi_j)))."""
    Ri2, ti2 = _retract(Ri, ti, xi_i)
    Rj2, tj2 = _retract(Rj, tj, xi_j)
    Rrel, trel = tf.between(Ri2, ti2, Rj2, tj2)
    Zri, Zti = tf.inverse(Zr, Zt)
    Re, te = tf.compose(Zri, Zti, Rrel, trel)
    return tf.se3_log(Re, te)


def _prior_residual(xi_i, Ri, ti, Zr, Zt):
    Ri2, ti2 = _retract(Ri, ti, xi_i)
    Rrel, trel = tf.between(Ri2, ti2, Zr, Zt)
    return tf.se3_log(Rrel, trel)


@functools.partial(jax.jit, static_argnames=("num_nodes",))
def _linearize_and_solve(
    node_R, node_t,  # [N,3,3], [N,3]
    b_i, b_j, b_R, b_t, b_info, b_weight,  # between factors
    p_i, p_R, p_t, p_info,  # priors
    damping,  # LM lambda
    num_nodes: int,
):
    """One GN/LM step: returns (delta [N,6], total weighted error)."""
    N = num_nodes
    zero6 = jnp.zeros(6, jnp.float32)

    # --- between factors: residuals + jacobians wrt xi_i, xi_j
    def b_res(xi_i, xi_j, f):
        Ri, ti = node_R[f[0]], node_t[f[0]]
        Rj, tj = node_R[f[1]], node_t[f[1]]
        return _between_residual(xi_i, xi_j, Ri, ti, Rj, tj, b_R[f[2]], b_t[f[2]])

    f_idx = jnp.stack([b_i, b_j, jnp.arange(b_i.shape[0])], axis=1)
    r_b = jax.vmap(lambda f: b_res(zero6, zero6, f))(f_idx)  # [F,6]
    Ji_b = jax.vmap(lambda f: jax.jacfwd(b_res, argnums=0)(zero6, zero6, f))(f_idx)
    Jj_b = jax.vmap(lambda f: jax.jacfwd(b_res, argnums=1)(zero6, zero6, f))(f_idx)

    # --- priors
    def p_res(xi, f):
        return _prior_residual(xi, node_R[f[0]], node_t[f[0]], p_R[f[1]], p_t[f[1]])

    pf_idx = jnp.stack([p_i, jnp.arange(p_i.shape[0])], axis=1)
    r_p = jax.vmap(lambda f: p_res(zero6, f))(pf_idx)
    J_p = jax.vmap(lambda f: jax.jacfwd(p_res, argnums=0)(zero6, f))(pf_idx)

    # weighted by sqrt info * robust weight
    wb = (b_info * jnp.sqrt(b_weight)[:, None])  # [F,6]
    r_bw = r_b * wb
    Ji_bw = Ji_b * wb[:, :, None]
    Jj_bw = Jj_b * wb[:, :, None]
    wp = p_info
    r_pw = r_p * wp
    J_pw = J_p * wp[:, :, None]

    # assemble H (6N x 6N) and g (6N)
    H = jnp.zeros((N * 6, N * 6), jnp.float32)
    g = jnp.zeros((N * 6,), jnp.float32)

    def block_rows(idx):
        return idx[:, None] * 6 + jnp.arange(6)[None, :]

    bi_rows = block_rows(b_i)  # [F,6]
    bj_rows = block_rows(b_j)

    Hii = jnp.einsum("fab,fac->fbc", Ji_bw, Ji_bw)
    Hjj = jnp.einsum("fab,fac->fbc", Jj_bw, Jj_bw)
    Hij = jnp.einsum("fab,fac->fbc", Ji_bw, Jj_bw)
    gi = jnp.einsum("fab,fa->fb", Ji_bw, r_bw)
    gj = jnp.einsum("fab,fa->fb", Jj_bw, r_bw)

    H = H.at[bi_rows[:, :, None], bi_rows[:, None, :]].add(Hii)
    H = H.at[bj_rows[:, :, None], bj_rows[:, None, :]].add(Hjj)
    H = H.at[bi_rows[:, :, None], bj_rows[:, None, :]].add(Hij)
    H = H.at[bj_rows[:, :, None], bi_rows[:, None, :]].add(jnp.swapaxes(Hij, 1, 2))
    g = g.at[bi_rows].add(gi)
    g = g.at[bj_rows].add(gj)

    pi_rows = block_rows(p_i)
    Hpp = jnp.einsum("fab,fac->fbc", J_pw, J_pw)
    gp = jnp.einsum("fab,fa->fb", J_pw, r_pw)
    H = H.at[pi_rows[:, :, None], pi_rows[:, None, :]].add(Hpp)
    g = g.at[pi_rows].add(gp)

    # LM damping + gauge regularization
    H = H + (damping + 1e-6) * jnp.eye(N * 6, dtype=jnp.float32)
    delta = jax.scipy.linalg.solve(H, -g, assume_a="pos")
    err = jnp.sum(r_bw**2) + jnp.sum(r_pw**2)
    return delta.reshape(N, 6), err


@jax.jit
def _apply_delta(node_R, node_t, delta):
    dR, dt = tf.se3_exp(delta)
    R_new = node_R @ dR
    t_new = (node_R @ dt[..., None])[..., 0] + node_t
    return R_new, t_new


@jax.jit
def _between_errors(node_R, node_t, b_i, b_j, b_R, b_t, b_info):
    """Weighted residual norms per between factor (for GNC weights)."""
    zero6 = jnp.zeros(6, jnp.float32)

    def res(k):
        r = _between_residual(
            zero6, zero6, node_R[b_i[k]], node_t[b_i[k]],
            node_R[b_j[k]], node_t[b_j[k]], b_R[k], b_t[k],
        )
        return jnp.sum((r * b_info[k]) ** 2)

    return jax.vmap(res)(jnp.arange(b_i.shape[0]))


@dataclasses.dataclass
class OptimizerConfig:
    max_iterations: int = 25
    init_damping: float = 1e-4
    error_tol: float = 1e-7
    # GNC (Geman-McClure): anneal mu from mu_init toward 1
    gnc_enabled: bool = True
    # inlier gate on the weighted squared residual: chi-square(6 dof) upper
    # quantile at RPGO's `inlier_probability: 0.9` (uHumans2.yaml:217) = 10.64
    # — a correctly-noisy loop closure must not be rejected
    gnc_barc2: float = 10.64
    gnc_mu_init: float = 64.0
    gnc_mu_step: float = 1.4
    # enough outer iterations to anneal mu from ~2*r2_max/barc2 down to 1
    # (RPGO caps at 100); the loop breaks early once mu reaches 1
    gnc_outer_iterations: int = 40
    inner_iterations: int = 5


@dataclasses.dataclass
class OptimizeResult:
    node_R: np.ndarray  # [N,3,3]
    node_t: np.ndarray  # [N,3]
    final_error: float
    outlier_mask: np.ndarray  # [F] bool: robust factors judged outliers
    iterations: int = 0


def _shape_bucket(n: int, lo: int = 32) -> int:
    # POW2 shape buckets: node/factor counts grow every frame, and
    # exact-size programs recompiled the whole GN/GNC step chain on every
    # solve as the graph grew (r4 endurance finding: 21-28 s/optimize on
    # the tunnel, nearly all compile). The earlier ~12.5% buckets still
    # stepped finer than the inter-optimize growth on a long run, so each
    # LC-triggered solve recompiled anyway; pow2 bounds compiles to one
    # per doubling, and padded nodes/factors are identity/zero-weight.
    if n <= lo:
        return lo
    return 1 << int(np.ceil(np.log2(n)))


def optimize(
    graph: FactorGraphData,
    config: OptimizerConfig = None,
    step_fn=None,
) -> OptimizeResult:
    """Run robust pose-graph optimization; returns optimized poses.

    step_fn(node_R, node_t, weights, damping) -> (delta [N,6], err) overrides
    the dense single-device linear step — the distributed solver
    (backend.distributed) plugs in SPMD assembly + Schur elimination here and
    inherits this exact GNC/LM loop."""
    config = config or OptimizerConfig()
    N = graph.num_nodes
    if N == 0:
        return OptimizeResult(np.zeros((0, 3, 3)), np.zeros((0, 3)), 0.0, np.zeros(0, bool))

    # shape bucketing only applies to the dense single-device step; the
    # distributed step_fn assembles from `graph` directly
    do_pad = step_fn is None

    node_R_np = np.stack(graph.node_R)
    node_t_np = np.stack(graph.node_t)
    n_pad = (_shape_bucket(N) - N) if do_pad else 0
    if n_pad:
        node_R_np = np.concatenate(
            [node_R_np, np.broadcast_to(np.eye(3, dtype=np.float32), (n_pad, 3, 3))]
        )
        node_t_np = np.concatenate([node_t_np, np.zeros((n_pad, 3), np.float32)])
    node_R = jnp.asarray(node_R_np)
    node_t = jnp.asarray(node_t_np)
    has_between = graph.num_between > 0
    if has_between:
        F_real = graph.num_between
        b_i_np = np.asarray(graph.b_i, np.int32)
        b_j_np = np.asarray(graph.b_j, np.int32)
        b_R_np = np.stack(graph.b_R)
        b_t_np = np.stack(graph.b_t)
        b_info_np = np.stack(graph.b_sqrt_info)
        robust = np.asarray(graph.b_robust, bool)
        shadow = (
            np.asarray(graph.b_shadow, bool)
            if len(graph.b_shadow) == graph.num_between
            else np.zeros(graph.num_between, bool)
        )
        f_pad = (_shape_bucket(F_real) - F_real) if do_pad else 0
        if f_pad:
            # zero-information self-factors on node 0: residual 0, no H rows
            b_i_np = np.concatenate([b_i_np, np.zeros(f_pad, np.int32)])
            b_j_np = np.concatenate([b_j_np, np.zeros(f_pad, np.int32)])
            b_R_np = np.concatenate(
                [b_R_np, np.broadcast_to(np.eye(3, dtype=np.float32), (f_pad, 3, 3))]
            )
            b_t_np = np.concatenate([b_t_np, np.zeros((f_pad, 3), np.float32)])
            b_info_np = np.concatenate([b_info_np, np.zeros((f_pad, 6), np.float32)])
            robust = np.concatenate([robust, np.zeros(f_pad, bool)])
            shadow = np.concatenate([shadow, np.zeros(f_pad, bool)])
        b_i = jnp.asarray(b_i_np)
        b_j = jnp.asarray(b_j_np)
        b_R = jnp.asarray(b_R_np)
        b_t = jnp.asarray(b_t_np)
        b_info = jnp.asarray(b_info_np)
    else:
        F_real = 0
        b_i = jnp.zeros((1,), jnp.int32)
        b_j = jnp.zeros((1,), jnp.int32)
        b_R = jnp.eye(3)[None]
        b_t = jnp.zeros((1, 3))
        b_info = jnp.zeros((1, 6))
        robust = np.zeros(1, bool)
        shadow = np.zeros(1, bool)
    if graph.p_i:
        p_i_np = np.asarray(graph.p_i, np.int32)
        p_R_np = np.stack(graph.p_R)
        p_t_np = np.stack(graph.p_t)
        p_info_np = np.stack(graph.p_sqrt_info)
    else:
        p_i_np = np.zeros((1,), np.int32)
        p_R_np = np.eye(3, dtype=np.float32)[None]
        p_t_np = np.zeros((1, 3), np.float32)
        p_info_np = np.zeros((1, 6), np.float32)
    if n_pad:
        # anchor every pad node with a unit prior so H stays well-conditioned
        p_i_np = np.concatenate([p_i_np, np.arange(N, N + n_pad, dtype=np.int32)])
        p_R_np = np.concatenate(
            [p_R_np, np.broadcast_to(np.eye(3, dtype=np.float32), (n_pad, 3, 3))]
        )
        p_t_np = np.concatenate([p_t_np, np.zeros((n_pad, 3), np.float32)])
        p_info_np = np.concatenate([p_info_np, np.ones((n_pad, 6), np.float32)])
    if do_pad:
        P_real = len(p_i_np)
        pp = _shape_bucket(P_real) - P_real
        if pp:
            # zero-information priors on node 0
            p_i_np = np.concatenate([p_i_np, np.zeros(pp, np.int32)])
            p_R_np = np.concatenate(
                [p_R_np, np.broadcast_to(np.eye(3, dtype=np.float32), (pp, 3, 3))]
            )
            p_t_np = np.concatenate([p_t_np, np.zeros((pp, 3), np.float32)])
            p_info_np = np.concatenate([p_info_np, np.zeros((pp, 6), np.float32)])
    p_i = jnp.asarray(p_i_np)
    p_R = jnp.asarray(p_R_np)
    p_t = jnp.asarray(p_t_np)
    p_info = jnp.asarray(p_info_np)

    F = int(b_i.shape[0])
    shadow_j = jnp.asarray(shadow)
    # shadow factors never influence the solution (weight 0 throughout);
    # they are classified against the GNC gate at the final geometry
    weights = jnp.where(shadow_j, 0.0, 1.0)
    robust_j = jnp.asarray(robust) & ~shadow_j

    N_solve = int(node_R.shape[0])  # padded node count (= N when no padding)
    if step_fn is None:
        def step_fn(node_R, node_t, weights, damping):
            return _linearize_and_solve(
                node_R, node_t, b_i, b_j, b_R, b_t, b_info, weights,
                p_i, p_R, p_t, p_info, jnp.float32(damping), N_solve,
            )

    def run_gn(node_R, node_t, weights, iters):
        damping = config.init_damping
        prev_err = np.inf
        it = 0
        for it in range(iters):
            delta, err = step_fn(node_R, node_t, weights, damping)
            err = float(err)
            if not np.isfinite(err):
                damping *= 10
                continue
            node_R2, node_t2 = _apply_delta(node_R, node_t, delta)
            # simple LM accept/reject
            _, err2 = step_fn(node_R2, node_t2, weights, damping)
            if float(err2) <= err:
                node_R, node_t = node_R2, node_t2
                damping = max(damping * 0.5, 1e-7)
            else:
                damping = min(damping * 8, 1e4)
            if abs(prev_err - err) < config.error_tol * max(err, 1.0):
                break
            prev_err = err
        return node_R, node_t, prev_err, it

    total_iters = 0
    any_robust = bool((robust & ~shadow).any())
    if config.gnc_enabled and any_robust and has_between:
        # GNC-GM annealing over robust factors
        node_R, node_t, err, it = run_gn(node_R, node_t, weights, config.inner_iterations)
        total_iters += it
        errs0 = _between_errors(node_R, node_t, b_i, b_j, b_R, b_t, b_info)
        r2_max = float(jnp.max(jnp.where(robust_j, errs0, 0.0)))
        mu = max(2 * r2_max / max(config.gnc_barc2, 1e-9), config.gnc_mu_init)
        if r2_max <= config.gnc_barc2:
            # every robust factor is already an inlier at the plain-GN
            # optimum: annealing mu from 64 -> 1 would run ~12 more outer
            # rounds of solves to reach the same weights (~1). On a clean
            # graph (consistent odometry + true LCs) this was most of the
            # solve cost (r4 endurance finding: one optimize per return-leg
            # LC at 10-30 s each collapsed the frame loop to <1 fps).
            mu = 1.0
        for _ in range(config.gnc_outer_iterations):
            errs = _between_errors(node_R, node_t, b_i, b_j, b_R, b_t, b_info)
            c2 = config.gnc_barc2
            w_gm = (mu * c2 / (errs + mu * c2)) ** 2
            weights = jnp.where(shadow_j, 0.0, jnp.where(robust_j, w_gm, 1.0))
            node_R, node_t, err, it = run_gn(node_R, node_t, weights, config.inner_iterations)
            total_iters += it
            mu = max(mu / config.gnc_mu_step, 1.0)
            if mu <= 1.0:
                break
        errs = _between_errors(node_R, node_t, b_i, b_j, b_R, b_t, b_info)
        outliers = np.asarray(robust_j & (errs > config.gnc_barc2 * 4))
    else:
        node_R, node_t, err, it = run_gn(node_R, node_t, weights, config.max_iterations)
        total_iters += it
        outliers = np.zeros(F, bool)

    # final error + shadow classification: a shadow factor is an outlier iff
    # its residual at the UNBENT optimum exceeds the GNC inlier gate (the
    # solve never mitigated it, so the raw gate applies — no 4x slack)
    errs = _between_errors(node_R, node_t, b_i, b_j, b_R, b_t, b_info)
    if bool(shadow.any()):
        outliers = outliers | np.asarray(shadow_j & (errs > config.gnc_barc2))
    final = float(jnp.sum(jnp.where(
        shadow_j, 0.0,
        jnp.where(robust_j, jnp.minimum(errs, config.gnc_barc2), errs),
    )))
    return OptimizeResult(
        node_R=np.asarray(node_R)[:N],
        node_t=np.asarray(node_t)[:N],
        final_error=final,
        outlier_mask=(outliers[:F_real] if has_between else np.zeros(0, bool)),
        iterations=total_iters,
    )
