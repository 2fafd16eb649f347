"""Distributed pose-graph/deformation-graph solver (BASELINE.json north star:
"distributed bundle-adjustment solver using Schur-complement reduction over
ICI collectives").

Two pieces, composable with the single-chip optimizer in factor_graph.py:

1. SPMD normal-equation assembly: between/prior factors are sharded across
   the device mesh on the factor axis; every device linearizes its factor
   shard (vmapped jacfwd) and the scatter-add into the REPLICATED [6N, 6N]
   normal matrix makes XLA insert the cross-device all-reduce (psum over ICI)
   — the classic distributed-BA reduction, no hand-written collectives.

2. Schur-complement reduction: with nodes ordered [poses | mesh-control
   nodes] (kimera_pgmo MESH_ONLY deformation graphs couple both), eliminate
   the control block C first: S = A - B C^{-1} B^T, solve the small pose
   system, back-substitute the controls. The elimination is the standard BA
   trick that keeps the globally-solved system at pose count while control
   nodes scale with map size.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from khronos_tpu.backend import factor_graph as fg


# ----------------------------------------------------------------------------
# SPMD assembly
# ----------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_nodes",))
def _assemble(
    node_R, node_t,
    b_i, b_j, b_R, b_t, b_info, b_weight,
    p_i, p_R, p_t, p_info,
    num_nodes: int,
):
    """Normal equations (H [6N,6N], g [6N], err) from factor arrays.

    Pure function of the factor shard axis: under sharded inputs + replicated
    outputs XLA partitions the per-factor work and all-reduces H/g."""
    N = num_nodes
    zero6 = jnp.zeros(6, jnp.float32)

    def b_res(xi_i, xi_j, f):
        return fg._between_residual(
            xi_i, xi_j, node_R[f[0]], node_t[f[0]],
            node_R[f[1]], node_t[f[1]], b_R[f[2]], b_t[f[2]],
        )

    f_idx = jnp.stack([b_i, b_j, jnp.arange(b_i.shape[0])], axis=1)
    r_b = jax.vmap(lambda f: b_res(zero6, zero6, f))(f_idx)
    Ji = jax.vmap(lambda f: jax.jacfwd(b_res, argnums=0)(zero6, zero6, f))(f_idx)
    Jj = jax.vmap(lambda f: jax.jacfwd(b_res, argnums=1)(zero6, zero6, f))(f_idx)

    def p_res(xi, f):
        return fg._prior_residual(xi, node_R[f[0]], node_t[f[0]], p_R[f[1]], p_t[f[1]])

    pf_idx = jnp.stack([p_i, jnp.arange(p_i.shape[0])], axis=1)
    r_p = jax.vmap(lambda f: p_res(zero6, f))(pf_idx)
    J_p = jax.vmap(lambda f: jax.jacfwd(p_res, argnums=0)(zero6, f))(pf_idx)

    wb = b_info * jnp.sqrt(b_weight)[:, None]
    r_bw, Ji_w, Jj_w = r_b * wb, Ji * wb[:, :, None], Jj * wb[:, :, None]
    r_pw, Jp_w = r_p * p_info, J_p * p_info[:, :, None]

    H = jnp.zeros((N * 6, N * 6), jnp.float32)
    g = jnp.zeros((N * 6,), jnp.float32)
    rows = lambda idx: idx[:, None] * 6 + jnp.arange(6)[None, :]
    bi_r, bj_r, pi_r = rows(b_i), rows(b_j), rows(p_i)

    H = H.at[bi_r[:, :, None], bi_r[:, None, :]].add(jnp.einsum("fab,fac->fbc", Ji_w, Ji_w))
    H = H.at[bj_r[:, :, None], bj_r[:, None, :]].add(jnp.einsum("fab,fac->fbc", Jj_w, Jj_w))
    Hij = jnp.einsum("fab,fac->fbc", Ji_w, Jj_w)
    H = H.at[bi_r[:, :, None], bj_r[:, None, :]].add(Hij)
    H = H.at[bj_r[:, :, None], bi_r[:, None, :]].add(jnp.swapaxes(Hij, 1, 2))
    H = H.at[pi_r[:, :, None], pi_r[:, None, :]].add(jnp.einsum("fab,fac->fbc", Jp_w, Jp_w))
    g = g.at[bi_r].add(jnp.einsum("fab,fa->fb", Ji_w, r_bw))
    g = g.at[bj_r].add(jnp.einsum("fab,fa->fb", Jj_w, r_bw))
    g = g.at[pi_r].add(jnp.einsum("fab,fa->fb", Jp_w, r_pw))
    err = jnp.sum(r_bw**2) + jnp.sum(r_pw**2)
    return H, g, err


def _pad_to(x: np.ndarray, n: int, fill=0):
    pad = n - len(x)
    if pad <= 0:
        return np.asarray(x)
    pad_block = np.full((pad,) + np.asarray(x).shape[1:], fill, np.asarray(x).dtype)
    return np.concatenate([np.asarray(x), pad_block])


def assemble_normal_equations(
    graph: fg.FactorGraphData,
    mesh: Optional[Mesh] = None,
    weights: Optional[np.ndarray] = None,
    axis: str = "x",
):
    """(H, g, err) with factors sharded over `mesh` (None = single device).

    Padding factors (zero info) make the shard axis divisible; they
    contribute exactly zero to H/g."""
    N = graph.num_nodes
    n_dev = mesh.devices.size if mesh is not None else 1
    F = max(graph.num_between, 1)
    Fp = -(-F // n_dev) * n_dev
    Pn = max(len(graph.p_i), 1)
    Pp = -(-Pn // n_dev) * n_dev

    b_i = _pad_to(np.asarray(graph.b_i or [0], np.int32), Fp)
    b_j = _pad_to(np.asarray(graph.b_j or [0], np.int32), Fp)
    b_R = _pad_to(np.stack(graph.b_R) if graph.b_R else np.eye(3, dtype=np.float32)[None], Fp)
    b_t = _pad_to(np.stack(graph.b_t) if graph.b_t else np.zeros((1, 3), np.float32), Fp)
    b_info = _pad_to(
        np.stack(graph.b_sqrt_info) if graph.b_sqrt_info else np.zeros((1, 6), np.float32), Fp
    )
    w = np.ones(Fp, np.float32)
    if weights is not None:
        w[: len(weights)] = weights
    p_i = _pad_to(np.asarray(graph.p_i or [0], np.int32), Pp)
    p_R = _pad_to(np.stack(graph.p_R) if graph.p_R else np.eye(3, dtype=np.float32)[None], Pp)
    p_t = _pad_to(np.stack(graph.p_t) if graph.p_t else np.zeros((1, 3), np.float32), Pp)
    p_info = _pad_to(
        np.stack(graph.p_sqrt_info) if graph.p_sqrt_info else np.zeros((1, 6), np.float32), Pp
    )

    node_R = jnp.asarray(np.stack(graph.node_R))
    node_t = jnp.asarray(np.stack(graph.node_t))
    if mesh is not None:
        shard = NamedSharding(mesh, P(axis))
        rep = NamedSharding(mesh, P())
        put_s = lambda x: jax.device_put(jnp.asarray(x), shard)
        put_r = lambda x: jax.device_put(jnp.asarray(x), rep)
    else:
        put_s = put_r = jnp.asarray

    return _assemble(
        put_r(node_R), put_r(node_t),
        put_s(b_i), put_s(b_j), put_s(b_R), put_s(b_t), put_s(b_info), put_s(w),
        put_s(p_i), put_s(p_R), put_s(p_t), put_s(p_info),
        num_nodes=N,
    )


# ----------------------------------------------------------------------------
# Schur complement
# ----------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_a",))
def solve_schur(H: jnp.ndarray, g: jnp.ndarray, n_a: int, damping: float = 1e-6):
    """Solve (H + damping I) delta = -g by eliminating the trailing block.

    n_a: number of leading (pose) DOF *nodes* — the split is at n_a*6. The
    trailing block (deformation-control nodes) is factorized once and the
    globally-coupled solve happens at pose size: S = A - B C^{-1} B^T."""
    n = H.shape[0]
    ka = n_a * 6
    H = H + damping * jnp.eye(n, dtype=H.dtype)
    # Jacobi equilibration: the elimination squares the conditioning, which
    # f32 cannot afford with ~1e6-scale prior-information entries
    d = 1.0 / jnp.sqrt(jnp.clip(jnp.diag(H), 1e-12, None))
    H = H * d[:, None] * d[None, :]
    g = g * d
    A = H[:ka, :ka]
    B = H[:ka, ka:]
    C = H[ka:, ka:]
    ga, gc = -g[:ka], -g[ka:]
    # C factor (control block); cho_solve supports multiple RHS
    c_fac = jax.scipy.linalg.cho_factor(C)
    Cinv_Bt = jax.scipy.linalg.cho_solve(c_fac, B.T)  # [kc, ka]
    Cinv_gc = jax.scipy.linalg.cho_solve(c_fac, gc)
    S = A - B @ Cinv_Bt
    rhs = ga - B @ Cinv_gc
    xa = jax.scipy.linalg.solve(S, rhs, assume_a="pos")
    xc = Cinv_gc - Cinv_Bt @ xa
    return jnp.concatenate([xa, xc]) * d


def optimize_distributed(
    graph: fg.FactorGraphData,
    mesh: Optional[Mesh] = None,
    n_pose_nodes: Optional[int] = None,
    config: fg.OptimizerConfig = None,
) -> fg.OptimizeResult:
    """factor_graph.optimize with the linear step replaced by SPMD factor
    assembly + Schur elimination — the GNC/LM loop is shared verbatim, so the
    distributed solver inherits the single-chip robustness semantics.

    Nodes must be ordered [poses | controls]; n_pose_nodes defaults to all
    (plain distributed PGO)."""
    N = graph.num_nodes
    if N == 0:
        return fg.OptimizeResult(np.zeros((0, 3, 3)), np.zeros((0, 3)), 0.0, np.zeros(0, bool))
    n_a = N if n_pose_nodes is None else max(1, min(n_pose_nodes, N))

    def step_fn(node_R, node_t, weights, damping):
        H, g, err = assemble_normal_equations(
            _graph_with_nodes(graph, node_R, node_t), mesh, np.asarray(weights)
        )
        delta = solve_schur(H, g, n_a, float(damping) + 1e-6).reshape(N, 6)
        return delta, err

    return fg.optimize(graph, config, step_fn=step_fn)


def _graph_with_nodes(graph: fg.FactorGraphData, node_R, node_t) -> fg.FactorGraphData:
    g2 = fg.FactorGraphData()
    g2.node_R = [np.asarray(r) for r in np.asarray(node_R)]
    g2.node_t = [np.asarray(t) for t in np.asarray(node_t)]
    for f in ("b_i", "b_j", "b_R", "b_t", "b_sqrt_info", "b_robust",
              "b_shadow", "p_i", "p_R", "p_t", "p_sqrt_info"):
        setattr(g2, f, getattr(graph, f))
    return g2


def optimize_backend_graph(
    graph: fg.FactorGraphData,
    pose_node_ids,
    mesh: Optional[Mesh] = None,
    config: fg.OptimizerConfig = None,
) -> fg.OptimizeResult:
    """optimize_distributed for a backend graph whose pose (agent keyframe)
    and deformation-control nodes are interleaved in insertion order: permute
    nodes to [poses | controls], Schur-eliminate the control block, unpermute.

    Returns the result in the ORIGINAL node order.

    Shapes are BUCKET-PADDED (factor_graph._shape_bucket, ~12.5% overshoot):
    pose count, control count, between-factor count, and prior count each pad
    to a coarse bucket so the jitted assembly + Schur chain re-hits the
    compile cache as the graph grows. Without this, every solve on a growing
    graph recompiled the whole step chain (r4 endurance finding: 57 s per
    optimize at 3,000 frames, inline in the frame loop — most of it compile).
    Pad layout: [poses | pose-pads | controls | control-pads]; pad nodes are
    identity poses anchored by unit priors (well-conditioned H), pad factors
    are zero-information self-factors on node 0 (exactly zero H/g rows)."""
    N = graph.num_nodes
    pose_ids = list(pose_node_ids)
    pose_set = set(pose_ids)
    ctrl_ids = [i for i in range(N) if i not in pose_set]
    nA, nC = len(pose_ids), len(ctrl_ids)
    # production-scale bucket FLOOR: each distinct (pose, control, factor)
    # bucket combo compiles the whole GN/GNC chain fresh (measured: 44 s
    # cold vs 0.78 s warm at the endurance scale over the dev tunnel), and
    # a growing run crosses several pow2 boundaries — flooring large graphs
    # at one big combo makes every solve after the first warm. Small
    # (test-scale) graphs keep fine buckets so CPU suites stay fast.
    lo_n = 1024 if N > 256 else 32
    bA = fg._shape_bucket(max(nA, 1), lo=lo_n)
    bC = fg._shape_bucket(nC, lo=lo_n) if nC else 0
    padA, padC = bA - nA, (bC - nC if nC else 0)

    eye = np.eye(3, dtype=np.float32)
    zero3 = np.zeros(3, np.float32)
    g2 = fg.FactorGraphData()
    g2.node_R = (
        [graph.node_R[i] for i in pose_ids] + [eye] * padA
        + [graph.node_R[i] for i in ctrl_ids] + [eye] * padC
    )
    g2.node_t = (
        [graph.node_t[i] for i in pose_ids] + [zero3] * padA
        + [graph.node_t[i] for i in ctrl_ids] + [zero3] * padC
    )
    # old node id -> padded-order id (poses first, controls offset past pads)
    inv = np.empty(N, np.int32)
    inv[np.asarray(pose_ids, np.int32)] = np.arange(nA, dtype=np.int32)
    if nC:
        inv[np.asarray(ctrl_ids, np.int32)] = nA + padA + np.arange(nC, dtype=np.int32)
    g2.b_i = [int(inv[i]) for i in graph.b_i]
    g2.b_j = [int(inv[j]) for j in graph.b_j]
    g2.p_i = [int(inv[i]) for i in graph.p_i]
    for f in ("b_R", "b_t", "b_sqrt_info", "b_robust", "b_shadow",
              "p_R", "p_t", "p_sqrt_info"):
        setattr(g2, f, list(getattr(graph, f)))

    # unit priors anchor every pad node
    pad_node_ids = list(range(nA, nA + padA)) + list(
        range(nA + padA + nC, nA + padA + nC + padC)
    )
    for k in pad_node_ids:
        g2.p_i.append(k)
        g2.p_R.append(eye)
        g2.p_t.append(zero3)
        g2.p_sqrt_info.append(np.ones(6, np.float32))
    # bucket the factor axes: zero-information pads contribute nothing
    lo_f = 4096 if N > 256 else 32
    fB = fg._shape_bucket(max(g2.num_between, 1), lo=lo_f) - g2.num_between
    for _ in range(fB):
        g2.b_i.append(0)
        g2.b_j.append(0)
        g2.b_R.append(eye)
        g2.b_t.append(zero3)
        g2.b_sqrt_info.append(np.zeros(6, np.float32))
        g2.b_robust.append(False)
        g2.b_shadow.append(False)
    pB = fg._shape_bucket(max(len(g2.p_i), 1), lo=lo_f) - len(g2.p_i)
    for _ in range(pB):
        g2.p_i.append(0)
        g2.p_R.append(eye)
        g2.p_t.append(zero3)
        g2.p_sqrt_info.append(np.zeros(6, np.float32))

    res = optimize_distributed(g2, mesh=mesh, n_pose_nodes=nA + padA, config=config)
    node_R = np.empty((N, 3, 3), np.float32)
    node_t = np.empty((N, 3), np.float32)
    node_R[np.asarray(pose_ids, np.int32)] = res.node_R[:nA]
    node_t[np.asarray(pose_ids, np.int32)] = res.node_t[:nA]
    if nC:
        node_R[np.asarray(ctrl_ids, np.int32)] = res.node_R[nA + padA : nA + padA + nC]
        node_t[np.asarray(ctrl_ids, np.int32)] = res.node_t[nA + padA : nA + padA + nC]
    return fg.OptimizeResult(
        node_R=node_R, node_t=node_t,
        final_error=res.final_error,
        outlier_mask=res.outlier_mask[: graph.num_between],
        iterations=res.iterations,
    )
