"""Multi-process sharding test: 2 processes x 2 CPU devices run the full
fused frame step SPMD over the GLOBAL device mesh (jax.distributed + Gloo
CPU collectives = the multi-host/DCN analog, SURVEY.md §4 'multi-host tests
using multi-process JAX on CPU'), and must match the single-process result."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(worker, n, port, tmp_path, env, timeout_s):
    """Launch n coordinated jax.distributed workers and return their last
    stdout JSON lines. Outputs go to FILES, not pipes: the workers rendezvous
    through collective barriers, and sequential communicate() leaves the
    other worker's pipe undrained — once it fills (64 KB of JAX logs under
    suite load), that worker blocks mid-barrier and everything times out
    (the r4 in-suite flake)."""
    procs, files = [], []
    for pid in range(n):
        out_f = open(tmp_path / f"w{pid}.out", "w+")
        err_f = open(tmp_path / f"w{pid}.err", "w+")
        files.append((out_f, err_f))
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), str(n), str(port)],
            env=env, stdout=out_f, stderr=err_f, text=True,
        ))
    outs = []
    try:
        for pid, p in enumerate(procs):
            p.wait(timeout=timeout_s)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, (out_f, err_f)) in enumerate(zip(procs, files)):
        out_f.seek(0)
        err_f.seek(0)
        stdout, stderr = out_f.read(), err_f.read()
        out_f.close()
        err_f.close()
        assert p.returncode == 0, f"worker {pid} failed:\n{stderr[-4000:]}"
        outs.append(json.loads(stdout.strip().splitlines()[-1]))
    return outs


def _single_process_reference():
    from khronos_tpu.active_window import fused_step as fs
    from khronos_tpu.active_window.motion_detection import FreeSpaceMotionDetectorConfig
    from khronos_tpu.active_window.object_detection import (
        ConnectedSemanticsConfig,
        LabelSpace,
    )
    from khronos_tpu.geometry.camera import Camera
    from khronos_tpu.map import active_volume as av

    cfg = av.VolumeConfig(grid_shape=(32, 32, 16), voxel_size=0.1)
    cam = Camera(48, 64, 40.0, 40.0, 32.0, 24.0, max_range=5.0)
    ls = LabelSpace(num_classes=7, object_labels=[2, 3, 4, 5, 6], dynamic_labels=[1])
    md = FreeSpaceMotionDetectorConfig(min_cluster_size=5)
    od = ConnectedSemanticsConfig(min_cluster_size=5)

    rng = np.random.default_rng(11)
    depth = jnp.asarray(rng.uniform(0.4, 1.4, (48, 64)).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32))
    labels = np.zeros((48, 64), np.int32)
    labels[10:30, 20:44] = 3
    labels = jnp.asarray(labels)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)

    step = fs.make_frame_step(cfg, cam, md, od, ls, donate=False, crop=False)
    state = av.create(cfg, origin_xyz=np.array([-1.6, -1.6, -0.6]))
    for k in range(2):
        state, dyn_img, obj_img, packed = step(
            state, depth, color, labels, R, t, jnp.float32(0.5 + 0.5 * k)
        )
    return {
        "weight_sum": float(jnp.sum(state.weight)),
        "tsdf_abs_sum": float(jnp.sum(jnp.abs(state.tsdf))),
        "obj_sum": float(jnp.sum(obj_img)),
        "packed_sum": float(jnp.sum(jnp.where(jnp.isfinite(packed), packed, 0.0))),
    }


def test_two_process_full_pipeline_matches_single_process(tmp_path):
    """r4 VERDICT task 6: a COMPLETE KhronosPipeline (active window + backend
    factor graph + change detection + 4D snapshots) on a genuine 2-process
    global mesh — host-side state (tracker, mesh accumulator, factor graph,
    CD caches) replicated per process, device state sharded globally — must
    produce the same end state as a single-process run of the same config."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_pipeline_worker.py")
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    outs = _run_workers(worker, 2, port, tmp_path, env, timeout_s=1800)

    sys.path.insert(0, os.path.dirname(__file__))
    from multihost_pipeline_worker import run_pipeline

    ref = run_pipeline(n_devices=4)  # single process, 4 virtual devices
    for out in outs:
        assert out["devices"] == 4
        for k, v in ref.items():
            got = out[k]
            if isinstance(v, float):
                assert abs(got - v) <= 1e-2 * max(abs(v), 1.0), (k, got, v)
            elif isinstance(v, list) and all(isinstance(x, int) for x in v):
                # per-state vertex counts: a borderline float-threshold
                # classification can flip O(1) vertices between SPMD
                # partitionings (different reduction order); exact equality
                # is not a sound invariant across meshes
                assert len(got) == len(v) and all(
                    abs(a - b) <= max(3, 0.005 * sum(v)) for a, b in zip(got, v)
                ), (k, got, v)
            else:
                assert got == v, (k, got, v)


def test_two_process_sharded_step_matches_single_process(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    outs = _run_workers(worker, 2, port, tmp_path, env, timeout_s=600)

    ref = _single_process_reference()
    for out in outs:
        assert out["devices"] == 4
        for k, v in ref.items():
            assert abs(out[k] - v) <= 1e-3 * max(abs(v), 1.0), (k, out[k], v)
