"""ActiveWindow orchestrator: the per-frame hot path (L1).

Equivalent of khronos::ActiveWindow (khronos/src/active_window/
active_window.cpp:118-174 spinOnce): createData -> motion detect -> object
detect -> track -> TSDF+tracking integrate -> buffer frames -> (every
min_output_separation) mesh + archive inactive voxels + extract inactive
objects -> push ActiveWindowOutput. finishMapping() deactivates everything
and flushes (cpp:176-189).

TPU design: all grid work is jitted device programs over the dense
ActiveVolume; host code only orchestrates, tracks, and accumulates outputs.
The reference's per-stage thread pools and the detached object-extraction
workers become sequential (but batched) device programs — parallelism comes
from the width of each kernel, not host threads.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from khronos_tpu.config import Plugin, plugin_field
from khronos_tpu.geometry.camera import Camera
from khronos_tpu.map import active_volume as av
from khronos_tpu.map import meshing
from khronos_tpu.stm.scene_graph import KhronosObject
from khronos_tpu.utils.logging import clog
from khronos_tpu.utils.timing import Timer
from khronos_tpu.active_window.frame_data import (
    FrameData,
    FrameDataBuffer,
    FrameDataBufferConfig,
)
from khronos_tpu.active_window.object_detection import LabelSpace

# register plugins
from khronos_tpu.active_window import motion_detection as _md  # noqa: F401
from khronos_tpu.active_window import object_detection as _od  # noqa: F401
from khronos_tpu.active_window import instance_forwarding as _if  # noqa: F401
from khronos_tpu.active_window import tracking as _tk  # noqa: F401
from khronos_tpu.active_window import object_extraction as _oe  # noqa: F401


@dataclasses.dataclass
class ActiveWindowConfig:
    min_output_separation: float = 0.4  # s (uHumans2.yaml:38)
    # fused mode: the whole per-frame hot path as ONE jitted program with a
    # single packed host pull (fused_step.py); the modular path keeps each
    # stage separately inspectable
    fused: bool = True
    # run detection (motion/object clustering) on an s-strided image; TSDF
    # integration stays full-res. 2 ~halves the per-frame device time at
    # 480x640 (see fused_step.make_frame_step). Must divide height and width.
    detection_stride: int = 1
    # Host-pull batching (fused mode): every device->host copy costs ~30 ms
    # of tunnel service time AND degrades concurrent device programs
    # (measured: 8 outstanding copies slow every queued program ~40 ms), so
    # all small pulls — per-frame packed tracker stats and emission metas —
    # ride ONE shared buffer ("bus") flushed every `stats_batch_frames`
    # frames. Tracker bookkeeping (host) lags by up to that many frames; the
    # device-side dynamic-integration mask is unaffected. 1 = flush every
    # frame (minimum lag, maximum copies).
    stats_batch_frames: int = 4
    # bounded-queue backpressure: max in-flight host pulls (stats buses /
    # emission rounds) before the oldest is consumed blocking. Bounds host
    # memory and guarantees delivery on platforms that starve async-copy
    # completions under a continuous dispatch stream.
    max_inflight_pulls: int = 4
    # scroll emission: fraction of the scroll-out slab assumed to hold
    # UNMESHED surface cells when sizing the sync-free unconditional emission
    # rounds (see _emit_mesh rounds=...). Most slab surface was already
    # emitted by the periodic archived-cell output path, so the unmeshed
    # residue is small; the audit log on the final round's meta reports
    # drops. 0 falls back to the blocking drain (one host sync per scroll).
    scroll_surface_fraction: float = 0.02
    volumetric_map: av.VolumeConfig = dataclasses.field(default_factory=av.VolumeConfig)
    frame_data_buffer: FrameDataBufferConfig = dataclasses.field(
        default_factory=FrameDataBufferConfig
    )
    motion_detector: Plugin = plugin_field("motion_detector", "FreeSpaceMotionDetector")
    object_detector: Plugin = plugin_field("object_detector", "ConnectedSemantics")
    tracker: Plugin = plugin_field("tracker", "MaxIouTracker")
    object_extractor: Plugin = plugin_field("object_extractor", "MeshObjectExtractor")
    mesh_max_cells: int = 8192
    # device-mesh mode (SURVEY.md §2.7 multi-host row): shard the voxel grid
    # spatially over the leading axis of an n-device jax mesh. The fused step
    # compiles SPMD (halo exchanges over ICI); scroll/emission inherit the
    # sharding through XLA propagation. 0 = plain single-device path (with
    # frustum cropping); 1 = a one-device mesh (the mesh code path without
    # fan-out — for parity tests and scaling baselines). Requires
    # grid_shape[0] % n_devices == 0; cropping is disabled under sharding
    # (the crop offset is camera-dependent, incompatible with a static
    # shard layout — costs ~2x single-chip throughput, regained by the shard
    # fan-out).
    n_devices: int = 0


@dataclasses.dataclass
class ActiveWindowOutput:
    """Map delta pushed downstream (ActiveWindowOutput equivalent)."""

    stamp_ns: int
    R_w_b: np.ndarray
    t_w_b: np.ndarray
    # newly archived background surface (triangle soup with stamps)
    mesh_vertices: np.ndarray  # [T, 3, 3]
    mesh_colors: np.ndarray
    mesh_first_ns: np.ndarray  # [T, 3] int64
    mesh_last_ns: np.ndarray
    mesh_labels: np.ndarray
    # objects extracted from tracks that left the window
    objects: List[KhronosObject] = dataclasses.field(default_factory=list)
    # deferred-extraction mode (async backend stage): tracks whose object
    # extraction the backend worker runs via finalize_output — keeps the
    # 0.5 s batched device scan off the frame loop (reference: extraction
    # happens on the backend thread's input, active_window.cpp worker pool)
    pending_tracks: Optional[List] = None


@jax.jit
def _bus_concat(*xs):
    """One flat f32 buffer from 1-D device vectors (the host-pull bus
    payload). Callers pad to a CANONICAL arity/shape set so this compiles
    exactly once — a new-combination compile landing mid-run costs seconds
    on the dev tunnel."""
    return jnp.concatenate([x.reshape(-1).astype(jnp.float32) for x in xs])


BUS_META_CAPACITY = 8  # emission metas per bus flush (overflow rides the next)


def _empty_mesh_delta():
    return dict(
        mesh_vertices=np.zeros((0, 3, 3), np.float32),
        mesh_colors=np.zeros((0, 3, 3), np.float32),
        mesh_first_ns=np.zeros((0, 3), np.int64),
        mesh_last_ns=np.zeros((0, 3), np.int64),
        mesh_labels=np.zeros((0, 3), np.int32),
    )


class ActiveWindow:
    def __init__(self, config: ActiveWindowConfig, camera: Camera, label_space: LabelSpace):
        self.config = config
        self.camera = camera
        self.label_space = label_space
        vol_cfg = config.volumetric_map
        self.state = av.create(vol_cfg)
        self.mesh = None
        if config.n_devices >= 1:
            from khronos_tpu.parallel import sharding as _sh

            if vol_cfg.grid_shape[0] % config.n_devices:
                raise ValueError(
                    f"grid_shape[0]={vol_cfg.grid_shape[0]} not divisible by "
                    f"n_devices={config.n_devices}"
                )
            self.mesh = _sh.make_mesh(config.n_devices)
            self.state = _sh.shard_volume(self.state, self.mesh)
        self._origin_np = np.asarray(self.state.origin)
        self._initialized_origin = False
        self.motion_detector = config.motion_detector.create(vol_cfg, camera)
        self.object_detector = config.object_detector.create(vol_cfg, camera, label_space)
        self.tracker = config.tracker.create()
        if hasattr(self.tracker, "set_camera"):
            self.tracker.set_camera(camera)
        self.object_extractor = config.object_extractor.create(camera)
        self.frame_buffer = FrameDataBuffer(config.frame_data_buffer)
        self._last_output_s: float = -np.inf
        # time base: device programs consume float32 seconds, so all device
        # time is RELATIVE to the first frame's stamp (or a pipeline-provided
        # t0). Epoch-scale bag stamps (~1.7e9 s) would otherwise quantize to
        # ~128 s in float32, breaking ever-free timing and mesh stamps. Host
        # int64 ns stamps stay absolute; emitted mesh stamps re-add t0.
        self._t0_ns: Optional[int] = None
        # async backend stage: when True, _build_output attaches the pending
        # tracks instead of extracting objects inline; the backend worker
        # calls finalize_output. _inflight_tracks keeps their frames alive
        # across the trim until extraction runs.
        self.defer_object_extraction = False
        self._inflight_tracks: List[List] = []
        self._pending_mesh: List[dict] = []
        self._pending_mesh_dev: List = []  # in-flight device emission buffers
        self._pending_tracks = []
        self.frame_count = 0
        # --- host-pull bus state (see ActiveWindowConfig.stats_batch_frames)
        self._track_queue: List = []  # [(frame, packed_dev), ...] oldest first
        self._bus_unflushed: List = []  # packed stats not yet on a bus
        self._bus_metas: List = []  # emission entries whose meta rides next bus
        self._bus_pending: List = []  # [(n_stats, n_slots, entries, buf_dev), ...]
        self._zero_meta = None  # cached padding vector for canonical flushes
        self._stats_len = 0  # packed-stats vector length (set on first frame)
        self._sinks: List = []  # per-frame debug sinks (addKhronosSink parity)
        self._build_fused_step()

    def add_sink(self, sink) -> None:
        """Register a per-frame sink called as sink(frame, aw, output) after
        each spin_once (reference ActiveWindow::addKhronosSink,
        active_window.h:116; used by ActiveWindowVisualizer)."""
        self._sinks.append(sink)

    def _build_fused_step(self) -> None:
        """(Re)compile the fused per-frame device program. Called from
        __init__ and after checkpoint restore (compiled programs are not
        serialized)."""
        config, camera, label_space = self.config, self.camera, self.label_space
        vol_cfg = config.volumetric_map
        self._fused_step = None
        self._openset_fused = False
        fused_ok = config.object_detector.type in (
            None, "ConnectedSemantics", "InstanceForwarding",
        )
        if config.object_detector.type == "InstanceForwarding":
            from khronos_tpu.active_window import fused_step as fs

            # the fused packed-stats layout caps clusters at fused_step.MC;
            # configs asking for more instances keep the modular path
            fused_ok = config.object_detector.config.max_instances <= fs.MC
        if config.fused and fused_ok:
            from khronos_tpu.active_window import fused_step as fs

            od_cfg = (
                config.object_detector.config if config.object_detector.enabled else None
            )
            self._openset_fused = config.object_detector.type == "InstanceForwarding"
            bg_emb = getattr(self.object_detector, "background_embeddings", None)
            md_cfg = (
                config.motion_detector.config if config.motion_detector.enabled else None
            )
            if self.mesh is not None:
                from khronos_tpu.parallel import sharding as _sh

                self._fused_step = _sh.make_sharded_frame_step(
                    vol_cfg, camera, md_cfg, od_cfg, label_space, self.mesh,
                    detection_stride=config.detection_stride,
                    background_embeddings=bg_emb if self._openset_fused else None,
                    feature_dim=getattr(od_cfg, "feature_dim", 0) if self._openset_fused else 0,
                )
            else:
                self._fused_step = fs.make_frame_step(
                    vol_cfg,
                    camera,
                    md_cfg,
                    od_cfg,
                    label_space,
                    detection_stride=config.detection_stride,
                    background_embeddings=bg_emb if self._openset_fused else None,
                    feature_dim=getattr(od_cfg, "feature_dim", 0) if self._openset_fused else 0,
                )
            self._unpack_stats = fs.unpack_stats
            if self._openset_fused:
                self._feature_dim = (
                    bg_emb.shape[1]
                    if bg_emb is not None and len(bg_emb)
                    else max(int(getattr(od_cfg, "feature_dim", 0)), 1)
                )

    def set_background_embeddings(self, embeddings) -> None:
        """Set the open-set background-prompt embedding group and recompile
        the fused step with the on-device background filter."""
        if hasattr(self.object_detector, "set_background_embeddings"):
            self.object_detector.set_background_embeddings(embeddings)
        self._build_fused_step()

    def __getstate__(self):
        state = self.__dict__.copy()
        state.pop("_fused_step", None)
        state.pop("_unpack_stats", None)
        state.pop("mesh", None)  # device handles are session-local
        state["_sinks"] = []  # sinks are session-local (may be unpicklable)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self.mesh = None
        if self.config.n_devices >= 1:
            from khronos_tpu.parallel import sharding as _sh

            self.mesh = _sh.make_mesh(self.config.n_devices)
            self.state = _sh.shard_volume(self.state, self.mesh)
        self._build_fused_step()

    # ------------------------------------------------------------------
    def set_time_base(self, t0_ns: int) -> None:
        """Fix the device time origin (called once by the pipeline so every
        stage shares one t0). Must precede the first spin_once."""
        if self._t0_ns is not None and self._t0_ns != t0_ns:
            raise ValueError("time base already set from a processed frame")
        self._t0_ns = int(t0_ns)

    def spin_once(self, frame: FrameData) -> Optional[ActiveWindowOutput]:
        cfg = self.config
        vol_cfg = cfg.volumetric_map
        if self._t0_ns is None:
            self._t0_ns = frame.stamp_ns
        t_now = (frame.stamp_ns - self._t0_ns) * 1e-9
        cam_pos = np.asarray(frame.t_w_c)

        with Timer("active_window/all", frame.stamp_ns):
            # 0) scroll the volume if the camera approaches the grid boundary
            # (origin cached on host — no device sync on the hot path)
            if not self._initialized_origin:
                shape = np.asarray(vol_cfg.grid_shape)
                origin = np.floor(
                    cam_pos / vol_cfg.voxel_size - shape / 2.0
                ).astype(np.int32)
                origin_dev = jnp.asarray(origin)
                if self.mesh is not None:  # replicate over the device mesh
                    from jax.sharding import NamedSharding, PartitionSpec

                    origin_dev = jax.device_put(
                        origin_dev, NamedSharding(self.mesh, PartitionSpec())
                    )
                self.state = self.state._replace(origin=origin_dev)
                self._origin_np = origin
                self._initialized_origin = True
            elif av.needs_recenter(vol_cfg, self.state, cam_pos, self._origin_np):
                with Timer("active_window/scroll", frame.stamp_ns):
                    shift = av.recenter_shift(vol_cfg, self.state, cam_pos, self._origin_np)
                    with Timer("scroll/out_mask"):
                        out_mask = av.scroll_out_mask(self.state, shift)
                    # sync-free drain: the slab geometry is host-known, so the
                    # round count is sized from it instead of a blocking meta
                    # pull (emission rounds + scroll all execute in device
                    # program order; the frame loop never stalls)
                    rounds = self._scroll_rounds(shift)
                    with Timer("scroll/mask"):
                        fmask = meshing.forced_emission_mask(self.state, out_mask)
                    with Timer("scroll/emit"):
                        self._emit_mesh(fmask, rounds=rounds)
                    with Timer("scroll/roll"):
                        self.state = av.scroll(vol_cfg, self.state, shift)
                    self._origin_np = self._origin_np + np.asarray(shift, np.int32)

            if self._fused_step is not None:
                # 1-4 fused) detect + track-stats + integrate + archive in one
                # device program. The packed stats pull is double-buffered:
                # this frame's transfer overlaps the NEXT frame's device work;
                # the tracker processes stats one frame behind (pure host
                # bookkeeping — the dynamic-integration mask is applied on
                # device inside the fused step, so map quality is unaffected).
                with Timer("active_window/fused_step", frame.stamp_ns):
                    if self._openset_fused:
                        D = self._feature_dim
                        feats = np.zeros((32, D), np.float32)
                        lf = frame.label_features
                        if lf is not None and len(lf):
                            lf = np.asarray(lf, np.float32)
                            n = min(len(lf), 32)
                            feats[:n, : min(lf.shape[1], D)] = lf[:n, :D]
                        instances = (
                            frame.instances
                            if frame.instances is not None
                            else jnp.zeros(frame.depth.shape, jnp.int32)
                        )
                        self.state, dyn_img, obj_img, packed = self._fused_step(
                            self.state, frame.depth, frame.color, frame.labels,
                            instances, feats, frame.R_w_c, frame.t_w_c,
                            jnp.float32(t_now),
                        )
                    else:
                        self.state, dyn_img, obj_img, packed = self._fused_step(
                            self.state,
                            frame.depth,
                            frame.color,
                            frame.labels,
                            frame.R_w_c,
                            frame.t_w_c,
                            jnp.float32(t_now),
                        )
                    frame.dynamic_image = dyn_img
                    frame.object_image = obj_img
                self._track_frame(frame, packed)
            else:
                # 1) motion detection (uses pre-integration tracking state)
                if self.motion_detector is not None:
                    with Timer("motion_detection/all", frame.stamp_ns):
                        self.motion_detector.process(self.state, frame)
                if frame.dynamic_image is None:
                    frame.dynamic_image = jnp.zeros(frame.depth.shape, jnp.int32)

                # 2) object detection
                if self.object_detector is not None:
                    with Timer("object_detection/all", frame.stamp_ns):
                        self.object_detector.process(self.state, frame)
                if frame.object_image is None:
                    frame.object_image = jnp.zeros(frame.depth.shape, jnp.int32)

                # 3) tracking
                finished_tracks = []
                if self.tracker is not None:
                    with Timer("tracking/all", frame.stamp_ns):
                        points_w = np.asarray(
                            self.camera.vertex_image_world(frame.depth, frame.R_w_c, frame.t_w_c)
                        )
                        finished_tracks = self.tracker.process(frame, points_w)
                self._pending_tracks.extend(finished_tracks)

                # 4) TSDF + tracking-layer integration (dynamic masked out)
                with Timer("integration/all", frame.stamp_ns):
                    mask = frame.dynamic_image > 0
                    self.state = av.integrate_frame(
                        vol_cfg,
                        self.camera,
                        self.state,
                        frame.depth,
                        frame.color,
                        frame.labels,
                        mask,
                        frame.R_w_c,
                        frame.t_w_c,
                        jnp.float32(t_now),
                    )
                    self.state = av.update_archival(vol_cfg, self.state, t_now)

            # 4.5) pump the host-pull pipeline: flush the bus on cadence,
            # deliver any landed bus (tracker stats + emission metas), and
            # advance emission body pulls; pure host checks, no device sync
            with Timer("active_window/advance_pulls", frame.stamp_ns):
                if (
                    len(self._bus_unflushed) >= max(1, cfg.stats_batch_frames)
                    or (self._bus_metas and not self._bus_unflushed)
                ):
                    self._flush_bus()
                self._poll_bus()
                self._advance_mesh_pulls()
                # bounded in-flight backlog (see _poll_bus): keeps host
                # state/memory bounded and guarantees delivery even when the
                # platform withholds async-copy completions
                cap = max(1, cfg.max_inflight_pulls)
                if len(self._bus_pending) > cap:
                    self._poll_bus(min_drain=len(self._bus_pending) - cap)
                if len(self._pending_mesh_dev) > cap:
                    if self._pending_mesh_dev[0][3] == "meta_bus":
                        # head entry's meta rides a bus not yet flushed:
                        # flush + consume one bus so the force below can act
                        self._flush_bus()
                        self._poll_bus(min_drain=1)
                    self._advance_mesh_pulls(
                        force=len(self._pending_mesh_dev) - cap
                    )

            # 5) frame buffer. Frames not yet seen by the (one-frame-lagged)
            # tracker must survive the trim. Buffered frames keep only what
            # object extraction consumes (depth + object_image + pose):
            # color/labels retained ~60% more device memory — and under the
            # axon tunnel every live device buffer also pins a host mirror
            # (~8 MB/frame x up to 92 retained frames on the r5 endurance).
            self.frame_buffer.store(dataclasses.replace(
                frame,
                color=None,
                labels=None,
                instances=None,
                dynamic_image=None,
            ))
            if self.tracker is not None:
                referenced = set(self.tracker.referenced_stamps())
                referenced.add(frame.stamp_ns)
                for queued_frame, _ in self._track_queue:
                    referenced.add(queued_frame.stamp_ns)
                # finished tracks awaiting extraction at the next output must
                # keep their frames alive too — otherwise reconstruction
                # quality depends on WHEN async pulls land relative to the
                # trim (timing-dependent object recall)
                for t in self._pending_tracks:
                    referenced.update(o.stamp_ns for o in t.observations)
                # tracks handed to the async backend stage but not yet
                # extracted keep their frames alive too (same contract)
                for tl in list(self._inflight_tracks):
                    for t in tl:
                        referenced.update(o.stamp_ns for o in t.observations)
                self.frame_buffer.trim(referenced)

            self.frame_count += 1

            # 6) periodic output extraction
            output = None
            if t_now - self._last_output_s >= cfg.min_output_separation:
                self._last_output_s = t_now
                with Timer("active_window/extract_output", frame.stamp_ns):
                    output = self._extract_output(frame)
        for sink in self._sinks:
            sink(frame, self, output)
        return output

    # ------------------------------------------------------------------
    def _track_frame(self, frame: FrameData, packed) -> None:
        """Queue (frame, packed stats) for the bus; the tracker runs when the
        batch containing this frame's stats lands on the host (up to
        stats_batch_frames behind the device)."""
        self._track_queue.append((frame, packed))
        self._bus_unflushed.append(packed)
        self._stats_len = packed.shape[0]

    def _flush_bus(self) -> None:
        """Dispatch ONE concatenated device buffer + host copy carrying all
        accumulated per-frame packed stats and pending emission metas. The
        payload is padded to a canonical arity (stats_batch_frames stats +
        BUS_META_CAPACITY metas) so _bus_concat compiles exactly once."""
        if not self._bus_unflushed and not self._bus_metas:
            return
        K = max(1, self.config.stats_batch_frames)
        n_stats = len(self._bus_unflushed)
        stats = list(self._bus_unflushed)
        if stats:  # pad to exactly K slots (repeat last; ignored on unpack)
            stats = stats + [stats[-1]] * (K - len(stats))
        metas = self._bus_metas[:BUS_META_CAPACITY]
        overflow = self._bus_metas[BUS_META_CAPACITY:]
        if self._zero_meta is None:
            self._zero_meta = jnp.zeros((9,), jnp.float32)
        meta_items = [e[1] for e in metas]
        meta_items += [self._zero_meta] * (BUS_META_CAPACITY - len(meta_items))
        buf = _bus_concat(*stats, *meta_items)
        try:
            buf.copy_to_host_async()
        except AttributeError:
            pass
        self._bus_pending.append((n_stats, len(stats), metas, buf))
        self._bus_unflushed = []
        self._bus_metas = overflow

    def _poll_bus(self, block: bool = False, min_drain: int = 0) -> None:
        """Deliver landed buses in FIFO order: run the tracker over each
        carried frame's stats and hand each carried emission meta to its
        entry (starting the used-rows body pull). `min_drain` force-consumes
        (blocking) at least that many oldest buses — bounded-queue
        backpressure for platforms that starve async-copy completions under
        a continuous dispatch stream (observed on the axon tunnel: with a
        never-blocking frame loop, `is_ready` may never flip and the
        in-flight backlog grows without bound)."""
        drained = 0
        while self._bus_pending:
            n_stats, n_slots, entries, buf = self._bus_pending[0]
            if not block and drained >= min_drain:
                try:
                    if not buf.is_ready():
                        return
                except AttributeError:
                    pass
            arr = np.asarray(buf)
            off = 0
            for i in range(n_slots):
                if i < n_stats:
                    frame, packed = self._track_queue.pop(0)
                    n = packed.shape[0]
                    self._run_tracker(frame, arr[off : off + n])
                    off += n
                else:  # padding slot (repeat of the last stats vector)
                    off += self._stats_len
            for ent in entries:
                meta = arr[off : off + 9]
                off += 9
                ent[1] = meta
                ent[0] = meshing.start_body_pull(ent[0], int(meta[0]))
                ent[3] = "body"
            self._bus_pending.pop(0)
            drained += 1

    def _run_tracker(self, frame: FrameData, packed) -> None:
        dyn_c, sem_c, dyn_p, sem_p = self._unpack_stats(
            np.asarray(packed),
            features=frame.label_features if self._openset_fused else None,
            openset=self._openset_fused,
        )
        frame.dynamic_clusters = dyn_c
        frame.semantic_clusters = sem_c
        if self.tracker is not None:
            with Timer("tracking/all", frame.stamp_ns):
                finished = self.tracker.process(frame, cluster_points=(dyn_p, sem_p))
            self._pending_tracks.extend(finished)

    def _flush_tracker_queue(self) -> None:
        """Force every queued frame through the tracker (finish/test path):
        flush the bus and consume it blocking (safe — its copy is started)."""
        self._flush_bus()
        self._poll_bus(block=True)

    # ------------------------------------------------------------------
    def finish_mapping(self, frame: Optional[FrameData] = None) -> ActiveWindowOutput:
        """Deactivate everything and flush (finishMapping, cpp:176-189)."""
        self._flush_tracker_queue()
        if self.tracker is not None:
            self._pending_tracks.extend(self.tracker.finish())
        self._emit_mesh(meshing.finish_emission_mask(self.state))
        last = frame
        stamp = last.stamp_ns if last is not None else 0
        R = np.asarray(last.R_w_c) if last is not None else np.eye(3, dtype=np.float32)
        t = np.asarray(last.t_w_c) if last is not None else np.zeros(3, np.float32)
        return self._build_output(stamp, R, t, flush_async=True)

    # ------------------------------------------------------------------
    def _extract_output(self, frame: FrameData) -> ActiveWindowOutput:
        # async single round: leftover cells stay unmeshed and re-emit at the
        # next output; the buffer transfer overlaps upcoming frame compute
        with Timer("extract/emit_dispatch", frame.stamp_ns):
            self._emit_mesh(meshing.archived_emission_mask(self.state), drain=False)
        return self._build_output(
            frame.stamp_ns, np.asarray(frame.R_w_c), np.asarray(frame.t_w_c)
        )

    def _scroll_rounds(self, shift) -> int:
        """Host-side estimate of the emission rounds needed to cover a
        scroll-out slab: slab voxel count x scroll_surface_fraction surface
        cells, each round consuming up to mesh_max_cells of them. 0 means
        'use the blocking drain' (scroll_surface_fraction <= 0)."""
        frac = self.config.scroll_surface_fraction
        if frac <= 0:
            return 0
        X, Y, Z = self.config.volumetric_map.grid_shape
        sx, sy, sz = (abs(int(s)) for s in np.asarray(shift))
        slab = min(sx, X) * Y * Z + sy * X * Z + sz * X * Y
        est_cells = max(1.0, slab * frac)
        return int(np.clip(-(-est_cells // self.config.mesh_max_cells), 1, 6))

    def _emit_mesh(self, emit_mask, drain: bool = True, rounds: int = 0) -> None:
        """Emit surface cells into the pending device-buffer list.

        drain=False dispatches ONE device round; leftover cells re-emit at the
        next output. rounds=n > 0 dispatches n rounds back-to-back with NO
        host sync (each round recomputes mask & ~cell_meshed on device, so
        rounds are incremental); used by scroll, where the round count is
        estimated from the slab geometry — the last round's meta is checked
        lazily at the next output and logs if cells were dropped.
        drain=True (finish / restore paths) guarantees EVERY cell in the mask
        is emitted before returning, with ONE host sync: round 1's tiny meta
        reports how many cells are wanted, and each round is guaranteed to
        consume at least min_cells_per_round cells, so the remaining rounds
        are dispatched back-to-back without further syncs (device programs
        execute in order). Body pulls stay deferred to _build_output."""
        vol_cfg = self.config.volumetric_map
        max_cells = self.config.mesh_max_cells

        def one_round(blocking_meta: bool):
            # non-drain rounds send their meta over the shared bus (no own
            # host copy); drain rounds own an async meta copy since the
            # caller needs the count synchronously
            self.state, packed_dev, meta_dev = meshing.extract_mesh_async(
                self.state, emit_mask, vol_cfg, max_cells=max_cells,
                copy_meta=blocking_meta,
            )
            stage = "meta_copy" if blocking_meta else "meta_bus"
            ent = [packed_dev, meta_dev, None, stage]
            self._pending_mesh_dev.append(ent)
            if not blocking_meta:
                self._bus_metas.append(ent)
            return ent

        ent = one_round(drain and rounds == 0)
        if rounds > 0:
            # rounds are incremental re-dispatches of the SAME program with
            # the same mask: extract excludes cell_meshed internally, so no
            # eager ops run between rounds (those block against a deep
            # device queue on the dev tunnel)
            for _ in range(rounds - 1):
                ent = one_round(False)
            # flag the final round: its meta is audited on consume
            ent[2] = "scroll_final"
            return
        if not drain:
            return
        meta = np.asarray(ent[1])
        n_remaining = max(0, int(meta[1]) - int(meta[2]))
        per_round = meshing.min_cells_per_round(max_cells)
        drain_rounds = -(-n_remaining // per_round)
        for _ in range(drain_rounds):
            one_round(True)

    def _advance_mesh_pulls(self, force: int = 0) -> None:
        """Middle stages of the zero-sync emission pipeline. Per pending
        round, in FIFO order: (a) once its meta is host-known — delivered by
        the bus ("meta_bus" entries, handled in _poll_bus) or via its own
        async copy ("meta_copy") — start the async transfer of ONLY its used
        body rows (start_body_pull): the full fixed-capacity buffer is mostly
        padding; (b) once the body rows have landed, unpack into the pending
        mesh-delta list right away, so the periodic output path almost never
        blocks on a transfer. Stops at the first round that is not ready
        (keeps delta order deterministic).
        Entry layout: [body_or_packed, meta(dev|np), tag, stage].
        `force` consumes (blocking) at least that many oldest READY-metadata
        entries — backpressure companion to _poll_bus(min_drain=...)."""
        done = 0
        for ent in self._pending_mesh_dev:
            forced = done < force
            if ent[3] == "meta_bus":
                break  # its meta rides a bus that has not landed yet
            if ent[3] == "meta_copy":
                meta_dev = ent[1]
                if not forced:
                    try:
                        if not meta_dev.is_ready():
                            break
                    except AttributeError:
                        pass
                ent[1] = np.asarray(meta_dev)
                ent[0] = meshing.start_body_pull(ent[0], int(ent[1][0]))
                ent[3] = "body"
            body_dev = ent[0]
            if not forced:
                try:
                    if body_dev is not None and not body_dev.is_ready():
                        break
                except AttributeError:
                    pass
            self._finalize_pull(ent)
            done += 1
        if done:
            self._pending_mesh_dev = self._pending_mesh_dev[done:]

    def _finalize_pull(self, ent) -> None:
        """Last stage: transfer-to-host is complete (or forced) — unpack the
        round and append its triangles to the pending mesh deltas. Audits the
        scroll-final round's meta for dropped cells. Callers must have
        resolved "meta_bus" entries (bus drained) before forcing this."""
        body_dev, meta_any, tag, stage = ent
        meta = np.asarray(meta_any)
        if stage != "body":  # flush path: start the used-rows pull now
            body_dev = meshing.start_body_pull(body_dev, int(meta[0]))
        body = (
            np.asarray(body_dev) if body_dev is not None else np.zeros((0, 12), np.uint32)
        )
        tris, n_remaining = meshing.unpack_mesh(body, meta)
        if tag == "scroll_final" and n_remaining > 0:
            clog(
                2,
                f"scroll emission under-provisioned: {n_remaining} "
                "surface cells dropped (raise scroll_surface_fraction)",
            )
        self._append_mesh_delta(tris)

    def _append_mesh_delta(self, tris) -> None:
        if len(tris["vertices"]):
            t0 = self._t0_ns or 0  # voxel obs times are t0-relative seconds
            self._pending_mesh.append(
                dict(
                    mesh_vertices=tris["vertices"],
                    mesh_colors=tris["colors"],
                    mesh_first_ns=(tris["first_obs"].astype(np.float64) * 1e9).astype(np.int64) + t0,
                    mesh_last_ns=(tris["last_obs"].astype(np.float64) * 1e9).astype(np.int64) + t0,
                    mesh_labels=tris["labels"],
                )
            )

    def _build_output(self, stamp_ns, R, t, flush_async: bool = False) -> ActiveWindowOutput:
        # Collect deferred async emission rounds. The steady-state path is
        # NON-blocking: rounds whose transfers have landed were already
        # unpacked by _advance_mesh_pulls; anything still in flight simply
        # joins the NEXT output's delta (same contract as drain=False cell
        # re-emission). flush_async (finish/restore) force-consumes
        # everything, blocking on in-flight transfers.
        with Timer("extract/consume_pulls", stamp_ns):
            self._poll_bus()
            self._advance_mesh_pulls()
            if flush_async:
                # drain the bus so every "meta_bus" entry has its meta, then
                # force-consume all rounds (blocking)
                self._flush_bus()
                self._poll_bus(block=True)
                for ent in self._pending_mesh_dev:
                    self._finalize_pull(ent)
                self._pending_mesh_dev = []
        # merge pending mesh deltas
        if self._pending_mesh:
            delta = {
                k: np.concatenate([d[k] for d in self._pending_mesh])
                for k in self._pending_mesh[0]
            }
        else:
            delta = _empty_mesh_delta()
        self._pending_mesh = []

        objects: List[KhronosObject] = []
        pending: Optional[List] = None
        if self.object_extractor is not None and self._pending_tracks:
            if self.defer_object_extraction and not flush_async:
                pending = self._pending_tracks
                self._inflight_tracks.append(pending)
            else:
                with Timer("object_extraction/all", stamp_ns):
                    objects = self.object_extractor.extract_all(
                        self._pending_tracks, self.frame_buffer
                    )
        self._pending_tracks = []

        return ActiveWindowOutput(
            stamp_ns=stamp_ns,
            R_w_b=R,
            t_w_b=t,
            objects=objects,
            pending_tracks=pending,
            **delta,
        )

    def finalize_output(self, out: ActiveWindowOutput) -> ActiveWindowOutput:
        """Run the deferred object extraction for `out` (async backend
        stage). Safe off the frame loop: the tracks' frames are pinned via
        _inflight_tracks until this completes, and extraction only reads
        the frame buffer."""
        if out.pending_tracks:
            with Timer("object_extraction/all", out.stamp_ns):
                out.objects = self.object_extractor.extract_all(
                    out.pending_tracks, self.frame_buffer
                )
            try:
                self._inflight_tracks.remove(out.pending_tracks)
            except ValueError:
                pass
            out.pending_tracks = None
        return out
