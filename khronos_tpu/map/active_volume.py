"""ActiveVolume: dense scrolling TSDF+semantic+tracking voxel grid.

TPU-native replacement for the reference's active-window volumetric map stack
(hydra VolumetricMap block hash + ProjectiveIntegrator + khronos
TrackingIntegrator, SURVEY.md §2.1/§2.3). Instead of pointer-based
voxel-block hashing with per-block thread pools (tracking_integrator.cpp:82-103),
the active window is ONE fixed-shape dense grid that scrolls with the camera
(the active window is spatially bounded by sensor range, so a ~13 m dense grid
covers it). Every per-frame update is a fully-vectorized masked elementwise op
or gather over the grid — no allocation, no branching, XLA-fusable.

Temporal archival (tracking_integrator.cpp:106-131 resetInactive): voxels
unobserved for `temporal_window` are flagged `archived`; their surface is
extracted once (meshing.py) and they are reset lazily on re-observation.
Spatial archival happens on scroll-out when the grid recenters.

Channels (all [X, Y, Z] float32 unless noted):
  tsdf            truncated signed distance (init +truncation)
  weight          integration weight (0 = unobserved)
  color           [X, Y, Z, 3] fused color
  label           int32 fused semantic class (-1 none)
  label_weight    winner-take-all confidence counter
  first_obs       first observation time (s, +inf)
  last_obs        last observation time (s, -inf)
  last_occupied   last time tsdf said occupied (-inf)
  ever_free       bool: long-term-free evidence (Dynablox, motion seeds)
  archived        bool: left the active window, surface already extractable
  cell_meshed     bool: cell at min-corner has been emitted to the mesh
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from khronos_tpu.config import check_ge, check_gt
from khronos_tpu.geometry.camera import Camera
from khronos_tpu.ops.dense import all_pool3, any_pool3

INF = jnp.float32(jnp.inf)


@dataclasses.dataclass
class VolumeConfig:
    grid_shape: Tuple[int, int, int] = (128, 128, 64)
    voxel_size: float = 0.1  # m
    truncation_distance: float = 0.2  # m (2-3x voxel, uHumans2.yaml:46)
    max_weight: float = 100.0
    # tracking layer (reference tracking_integrator.h:79-80)
    temporal_window: float = 3.0  # s until a voxel exits the active window
    temporal_buffer: float = 0.5  # s a voxel must stay free to become ever-free
    # Occupancy threshold for the tracking layer, reference semantics
    # (tracking_integrator.cpp:136-138): negative values are multiples of the
    # voxel size with the sign flipped — the default -1.5 means "occupied iff
    # tsdf < +1.5 * voxel_size", i.e. the whole near-surface shell counts as
    # occupied so it can never seed ever-free space.
    tsdf_occupancy_threshold: float = -1.5
    recenter_margin: float = 3.0  # m camera-to-center slack before scrolling

    def check(self):
        check_gt(self.voxel_size, 0.0, "voxel_size")
        check_gt(self.truncation_distance, self.voxel_size * 0.99, "truncation_distance")
        check_gt(self.temporal_window, 0.0, "temporal_window")
        for s in self.grid_shape:
            check_ge(s, 8, "grid_shape")

    @property
    def occupancy_threshold(self) -> float:
        t = self.tsdf_occupancy_threshold
        return -t * self.voxel_size if t < 0 else t


class VolumeState(NamedTuple):
    origin: jnp.ndarray  # int32[3] world voxel index of grid cell (0,0,0)
    tsdf: jnp.ndarray
    weight: jnp.ndarray
    color: jnp.ndarray
    label: jnp.ndarray
    label_weight: jnp.ndarray
    first_obs: jnp.ndarray
    last_obs: jnp.ndarray
    last_occupied: jnp.ndarray
    ever_free: jnp.ndarray
    archived: jnp.ndarray
    cell_meshed: jnp.ndarray


def create(config: VolumeConfig, origin_xyz: Optional[np.ndarray] = None) -> VolumeState:
    """Fresh volume; origin_xyz (m) is the world position of grid corner (0,0,0)."""
    shape = tuple(config.grid_shape)
    if origin_xyz is None:
        origin_xyz = -0.5 * np.asarray(shape) * config.voxel_size
    origin = np.floor(np.asarray(origin_xyz) / config.voxel_size).astype(np.int32)
    z = lambda v, dt=jnp.float32: jnp.full(shape, v, dt)
    return VolumeState(
        origin=jnp.asarray(origin),
        tsdf=z(config.truncation_distance),
        weight=z(0.0),
        color=jnp.zeros(shape + (3,), jnp.float32),
        label=z(-1, jnp.int32),
        label_weight=z(0.0),
        first_obs=z(jnp.inf),
        last_obs=z(-jnp.inf),
        last_occupied=z(-jnp.inf),
        ever_free=z(False, jnp.bool_),
        archived=z(False, jnp.bool_),
        cell_meshed=z(False, jnp.bool_),
    )


def voxel_centers(state: VolumeState, voxel_size: float) -> jnp.ndarray:
    """World-frame voxel center positions [X, Y, Z, 3]."""
    X, Y, Z = state.tsdf.shape
    ix = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), 2)
    idx = jnp.stack([ix, iy, iz], axis=-1) + state.origin
    return (idx.astype(jnp.float32) + 0.5) * voxel_size


def world_to_index(state: VolumeState, points: jnp.ndarray, voxel_size: float):
    """World points [..., 3] -> (grid index int32 [..., 3], in-bounds mask)."""
    idx = jnp.floor(points / voxel_size).astype(jnp.int32) - state.origin
    shape = jnp.asarray(state.tsdf.shape, jnp.int32)
    ok = ((idx >= 0) & (idx < shape)).all(axis=-1)
    return idx, ok


def _reset_values(config: VolumeConfig, state: VolumeState, reset: jnp.ndarray) -> VolumeState:
    """Clear voxel data where `reset` (bool grid) — used for re-observation of
    archived voxels and for scroll-in regions."""
    r3 = reset[..., None]
    # a reset voxel invalidates the meshed flag of every cell touching it
    cell_dirty = any_pool3(reset)
    return state._replace(
        tsdf=jnp.where(reset, config.truncation_distance, state.tsdf),
        weight=jnp.where(reset, 0.0, state.weight),
        color=jnp.where(r3, 0.0, state.color),
        label=jnp.where(reset, -1, state.label),
        label_weight=jnp.where(reset, 0.0, state.label_weight),
        first_obs=jnp.where(reset, INF, state.first_obs),
        last_obs=jnp.where(reset, -INF, state.last_obs),
        last_occupied=jnp.where(reset, -INF, state.last_occupied),
        ever_free=jnp.where(reset, False, state.ever_free),
        archived=jnp.where(reset, False, state.archived),
        cell_meshed=jnp.where(cell_dirty, False, state.cell_meshed),
    )


def integrate_frame(
    config: VolumeConfig,
    camera: Camera,
    state: VolumeState,
    depth: jnp.ndarray,
    color: jnp.ndarray,
    labels: jnp.ndarray,
    exclusion_mask: jnp.ndarray,
    R_w_c: jnp.ndarray,
    t_w_c: jnp.ndarray,
    t_now: jnp.ndarray,
) -> VolumeState:
    """Projective TSDF + color + semantic + tracking-layer update for one frame.

    Equivalent of hydra::ProjectiveIntegrator::updateMap with the khronos
    dynamic integration mask (active_window.cpp:203-215) fused with
    TrackingIntegrator::updateBlocks (tracking_integrator.cpp:71-104) into a
    single pass over the dense grid.

    exclusion_mask: bool [H, W], True = pixel excluded (dynamic object).
    """
    tau = jnp.float32(config.truncation_distance)
    centers = voxel_centers(state, config.voxel_size)  # [X,Y,Z,3]
    # world -> camera
    p = centers - t_w_c
    pc = jnp.einsum("ji,xyzj->xyzi", R_w_c, p)  # R^T @ p
    z = pc[..., 2]
    safe_z = jnp.where(z > 1e-6, z, 1e-6)
    u = pc[..., 0] / safe_z * camera.fx + camera.cx
    v = pc[..., 1] / safe_z * camera.fy + camera.cy
    in_img = (z > 1e-6) & camera.in_image(u, v)
    ui = jnp.clip(jnp.round(u - 0.5).astype(jnp.int32), 0, camera.width - 1)
    vi = jnp.clip(jnp.round(v - 0.5).astype(jnp.int32), 0, camera.height - 1)

    # The per-voxel image lookup is THE cost of this kernel on TPU (random
    # HBM gather). Two levers, both measured on v5e:
    #   1. flat-index gather (multi-array [vi, ui] form costs 3x more);
    #   2. minimal payload: depth f32 + ONE bit-packed word carrying
    #      rgb (3x u8) | label+1 (7b) | exclusion (1b)  ->  8 bytes/voxel.
    rgb_u = (jnp.clip(color, 0.0, 1.0) * 255.0).astype(jnp.uint32)
    word = (
        rgb_u[..., 0]
        | (rgb_u[..., 1] << 8)
        | (rgb_u[..., 2] << 16)
        | ((jnp.clip(labels + 1, 0, 126).astype(jnp.uint32)) << 24)
        | (exclusion_mask.astype(jnp.uint32) << 31)
    )
    packed_img = jnp.stack(
        [depth, jax.lax.bitcast_convert_type(word, jnp.float32)], axis=-1
    ).reshape(-1, 2)
    lin_pix = vi * camera.width + ui
    pix = packed_img[lin_pix]
    d = pix[..., 0]
    w_bits = jax.lax.bitcast_convert_type(pix[..., 1], jnp.uint32)
    pix_color = (
        jnp.stack(
            [w_bits & 0xFF, (w_bits >> 8) & 0xFF, (w_bits >> 16) & 0xFF], axis=-1
        ).astype(jnp.float32)
        / 255.0
    )
    pix_label = ((w_bits >> 24) & 0x7F).astype(jnp.int32) - 1
    pix_excluded = (w_bits >> 31) > 0

    valid_pix = in_img & (d > camera.min_range) & (d <= camera.max_range)
    # along-ray signed distance (projective): scale z-difference by range/z
    range_scale = jnp.sqrt(pc[..., 0] ** 2 + pc[..., 1] ** 2 + z**2) / safe_z
    sdf = (d - z) * range_scale

    upd = valid_pix & (sdf > -tau) & (z <= camera.max_range) & ~pix_excluded

    # lazy reset of archived voxels being re-observed (new session data)
    reset = upd & state.archived
    state = _reset_values(config, state, reset)

    w = state.weight
    w_new = jnp.where(upd, jnp.minimum(w + 1.0, config.max_weight), w)
    sdf_c = jnp.clip(sdf, -tau, tau)
    tsdf_new = jnp.where(upd, (state.tsdf * w + sdf_c) / (w + 1.0), state.tsdf)

    near_surface = upd & (jnp.abs(sdf) <= tau)
    cw = jnp.minimum(w, 20.0)[..., None]
    color_new = jnp.where(
        near_surface[..., None], (state.color * cw + pix_color) / (cw + 1.0), state.color
    )
    # winner-take-all semantic fusion (counting argmax)
    has_label = near_surface & (pix_label >= 0)
    same = has_label & (pix_label == state.label)
    diff = has_label & (pix_label != state.label)
    lw = state.label_weight
    lw_new = jnp.where(same, lw + 1.0, jnp.where(diff, lw - 1.0, lw))
    takeover = diff & (lw_new <= 0.0)
    label_new = jnp.where(takeover, pix_label, state.label)
    lw_new = jnp.where(takeover, 1.0, lw_new)

    first_obs = jnp.where(upd, jnp.minimum(state.first_obs, t_now), state.first_obs)
    last_obs = jnp.where(upd, t_now, state.last_obs)

    # tracking layer (occupancy from the *updated* tsdf). Reference
    # voxelIsFree (tracking_integrator.cpp:248-252): observed and not occupied
    # within temporal_buffer.
    occ = (w_new > 0.0) & (tsdf_new < config.occupancy_threshold)
    last_occupied = jnp.where(occ, t_now, state.last_occupied)
    # ever-free: voxel + full 26-neighborhood observed-free for temporal_buffer.
    # NOT cleared by occupancy: the reference only ever SETS the flag while a
    # block lives (tracking_integrator.cpp:218 is the single write; removal
    # happens when resetInactive archives the block) — that persistence is
    # what keeps a moving person's WHOLE body seeded, not just its leading
    # edge, and it is cleared here on archival / lazy reset instead
    # (update_archival, _reset_values).
    cand = (w_new > 0.0) & (last_occupied + config.temporal_buffer < t_now)
    ever_free = state.ever_free | all_pool3(cand)

    # integration dirties the meshed flag of touched cells
    cell_dirty = any_pool3(upd)
    return state._replace(
        tsdf=tsdf_new,
        weight=w_new,
        color=color_new,
        label=label_new,
        label_weight=lw_new,
        first_obs=first_obs,
        last_obs=last_obs,
        last_occupied=last_occupied,
        ever_free=ever_free,
        cell_meshed=jnp.where(cell_dirty, False, state.cell_meshed),
    )


def crop_shape_for_camera(config: VolumeConfig, camera: Camera) -> Tuple[int, int, int]:
    """Static xy crop size (voxels) of a box guaranteed to contain the camera
    frustum (range ball + truncation + one-voxel stencil margin), rounded up
    to a multiple of 8; z is never cropped (grids are shallow)."""
    need = int(np.ceil(2.0 * (camera.max_range + config.truncation_distance) / config.voxel_size)) + 4
    need = (need + 7) // 8 * 8
    X, Y, Z = config.grid_shape
    return (min(X, need), min(Y, need), Z)


def integrate_frame_cropped(
    config: VolumeConfig,
    camera: Camera,
    state: VolumeState,
    depth: jnp.ndarray,
    color: jnp.ndarray,
    labels: jnp.ndarray,
    exclusion_mask: jnp.ndarray,
    R_w_c: jnp.ndarray,
    t_w_c: jnp.ndarray,
    t_now: jnp.ndarray,
) -> VolumeState:
    """integrate_frame restricted to a camera-centered subgrid.

    The projective update only touches voxels within max_range of the camera,
    so slicing a frustum-bounding box (usually ~2x fewer voxels at the default
    160x160 grid / 5 m range) halves the dominant per-voxel image-gather cost.
    The box includes a stencil margin, so every voxel within range sees its
    true 26-neighborhood for the ever-free update; voxels outside the box are
    untouched (exactly like out-of-frustum voxels in the full pass)."""
    crop = crop_shape_for_camera(config, camera)
    X, Y, Z = state.tsdf.shape
    if all(c >= s for c, s in zip(crop, (X, Y, Z))):
        return integrate_frame(
            config, camera, state, depth, color, labels, exclusion_mask,
            R_w_c, t_w_c, t_now,
        )
    start = crop_start(config, state, t_w_c, crop)
    sub = slice_state(state, start, crop)
    sub = integrate_frame(
        config, camera, sub, depth, color, labels, exclusion_mask, R_w_c, t_w_c, t_now
    )
    return unslice_state(state, sub, start)


def crop_start(config: VolumeConfig, state: VolumeState, t_w_c, crop) -> jnp.ndarray:
    """Camera-centered crop start (grid-local voxel index, clamped in-bounds)."""
    X, Y, Z = state.tsdf.shape
    cam_vox = jnp.floor(t_w_c / config.voxel_size).astype(jnp.int32) - state.origin
    return jnp.clip(
        cam_vox - jnp.asarray(crop, jnp.int32) // 2,
        0,
        jnp.asarray((X - crop[0], Y - crop[1], Z - crop[2]), jnp.int32),
    )


def slice_state(state: VolumeState, start: jnp.ndarray, crop) -> VolumeState:
    sx, sy, sz = start[0], start[1], start[2]

    def take(a):
        extra = a.shape[3:]
        return jax.lax.dynamic_slice(a, (sx, sy, sz) + (0,) * len(extra), tuple(crop) + extra)

    return VolumeState(
        origin=state.origin + start,
        **{f: take(getattr(state, f)) for f in VolumeState._fields if f != "origin"},
    )


def unslice_state(full: VolumeState, sub: VolumeState, start: jnp.ndarray) -> VolumeState:
    sx, sy, sz = start[0], start[1], start[2]

    def put(a, part):
        extra = a.shape[3:]
        return jax.lax.dynamic_update_slice(a, part, (sx, sy, sz) + (0,) * len(extra))

    return VolumeState(
        origin=full.origin,
        **{
            f: put(getattr(full, f), getattr(sub, f))
            for f in VolumeState._fields
            if f != "origin"
        },
    )


def update_archival(config: VolumeConfig, state: VolumeState, t_now) -> VolumeState:
    """Flag voxels unobserved for temporal_window as archived
    (TrackingIntegrator::resetInactive equivalent; data stays until reuse).

    Ever-free is cleared on archival: the reference REMOVES inactive blocks
    (tracking_integrator.cpp resetInactive -> map.removeBlock), so a re-visited
    region starts with a fresh tracking layer. Without this, a static object
    appearing in a previously-free region (the tesse_cd "cooler added" case)
    would land in stale ever-free voxels and be flagged dynamic forever."""
    inactive = (state.weight > 0.0) & (state.last_obs < t_now - config.temporal_window)
    archived = state.archived | inactive
    return state._replace(archived=archived, ever_free=state.ever_free & ~archived)


def active_mask(config: VolumeConfig, state: VolumeState, t_now) -> jnp.ndarray:
    return (state.weight > 0.0) & (state.last_obs >= t_now - config.temporal_window)


def needs_recenter(
    config: VolumeConfig, state: VolumeState, cam_pos: np.ndarray, origin_np=None
) -> bool:
    """Host-side check: camera too far from grid center? Pass origin_np (the
    host-cached origin) to avoid a device->host sync on the hot path."""
    shape = np.asarray(state.tsdf.shape)
    origin = origin_np if origin_np is not None else np.asarray(state.origin)
    center = (origin + shape / 2.0) * config.voxel_size
    return bool(np.any(np.abs(np.asarray(cam_pos) - center) > config.recenter_margin))


def recenter_shift(
    config: VolumeConfig, state: VolumeState, cam_pos: np.ndarray, origin_np=None
) -> np.ndarray:
    """Voxel shift that would center the grid on the camera."""
    shape = np.asarray(state.tsdf.shape)
    origin = origin_np if origin_np is not None else np.asarray(state.origin)
    target_origin = np.floor(
        np.asarray(cam_pos) / config.voxel_size - shape / 2.0
    ).astype(np.int32)
    return target_origin - origin


@jax.jit
def _scroll_out_mask_device(tsdf: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    X, Y, Z = tsdf.shape
    masks = []
    for axis, n in enumerate((X, Y, Z)):
        idx = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), axis)
        s = shift[axis]
        masks.append(jnp.where(s > 0, idx < s, idx >= n + s) & (s != 0))
    return masks[0] | masks[1] | masks[2]


def scroll_out_mask(state: VolumeState, shift: np.ndarray) -> jnp.ndarray:
    """Bool grid of voxels that will leave the volume when rolled by `shift`
    (mesh these before calling `scroll`)."""
    return _scroll_out_mask_device(state.tsdf, jnp.asarray(np.asarray(shift, np.int32)))


def _scroll_device(config: VolumeConfig, state: VolumeState, shift: jnp.ndarray) -> VolumeState:
    """Jit-traced scroll body: shift is a TRACED int32[3] so every scroll
    reuses one compiled program (a python-int shift would retrace per value)."""
    sx, sy, sz = shift[0], shift[1], shift[2]

    def roll3(a):
        return jnp.roll(a, shift=(-sx, -sy, -sz), axis=(0, 1, 2))

    rolled = VolumeState(
        origin=state.origin + shift,
        tsdf=roll3(state.tsdf),
        weight=roll3(state.weight),
        color=roll3(state.color),
        label=roll3(state.label),
        label_weight=roll3(state.label_weight),
        first_obs=roll3(state.first_obs),
        last_obs=roll3(state.last_obs),
        last_occupied=roll3(state.last_occupied),
        ever_free=roll3(state.ever_free),
        archived=roll3(state.archived),
        cell_meshed=roll3(state.cell_meshed),
    )
    # fresh region: cells that wrapped around
    X, Y, Z = state.tsdf.shape
    fresh = []
    for axis, (n, s) in enumerate(zip((X, Y, Z), (sx, sy, sz))):
        idx = jax.lax.broadcasted_iota(jnp.int32, (X, Y, Z), axis)
        fresh.append(jnp.where(s > 0, idx >= n - s, idx < -s))
    fresh_mask = fresh[0] | fresh[1] | fresh[2]
    out = _reset_values(config, rolled, fresh_mask)
    # cells adjacent to the wrap seam must also re-mesh
    return out._replace(cell_meshed=jnp.where(any_pool3(fresh_mask), False, out.cell_meshed))


_scroll_cache = {}


def scroll(config: VolumeConfig, state: VolumeState, shift: np.ndarray) -> VolumeState:
    """Shift the grid window by `shift` voxels (moving-volume scrolling);
    newly exposed cells are reset to defaults. One compiled program per
    volume configuration (shift is traced)."""
    import functools

    key = (tuple(config.grid_shape), config.voxel_size, config.truncation_distance)
    fn = _scroll_cache.get(key)
    if fn is None:
        fn = jax.jit(functools.partial(_scroll_device, config))
        _scroll_cache[key] = fn
    return fn(state, jnp.asarray(np.asarray(shift, np.int32)))
