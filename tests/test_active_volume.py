import jax.numpy as jnp
import numpy as np
import pytest

from khronos_tpu.geometry import Camera
from khronos_tpu.map import active_volume as av
from khronos_tpu.map import meshing


def small_config():
    return av.VolumeConfig(
        grid_shape=(64, 64, 32),
        voxel_size=0.1,
        truncation_distance=0.2,
        temporal_window=3.0,
        temporal_buffer=0.5,
    )


def small_camera():
    return Camera(height=60, width=80, fx=50.0, fy=50.0, cx=40.0, cy=30.0, max_range=5.0)


def wall_frame(cam, wall_z=2.0):
    """Camera at origin looking along +z at a wall z=wall_z (world = camera)."""
    depth = jnp.full((cam.height, cam.width), wall_z, jnp.float32)
    color = jnp.ones((cam.height, cam.width, 3), jnp.float32) * 0.5
    labels = jnp.full((cam.height, cam.width), 3, jnp.int32)
    mask = jnp.zeros((cam.height, cam.width), jnp.bool_)
    return depth, color, labels, mask


def make_state(cfg):
    # camera at origin looking +z: put z range [-0.6, 2.6] in the grid
    return av.create(cfg, origin_xyz=np.array([-3.2, -3.2, -0.6]))


def integrate_wall(cfg, cam, state, t=0.0, n=5, wall_z=2.0):
    depth, color, labels, mask = wall_frame(cam, wall_z)
    R = jnp.eye(3)
    tvec = jnp.zeros(3)
    for i in range(n):
        state = av.integrate_frame(
            cfg, cam, state, depth, color, labels, mask, R, tvec, jnp.float32(t + 0.1 * i)
        )
    return state


class TestIntegration:
    def test_wall_tsdf_zero_crossing(self):
        cfg, cam = small_config(), small_camera()
        state = make_state(cfg)
        state = integrate_wall(cfg, cam, state, n=3)
        tsdf = np.asarray(state.tsdf)
        w = np.asarray(state.weight)
        vs = cfg.voxel_size
        origin = np.asarray(state.origin)

        def vox(x, y, z):
            idx = np.floor(np.array([x, y, z]) / vs).astype(int) - origin
            return tuple(idx)

        # on the optical axis: voxel just in front of wall -> positive sdf,
        # just behind -> negative, far in front -> ~ +truncation
        i_front = vox(0.0, 0.0, 1.85)
        i_behind = vox(0.0, 0.0, 2.15)
        i_free = vox(0.0, 0.0, 1.0)
        assert w[i_front] > 0 and w[i_behind] > 0 and w[i_free] > 0
        assert tsdf[i_front] > 0.0
        assert tsdf[i_behind] < 0.0
        assert tsdf[i_free] == pytest.approx(cfg.truncation_distance, abs=1e-5)
        # voxel behind truncation band unobserved
        i_deep = vox(0.0, 0.0, 2.5)
        assert w[i_deep] == 0.0

    def test_semantics_and_color_fused_near_surface(self):
        cfg, cam = small_config(), small_camera()
        state = integrate_wall(cfg, cam, make_state(cfg), n=3)
        origin = np.asarray(state.origin)
        vs = cfg.voxel_size
        idx = tuple(np.floor(np.array([0.0, 0.0, 1.95]) / vs).astype(int) - origin)
        assert int(np.asarray(state.label)[idx]) == 3
        np.testing.assert_allclose(np.asarray(state.color)[idx], 0.5, atol=1 / 255)
        # free-space voxel keeps no label
        idx_free = tuple(np.floor(np.array([0.0, 0.0, 0.8]) / vs).astype(int) - origin)
        assert int(np.asarray(state.label)[idx_free]) == -1

    def test_dynamic_exclusion_mask(self):
        cfg, cam = small_config(), small_camera()
        depth, color, labels, _ = wall_frame(cam)
        mask = jnp.ones((cam.height, cam.width), jnp.bool_)  # exclude all
        state = av.integrate_frame(
            cfg, cam, make_state(cfg), depth, color, labels, mask, jnp.eye(3), jnp.zeros(3), 0.0
        )
        assert float(jnp.sum(state.weight)) == 0.0

    def test_ever_free_after_buffer(self):
        cfg, cam = small_config(), small_camera()
        state = make_state(cfg)
        # observe free space repeatedly over > temporal_buffer
        for k in range(8):
            state = integrate_wall(cfg, cam, state, t=k * 0.2, n=1)
        ef = np.asarray(state.ever_free)
        origin = np.asarray(state.origin)
        idx = tuple(np.floor(np.array([0.0, 0.0, 1.0]) / cfg.voxel_size).astype(int) - origin)
        assert ef[idx]
        # wall voxels are occupied -> not ever-free
        idx_wall = tuple(
            np.floor(np.array([0.0, 0.0, 2.1]) / cfg.voxel_size).astype(int) - origin
        )
        assert not ef[idx_wall]

    def test_archival_flags_old_voxels(self):
        cfg, cam = small_config(), small_camera()
        state = integrate_wall(cfg, cam, make_state(cfg), t=0.0, n=2)
        state = av.update_archival(cfg, state, t_now=5.0)
        arch = np.asarray(state.archived)
        w = np.asarray(state.weight)
        assert arch[w > 0].all()
        state2 = av.update_archival(cfg, state, t_now=1.0)


class TestScroll:
    def test_scroll_preserves_data_and_resets_fresh(self):
        cfg, cam = small_config(), small_camera()
        state = integrate_wall(cfg, cam, make_state(cfg), n=2)
        origin = np.asarray(state.origin)
        vs = cfg.voxel_size
        idx = np.floor(np.array([0.0, 0.0, 1.9]) / vs).astype(int) - origin
        val_before = float(np.asarray(state.tsdf)[tuple(idx)])
        shift = np.array([5, -3, 2])
        out_mask = av.scroll_out_mask(state, shift)
        assert bool(np.asarray(out_mask).any())
        state2 = av.scroll(cfg, state, shift)
        np.testing.assert_array_equal(np.asarray(state2.origin), origin + shift)
        idx2 = idx - shift
        assert float(np.asarray(state2.tsdf)[tuple(idx2)]) == pytest.approx(val_before)
        # fresh region reset
        w2 = np.asarray(state2.weight)
        assert w2[-5:, :, :].sum() == 0.0
        assert w2[:, :3, :].sum() == 0.0

    def test_needs_recenter(self):
        cfg = small_config()
        state = av.create(cfg)
        assert not av.needs_recenter(cfg, state, np.zeros(3))
        far = np.array([cfg.recenter_margin + 1.0, 0, 0])
        assert av.needs_recenter(cfg, state, far)
        shift = av.recenter_shift(cfg, state, far)
        state2 = av.scroll(cfg, state, shift)
        assert not av.needs_recenter(cfg, state2, far)


class TestMeshing:
    def test_tet_table_sanity(self):
        tbl = meshing.TET_TABLE
        # case 0 and 15: no triangles
        assert (tbl[0] == -1).all() and (tbl[15] == -1).all()
        # single-vertex cases: exactly 1 triangle
        for case in (1, 2, 4, 8, 7, 11, 13, 14):
            assert (tbl[case, 0] >= 0).all() and (tbl[case, 1] == -1).all()
        # two-vertex cases: 2 triangles
        for case in (3, 5, 6, 9, 10, 12):
            assert (tbl[case] >= 0).all()

    def test_wall_mesh_on_plane(self):
        cfg, cam = small_config(), small_camera()
        state = integrate_wall(cfg, cam, make_state(cfg), n=4, wall_z=2.0)
        emit = meshing.finish_emission_mask(state)
        state, mesh, n_rem = meshing.extract_mesh(cfg, state, emit, max_cells=8192)
        assert n_rem == 0
        verts = mesh["vertices"].reshape(-1, 3)
        assert len(verts) > 100
        # all vertices on the wall plane z=2.0 (within a voxel)
        np.testing.assert_allclose(verts[:, 2], 2.0, atol=cfg.voxel_size)
        # stamps/colors/labels propagated
        assert (mesh["labels"].reshape(-1) == 3).all()
        assert np.isfinite(mesh["first_obs"]).all()
        np.testing.assert_allclose(mesh["colors"].reshape(-1, 3), 0.5, atol=0.05)

    def test_emission_once_and_redirty(self):
        cfg, cam = small_config(), small_camera()
        state = integrate_wall(cfg, cam, make_state(cfg), n=4)
        emit = meshing.finish_emission_mask(state)
        state, mesh, _ = meshing.extract_mesh(cfg, state, emit, max_cells=8192)
        n1 = len(mesh["vertices"])
        assert n1 > 0
        # second emission: nothing left
        emit2 = meshing.finish_emission_mask(state)
        assert int(np.asarray(emit2).sum()) == 0
        # re-integration dirties cells again
        state = integrate_wall(cfg, cam, state, t=1.0, n=1)
        emit3 = meshing.finish_emission_mask(state)
        assert int(np.asarray(emit3).sum()) > 0

    def test_overflow_rounds_drain(self):
        cfg, cam = small_config(), small_camera()
        state = integrate_wall(cfg, cam, make_state(cfg), n=4)
        total = 0
        rounds = 0
        while True:
            emit = meshing.finish_emission_mask(state)
            if int(np.asarray(emit).sum()) == 0:
                break
            state, mesh, n_rem = meshing.extract_mesh(cfg, state, emit, max_cells=256)
            total += len(mesh["vertices"])
            rounds += 1
            assert rounds < 100
        assert rounds > 1  # forced multiple rounds with tiny capacity
        assert total > 100

    def test_sphere_mesh_accuracy(self):
        """Integrate a synthetic sphere depth rendering from several views and
        check mesh vertices lie on the sphere."""
        cfg = av.VolumeConfig(grid_shape=(64, 64, 64), voxel_size=0.05, truncation_distance=0.1)
        cam = Camera(height=80, width=80, fx=60.0, fy=60.0, cx=40.0, cy=40.0, max_range=5.0)
        center = np.array([0.0, 0.0, 1.5])
        radius = 0.5
        state = av.create(cfg, origin_xyz=np.array([-1.6, -1.6, -0.1]))
        rays = np.asarray(cam.pixel_rays())  # [H,W,3], unit z
        # analytic ray-sphere depth from origin
        d = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
        oc = -center
        b = np.sum(d * oc, axis=-1)
        c = np.dot(center, center) - radius**2
        disc = b * b - c
        t_hit = np.where(disc > 0, -b - np.sqrt(np.maximum(disc, 0)), -1.0)
        depth = np.where(t_hit > 0, t_hit * d[..., 2] / 1.0, 0.0)
        # convert euclidean t to z-depth: ray has unit norm; z = t * dz
        depth = jnp.asarray(np.where(t_hit > 0, t_hit * d[..., 2], 0.0), jnp.float32)
        color = jnp.zeros((80, 80, 3), jnp.float32)
        labels = jnp.zeros((80, 80), jnp.int32)
        mask = jnp.zeros((80, 80), jnp.bool_)
        for i in range(3):
            state = av.integrate_frame(
                cfg, cam, state, depth, color, labels, mask, jnp.eye(3), jnp.zeros(3), 0.1 * i
            )
        emit = meshing.finish_emission_mask(state)
        state, mesh, n_rem = meshing.extract_mesh(cfg, state, emit, max_cells=16384)
        verts = mesh["vertices"].reshape(-1, 3)
        assert len(verts) > 200
        r = np.linalg.norm(verts - center, axis=-1)
        # visible hemisphere vertices should be on the sphere
        assert np.abs(r - radius).mean() < 0.02
        assert np.abs(r - radius).max() < 0.08
