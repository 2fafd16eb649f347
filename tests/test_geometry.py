import jax
import jax.numpy as jnp
import numpy as np
import pytest

from khronos_tpu.geometry import Camera, bbox, bilinear_sample, nearest_sample
from khronos_tpu.geometry import transforms as tf


def random_rotation(rng):
    w = rng.normal(size=3)
    return np.asarray(tf.so3_exp(jnp.asarray(w, jnp.float32)))


class TestTransforms:
    def test_so3_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        # keep |w| < pi so the log map returns the same representative
        w = rng.normal(size=(16, 3))
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, size=(16, 1))
        w = jnp.asarray(w, jnp.float32)
        R = tf.so3_exp(w)
        # orthonormal, det=1
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        w2 = tf.so3_log(R)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-4)

    def test_so3_small_angle(self):
        w = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
        R = tf.so3_exp(w)
        assert np.all(np.isfinite(np.asarray(R)))
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)

    def test_se3_exp_log_roundtrip(self):
        rng = np.random.default_rng(1)
        xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
        R, t = tf.se3_exp(xi)
        xi2 = tf.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi2), atol=1e-4)

    def test_compose_inverse(self):
        rng = np.random.default_rng(2)
        Ra = jnp.asarray(random_rotation(rng))
        ta = jnp.asarray(rng.normal(size=3), jnp.float32)
        Ri, ti = tf.inverse(Ra, ta)
        Re, te = tf.compose(Ra, ta, Ri, ti)
        np.testing.assert_allclose(np.asarray(Re), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(te), np.zeros(3), atol=1e-5)

    def test_between_and_transform_points(self):
        rng = np.random.default_rng(3)
        Ra, ta = jnp.asarray(random_rotation(rng)), jnp.asarray(rng.normal(size=3), jnp.float32)
        Rb, tb = jnp.asarray(random_rotation(rng)), jnp.asarray(rng.normal(size=3), jnp.float32)
        Rab, tab = tf.between(Ra, ta, Rb, tb)
        Rb2, tb2 = tf.compose(Ra, ta, Rab, tab)
        np.testing.assert_allclose(np.asarray(Rb2), np.asarray(Rb), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tb2), np.asarray(tb), atol=1e-5)
        pts = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
        out = tf.transform_points(Ra, ta, pts)
        expected = (np.asarray(Ra) @ np.asarray(pts).T).T + np.asarray(ta)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_quat_to_rot_identity(self):
        q = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
        np.testing.assert_allclose(np.asarray(tf.quat_to_rot(q)), np.eye(3), atol=1e-6)

    def test_interpolate_pose_endpoints(self):
        rng = np.random.default_rng(4)
        Ra, ta = jnp.asarray(random_rotation(rng)), jnp.asarray(rng.normal(size=3), jnp.float32)
        Rb, tb = jnp.asarray(random_rotation(rng)), jnp.asarray(rng.normal(size=3), jnp.float32)
        R0, t0 = tf.interpolate_pose(Ra, ta, Rb, tb, 0.0)
        R1, t1 = tf.interpolate_pose(Ra, ta, Rb, tb, 1.0)
        np.testing.assert_allclose(np.asarray(R0), np.asarray(Ra), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t1), np.asarray(tb), atol=1e-4)


class TestCamera:
    cam = Camera(height=48, width=64, fx=40.0, fy=40.0, cx=32.0, cy=24.0)

    def test_project_backproject_roundtrip(self):
        depth = jnp.full((48, 64), 2.0, jnp.float32)
        pts = self.cam.back_project(depth)
        u, v, z = self.cam.project(pts)
        uu, vv = jnp.meshgrid(
            jnp.arange(64, dtype=jnp.float32) + 0.5, jnp.arange(48, dtype=jnp.float32) + 0.5
        )
        np.testing.assert_allclose(np.asarray(u), np.asarray(uu), atol=1e-4)
        np.testing.assert_allclose(np.asarray(v), np.asarray(vv), atol=1e-4)
        np.testing.assert_allclose(np.asarray(z), 2.0, atol=1e-5)

    def test_vertex_image_world_with_pose(self):
        depth = jnp.full((48, 64), 1.0, jnp.float32)
        R = jnp.eye(3)
        t = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
        verts = self.cam.vertex_image_world(depth, R, t)
        # center pixel looks along +z
        c = np.asarray(verts[24, 32])
        np.testing.assert_allclose(c, [1.0 + 0.0125, 2.0 + 0.0125, 4.0], atol=0.02)

    def test_range_vs_depth(self):
        depth = jnp.full((48, 64), 3.0, jnp.float32)
        rng_img = self.cam.range_image(depth)
        assert np.all(np.asarray(rng_img) >= 3.0 - 1e-5)

    def test_sampling(self):
        img = jnp.arange(12.0, dtype=jnp.float32).reshape(3, 4)
        val = bilinear_sample(img, jnp.asarray(1.5), jnp.asarray(0.5))
        np.testing.assert_allclose(float(val), (1 + 2 + 5 + 6) / 4.0)
        nn = nearest_sample(img, jnp.asarray(1.6), jnp.asarray(0.4))
        assert float(nn) == 2.0


class TestBBox:
    def test_iou_identical_and_disjoint(self):
        amin = np.zeros(3, np.float32)
        amax = np.ones(3, np.float32)
        assert bbox.iou(amin, amax, amin, amax) == pytest.approx(1.0)
        bmin = np.full(3, 2.0, np.float32)
        bmax = np.full(3, 3.0, np.float32)
        assert bbox.iou(amin, amax, bmin, bmax) == pytest.approx(0.0)
        assert not bbox.intersects(amin, amax, bmin, bmax)

    def test_pairwise(self):
        mins = np.asarray([[0, 0, 0], [0.5, 0, 0]], np.float32)
        maxs = np.asarray([[1, 1, 1], [1.5, 1, 1]], np.float32)
        m = bbox.pairwise_iou(mins, maxs, mins, maxs)
        assert m.shape == (2, 2)
        assert m[0, 0] == pytest.approx(1.0)
        assert m[0, 1] == pytest.approx(0.5 / 1.5, abs=1e-5)

    def test_from_points_masked(self):
        pts = np.asarray([[0, 0, 0], [1, 1, 1], [9, 9, 9]], np.float32)
        valid = np.asarray([True, True, False])
        bmin, bmax = bbox.from_points(pts, valid)
        np.testing.assert_allclose(bmin, [0, 0, 0])
        np.testing.assert_allclose(bmax, [1, 1, 1])


class TestIntervals:
    def test_algebra(self):
        from khronos_tpu.utils import intervals as iv

        f, l = iv.add_presence_duration([], [], 10, 20)
        assert (f, l) == ([10], [20])
        f, l = iv.add_presence_duration(f, l, 30, 40)
        assert (f, l) == ([10, 30], [20, 40])
        f, l = iv.add_presence_duration(f, l, 15, 35)
        assert (f, l) == ([10], [40])
        assert iv.is_present(f, l, 25)
        assert not iv.is_present(f, l, 45)
        assert iv.has_appeared(f, 10)
        assert not iv.has_appeared(f, 5)
        assert iv.has_disappeared(f, l, 50)
        assert not iv.has_disappeared(f, l, 25)
        cf, cl = iv.clamp_intervals([0, 10], [5, 20], 3, 12)
        assert (cf, cl) == ([3, 10], [5, 12])
        mf, ml = iv.merge_presence([0], [5], [4], [9])
        assert (mf, ml) == ([0], [9])
