"""GNC-TLS robust registration (TEASER++-parity slot, SURVEY.md §2.3):
recovery of SE(3) under heavy correspondence outliers, and robust ICP with
unknown correspondences under partial overlap."""

import numpy as np
import pytest

from khronos_tpu.backend.registration import gnc_tls_register, robust_icp


def _random_rotation(rng, max_angle=np.pi):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0.2, max_angle)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _angle_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestGncTls:
    @pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.6])
    def test_recovers_transform_under_outliers(self, outlier_frac):
        rng = np.random.default_rng(3)
        N = 300
        src = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
        R_gt = _random_rotation(rng)
        t_gt = np.array([0.7, -1.2, 0.4])
        dst = src @ R_gt.T + t_gt + rng.normal(0, 0.01, (N, 3))
        n_out = int(outlier_frac * N)
        dst[:n_out] = rng.uniform(-4, 4, (n_out, 3))  # gross outliers
        R, t, w, rms = gnc_tls_register(src, dst, noise_bound=0.05)
        R, t, w = np.asarray(R), np.asarray(t), np.asarray(w)
        assert _angle_deg(R, R_gt) < 1.0, f"rot err {_angle_deg(R, R_gt):.2f} deg"
        assert np.linalg.norm(t - t_gt) < 0.03
        # outliers rejected, inliers kept
        assert w[:n_out].mean() < 0.2 if n_out else True
        assert w[n_out:].mean() > 0.8
        assert float(rms) < 0.05

    def test_padded_invalid_entries_ignored(self):
        rng = np.random.default_rng(5)
        N, P = 200, 56
        src = rng.uniform(-1, 1, (N + P, 3)).astype(np.float32)
        R_gt = _random_rotation(rng)
        t_gt = np.array([0.2, 0.1, -0.3])
        dst = src @ R_gt.T + t_gt
        dst[N:] = 99.0  # garbage padding
        valid = np.concatenate([np.ones(N), np.zeros(P)]).astype(np.float32)
        R, t, w, _ = gnc_tls_register(src, dst, noise_bound=0.05, valid=valid)
        assert _angle_deg(np.asarray(R), R_gt) < 0.5
        assert np.asarray(w)[N:].max() == 0.0

    def test_identity_on_clean_pair(self):
        rng = np.random.default_rng(7)
        src = rng.uniform(-1, 1, (128, 3)).astype(np.float32)
        R, t, w, rms = gnc_tls_register(src, src, noise_bound=0.05)
        assert _angle_deg(np.asarray(R), np.eye(3)) < 1e-3
        assert np.linalg.norm(np.asarray(t)) < 1e-4
        assert float(rms) < 1e-4


class TestRobustIcp:
    def test_partial_overlap_registration(self):
        """Plain ICP's failure mode: only part of the clouds overlap; the
        GNC core must downweight the unmatched region."""
        rng = np.random.default_rng(11)
        # a corner scene: two walls
        n = 250
        wall1 = np.stack([rng.uniform(0, 3, n), np.zeros(n), rng.uniform(0, 2, n)], 1)
        wall2 = np.stack([np.zeros(n), rng.uniform(0, 3, n), rng.uniform(0, 2, n)], 1)
        cloud = np.concatenate([wall1, wall2]).astype(np.float32)
        R_gt = _random_rotation(rng, max_angle=0.25)
        t_gt = np.array([0.15, -0.1, 0.05])
        dst = (cloud @ R_gt.T + t_gt).astype(np.float32)
        # src sees extra geometry dst does not (partial overlap)
        extra = np.stack(
            [rng.uniform(4, 6, 120), rng.uniform(4, 6, 120), rng.uniform(0, 2, 120)], 1
        ).astype(np.float32)
        src = np.concatenate([cloud, extra])
        R0 = np.eye(3, dtype=np.float32)
        t0 = np.zeros(3, np.float32)
        R, t, rms, frac = robust_icp(src, dst, R0, t0, noise_bound=0.08)
        assert _angle_deg(np.asarray(R), R_gt) < 2.0
        assert np.linalg.norm(np.asarray(t) - t_gt) < 0.08
        assert float(frac) > 0.5  # the overlapping 5/6 kept

    def test_lcd_gnc_slot_fires(self):
        """DescriptorLoopClosureDetector with registration='gnc' fires on a
        revisit and returns an accurate relative pose."""
        from khronos_tpu.backend.loop_closure import (
            DescriptorLoopClosureConfig,
            DescriptorLoopClosureDetector,
        )

        rng = np.random.default_rng(13)
        H, W = 32, 48
        # synthetic structured vertex image (camera looking at a corner)
        u = np.linspace(-1, 1, W)[None, :].repeat(H, 0)
        v = np.linspace(-1, 1, H)[:, None].repeat(W, 1)
        depth = 2.0 + 0.8 * np.abs(u) + 0.3 * v
        pts = np.stack([u * depth, v * depth, depth], -1).astype(np.float32)
        valid = np.ones((H, W), bool)

        det = DescriptorLoopClosureDetector(
            DescriptorLoopClosureConfig(
                min_time_gap=1.0, min_detection_separation=0.5, registration="gnc"
            )
        )
        t_a = np.zeros(3, np.float32)
        R_a = np.eye(3, dtype=np.float32)
        out = det.add_keyframe(0, int(0), pts, valid, R_a, t_a)
        assert out == []
        # far away in between (no false positive)
        far = pts + np.array([0, 0, 4.0], np.float32)
        out = det.add_keyframe(1, int(2e9), far, valid, R_a, t_a + np.array([0, 0, 4.0], np.float32))
        # revisit the first pose with small odom drift
        out = det.add_keyframe(
            2, int(4e9), pts, valid, R_a, t_a + np.array([0.05, 0.0, 0.02], np.float32)
        )
        assert len(out) == 1
        lc = out[0]
        assert lc.to_key == 0 and lc.from_key == 2
        # same viewpoint, same cloud: relative pose ~ identity
        assert _angle_deg(lc.R, np.eye(3)) < 2.0
        assert np.linalg.norm(lc.t) < 0.1
