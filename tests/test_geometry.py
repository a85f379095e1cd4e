import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dregnerf_tpu.geometry import se3, kabsch, rotation, cameras


def random_pose(rng):
    from scipy.spatial.transform import Rotation as R

    rot = R.random(random_state=int(rng.integers(1 << 30))).as_matrix()
    t = rng.normal(size=3)
    return jnp.asarray(np.concatenate([rot, t[:, None]], axis=1), dtype=jnp.float32)


class TestSE3:
    def test_cat_inv_roundtrip(self, rng):
        a, b = random_pose(rng), random_pose(rng)
        ab = se3.se3_cat(a, b)
        ident = se3.se3_cat(ab, se3.se3_inv(ab))
        np.testing.assert_allclose(ident, se3.se3_identity(), atol=1e-5)

    def test_transform_matches_matmul(self, rng):
        pose = random_pose(rng)
        pts = jnp.asarray(rng.normal(size=(10, 3)), dtype=jnp.float32)
        out = se3.se3_transform(pose, pts)
        expected = pts @ np.asarray(pose[:3, :3]).T + np.asarray(pose[:3, 3])
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        omega = jnp.asarray(rng.normal(size=3) * 0.5, dtype=jnp.float32)
        rot = se3.so3_exp(omega)
        # valid rotation
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(rot), 1.0, atol=1e-5)
        back = se3.so3_log(rot)
        np.testing.assert_allclose(back, omega, atol=1e-4)

    def test_rotation_distance(self, rng):
        r = se3.so3_exp(jnp.array([0.0, 0.0, np.pi / 6]))
        d = se3.rotation_distance_deg(jnp.eye(3), r)
        np.testing.assert_allclose(d, 30.0, atol=1e-3)

    def test_se3_exp_identity(self):
        pose = se3.se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(pose, se3.se3_identity(), atol=1e-5)

    def test_homogeneous_roundtrip(self, rng):
        pose = random_pose(rng)
        h = se3.to_homogeneous(pose)
        assert h.shape == (4, 4)
        np.testing.assert_allclose(h[3], [0, 0, 0, 1])
        np.testing.assert_allclose(se3.from_homogeneous(h), pose)


class TestKabsch:
    def test_exact_recovery(self, rng):
        pose = random_pose(rng)
        a = jnp.asarray(rng.normal(size=(50, 3)), dtype=jnp.float32)
        b = se3.se3_transform(pose, a)
        w = jnp.ones(50)
        est = kabsch.weighted_rigid_transform(a, b, w)
        np.testing.assert_allclose(est, pose, atol=1e-4)

    def test_weights_ignore_outliers(self, rng):
        pose = random_pose(rng)
        a = jnp.asarray(rng.normal(size=(50, 3)), dtype=jnp.float32)
        b = se3.se3_transform(pose, a)
        b = b.at[:10].add(jnp.asarray(rng.normal(size=(10, 3)) * 5, jnp.float32))
        w = jnp.ones(50).at[:10].set(0.0)
        est = kabsch.weighted_rigid_transform(a, b, w)
        np.testing.assert_allclose(est, pose, atol=1e-3)

    def test_differentiable(self, rng):
        a = jnp.asarray(rng.normal(size=(20, 3)), dtype=jnp.float32)
        b = jnp.asarray(rng.normal(size=(20, 3)), dtype=jnp.float32)

        def loss(w):
            t = kabsch.weighted_rigid_transform(a, b, w)
            return jnp.sum(t**2)

        g = jax.grad(loss)(jnp.ones(20))
        assert np.all(np.isfinite(g))

    def test_degenerate_weights_finite(self, rng):
        a = jnp.asarray(rng.normal(size=(20, 3)), dtype=jnp.float32)
        b = jnp.asarray(rng.normal(size=(20, 3)), dtype=jnp.float32)
        t = kabsch.weighted_rigid_transform(a, b, jnp.zeros(20))
        assert np.all(np.isfinite(t))

    def test_batched(self, rng):
        poses = jnp.stack([random_pose(rng) for _ in range(4)])
        a = jnp.asarray(rng.normal(size=(4, 30, 3)), dtype=jnp.float32)
        b = se3.se3_transform(poses, a)
        est = kabsch.weighted_rigid_transform(a, b, jnp.ones((4, 30)))
        np.testing.assert_allclose(est, poses, atol=1e-3)

    def test_umeyama_scale(self, rng):
        pose = random_pose(rng)
        a = rng.normal(size=(40, 3)).astype(np.float32)
        b = 2.5 * a @ np.asarray(pose[:3, :3]).T + np.asarray(pose[:3, 3])
        s, r, t = kabsch.umeyama(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(s, 2.5, atol=1e-3)
        np.testing.assert_allclose(r, pose[:3, :3], atol=1e-3)


class TestRotation:
    def test_quat_matrix_roundtrip(self, rng):
        q = rng.normal(size=(8, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q *= np.where(q[:, :1] < 0, -1.0, 1.0)
        m = rotation.quat_to_matrix(jnp.asarray(q))
        q2 = rotation.matrix_to_quat(m)
        np.testing.assert_allclose(q2, q, atol=1e-4)

    def test_euler_identity(self):
        m = rotation.euler_to_matrix(jnp.zeros(3))
        np.testing.assert_allclose(m, np.eye(3), atol=1e-6)


class TestCameras:
    def test_ray_aabb(self):
        origins = jnp.array([[0.0, 0.0, -5.0], [10.0, 10.0, 10.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        tmin, tmax = cameras.ray_aabb_intersect(origins, dirs, aabb)
        np.testing.assert_allclose(tmin[0], 4.0, atol=1e-5)
        np.testing.assert_allclose(tmax[0], 6.0, atol=1e-5)
        assert tmin[1] > tmax[1]  # miss

    def test_opengl_center_ray(self):
        K = jnp.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
        c2w = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        r = cameras.rays_from_pixels(
            jnp.array([49.5]), jnp.array([49.5]), K, c2w, opengl=True
        )
        np.testing.assert_allclose(r.viewdirs[0], [0, 0, -1.0], atol=1e-5)

    def test_unit_norm(self, rng):
        K = jnp.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
        c2w = jnp.concatenate([jnp.eye(3), jnp.ones((3, 1))], axis=1)
        x = jnp.asarray(rng.integers(0, 128, size=32))
        y = jnp.asarray(rng.integers(0, 128, size=32))
        r = cameras.rays_from_pixels(x, y, K, c2w)
        np.testing.assert_allclose(
            jnp.linalg.norm(r.viewdirs, axis=-1), np.ones(32), atol=1e-5
        )


class TestICP:
    """ICP refinement (registration/icp.py) — reference parity for
    refine_registration (global_registration.py:85-92)."""

    def _shell(self, rng, n=3000):
        sph = rng.normal(size=(n, 3))
        sph /= np.linalg.norm(sph, axis=1, keepdims=True)
        pts = sph * np.array([0.5, 0.35, 0.25])
        pts[: n // 4] = rng.normal(size=(n // 4, 3)) * 0.04 + np.array(
            [0.45, 0.3, 0.1]
        )
        return pts.astype(np.float32)

    def _pose(self, deg, t):
        from scipy.spatial.transform import Rotation as R

        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R.from_euler("xyz", deg, degrees=True).as_matrix()
        T[:3, 3] = t
        return T

    def test_icp_converges_from_coarse_init(self):
        from dregnerf_tpu.registration.icp import icp_refine

        rng = np.random.default_rng(3)
        src = self._shell(rng)
        gt = self._pose([40, -25, 70], [0.2, -0.1, 0.15])
        tgt = src @ gt[:3, :3].T + gt[:3, 3]
        # init ~12 deg / 0.05 off the truth — a RegTr-quality init
        off = self._pose([8, -5, 7], [0.03, 0.02, -0.03])
        init = (off @ gt)[:3, :4]
        pose, rms, cnt = icp_refine(src, tgt, init, voxel_size=0.05, seed=1)
        assert pose is not None and cnt > 500
        rre, rte = se3.pose_error(
            jnp.asarray(pose), jnp.asarray(gt[:3, :4])
        )
        assert float(rre) < 0.5, float(rre)
        assert float(rte) < 0.01, float(rte)
        assert rms < 0.05

    def test_icp_partial_overlap_and_padding(self):
        from dregnerf_tpu.registration.icp import icp_refine

        rng = np.random.default_rng(4)
        src = self._shell(rng, n=2500)
        gt = self._pose([15, 30, -10], [0.1, 0.0, -0.05])
        tgt_full = src @ gt[:3, :3].T + gt[:3, 3]
        # 70% overlap: drop a cap of the target + small count (pads)
        keep = tgt_full[:, 0] < np.quantile(tgt_full[:, 0], 0.7)
        tgt = tgt_full[keep]
        off = self._pose([6, -4, 5], [0.02, -0.02, 0.01])
        init = (off @ gt)[:3, :4]
        pose, _, cnt = icp_refine(
            src, tgt, init, voxel_size=0.05, n_points=4096, seed=2
        )
        assert pose is not None and cnt > 100
        rre, rte = se3.pose_error(jnp.asarray(pose), jnp.asarray(gt[:3, :4]))
        assert float(rre) < 2.0, float(rre)
        assert float(rte) < 0.03, float(rte)

    def test_icp_degenerate_returns_none(self):
        from dregnerf_tpu.registration.icp import icp_refine

        pose, _, _ = icp_refine(
            np.zeros((2, 3)), np.ones((2, 3)), np.eye(4)[:3], seed=0
        )
        assert pose is None

    def test_icp_color_breaks_symmetry(self):
        """A colored sphere is rotation-ambiguous geometrically; color-aware
        correspondences (measured necessary on fleet sphere scenes) must
        recover the pose where geometry-only ICP cannot."""
        from dregnerf_tpu.registration.icp import icp_refine

        rng = np.random.default_rng(7)
        n = 4000
        pts = rng.normal(size=(n, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        pts = (pts * 0.5).astype(np.float32)
        # color varies over the sphere -> unique match signature
        cols = (np.stack([
            0.5 + 0.5 * pts[:, 0] / 0.5,
            0.5 + 0.5 * pts[:, 1] / 0.5,
            0.5 + 0.5 * pts[:, 2] / 0.5,
        ], -1)).astype(np.float32)
        gt = self._pose([25, -15, 30], [0.05, -0.02, 0.03])
        tgt = pts @ gt[:3, :3].T + gt[:3, 3]
        init = self._pose([10, 6, -8], [0.01, 0.0, -0.01]) @ gt
        pose, _, _ = icp_refine(
            pts, tgt, init[:3, :4], voxel_size=0.05, seed=3,
            src_colors=cols, tgt_colors=cols,
        )
        assert pose is not None
        rre, _ = se3.pose_error(jnp.asarray(pose), jnp.asarray(gt[:3, :4]))
        assert float(rre) < 1.0, float(rre)

    def test_icp_never_worsens_init(self):
        """Multi-start keeps the unrefined init as a candidate: on a cloud
        where ICP diverges (tiny overlap), the returned pose's trimmed-NN
        score must be <= the init's."""
        from dregnerf_tpu.registration.icp import (
            _prep, icp_refine, score_pose)

        rng = np.random.default_rng(9)
        src = rng.normal(size=(500, 3)).astype(np.float32)
        tgt = rng.normal(size=(500, 3)).astype(np.float32) + 5.0
        init = np.eye(4, dtype=np.float32)[:3]
        pose, _, _ = icp_refine(src, tgt, init, voxel_size=0.05, seed=1)
        if pose is None:
            return  # degenerate path is fine too
        r = np.random.default_rng(0)
        s, _, sv = _prep(src, None, 4096, r)
        t, _, tv = _prep(tgt, None, 4096, r)
        args = (jnp.asarray(s), jnp.asarray(t), jnp.asarray(sv),
                jnp.asarray(tv))
        assert float(score_pose(*args, jnp.asarray(pose))) <= \
            float(score_pose(*args, jnp.asarray(init))) + 1e-6
